"""Dump .explain('formatted') for the COMPUTATION plans of operators whose
registered query memoizes/materializes (so the final query plan is just a
checkpoint scan): item similarity, itemsim2rating, plus the stateless
pipeline operators. Loop-body plans of iterative algorithms cannot appear
in a final explain; their claims are verified against the code
(OPTIMIZATION_r10.md quotes file:line).

Usage: python tools/dump_plan_fragments.py <out_dir> <suffix> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchi_cpp_spark.session import get_spark


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-fragments")
    spark.sparkContext.setLogLevel("ERROR")

    from graphchi_cpp_spark.cf.itemcf import item_similarity, itemsim2rating
    from graphchi_cpp_spark.datasets import ratings

    r = ratings(spark, sf_dir).localCheckpoint(eager=True)
    frags = {}
    sims = item_similarity(r, "jaccard", min_common=2)
    frags["itemcf_jaccard_sims"] = sims
    sims_m = sims.localCheckpoint(eager=True)
    frags["itemsim2rating_recs"] = itemsim2rating(r, sims_m, k=5, score_ndigits=6)

    for name, df in frags.items():
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            txt = explain(df)
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR {name}: {type(exc).__name__}: {exc}"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
