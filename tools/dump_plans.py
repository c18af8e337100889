"""Dump .explain('formatted') for registered queries to plans/rNN/.

Usage: python tools/dump_plans.py <out_dir> <suffix> [sf_dir] -- <query ...>

For driver-loop queries (iterative supersteps, history builders) the
final DataFrame's plan is the tail of the computation only; the loop-body
plan shape is documented in OPTIMIZATION notes instead. Queries whose
build executes Spark jobs still work here — we only pay one build.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from graphchi_cpp_spark.session import get_spark


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and rest[0] != "--":
        sf_dir, names = rest[0], rest[2:] if len(rest) > 1 else []
    else:
        sf_dir, names = "/root/testdata/sf0.01", rest[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not registered")
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building {name}: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
