"""Phase-level profiling for ann_lsh_topk (VERDICT r10 task 7).

Times each phase of lsh_cosine_topk separately with noop sinks and job
labels so the 3-4s bench cost can be attributed: bucket build+materialize,
candidate join, exact re-rank. Run at sf0.1 (2000 vectors, 100 queries)
— the bench shape — where the cost is fixed overhead, not data volume.

Usage: python tools/profile_ann_lsh.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphchi_cpp_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-ann-lsh", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from graphchi_cpp_spark.operators.dedup import _materialize_postings
    from graphchi_cpp_spark.operators.similarity import (
        _dot,
        lsh_cosine_topk,
        lsh_sign_buckets,
    )
    from graphchi_cpp_spark.operators.toplist import top_k_per_key

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()  # warm footer/scan

    for r in range(repeats):
        spark.catalog.clearCache()
        import gc

        gc.collect()
        sc._jvm.System.gc()

        t0 = time.time()
        sc.setJobDescription("lsh: bucket build + materialize")
        buckets = _materialize_postings(
            lsh_sign_buckets(emb, 4, 8, "vec_id", "embedding", 64),
            "lsh_buckets_prof",
        )
        t1 = time.time()

        q = emb.filter(F.col("vec_id") % 20 == 0)
        qids = q.select(F.col("vec_id").alias("query_id"))
        sc.setJobDescription("lsh: candidate join")
        cand = (
            buckets.withColumnRenamed("vec_id", "query_id")
            .join(qids, "query_id", "left_semi")
            .join(buckets, ["band", "bucket"])
            .filter(F.col("query_id") != F.col("vec_id"))
            .select("query_id", "vec_id")
            .distinct()
        )
        noop(cand)
        t2 = time.time()

        sc.setJobDescription("lsh: full query (rerank incl. re-run of above)")
        out = lsh_cosine_topk(emb, q, k=5)
        noop(out)
        t3 = time.time()
        sc.setJobDescription(None)
        print(
            f"run {r}: buckets={t1 - t0:.2f}s cand={t2 - t1:.2f}s "
            f"full={t3 - t2:.2f}s total={t3 - t0:.2f}s"
        )

    out = lsh_cosine_topk(emb, emb.filter(F.col("vec_id") % 20 == 0), k=5)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    n_ex = plan.count("Exchange")
    n_smj = plan.count("SortMergeJoin")
    n_bhj = plan.count("BroadcastHashJoin")
    print(f"plan: Exchange={n_ex} SMJ={n_smj} BHJ={n_bhj}")
    if os.environ.get("SPARK_GRAFT_PRINT_PLAN"):
        print(plan)


if __name__ == "__main__":
    main()
