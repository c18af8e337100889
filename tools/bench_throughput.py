"""Throughput-scaling benchmark: PageRank / WCC / triangle edges-per-second
on generated graphs of increasing size.

The driver's sf0.1 bench is latency-dominated (sub-second equivalent work
behind ~1s/job Spark overhead); this tool measures the quantity the
BASELINE comparison is actually about — per-edge throughput once data
dwarfs fixed costs — and how it scales with graph size on local[32].

Usage: python tools/bench_throughput.py [n_edges ...]  (default 1M 10M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchi_cpp_spark.graph import PropertyGraph, erdos_renyi
from graphchi_cpp_spark.session import get_spark


def main():
    sizes = [int(float(s)) for s in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("bench-throughput", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    # untimed JIT/codegen warmup (JMH convention): the first workload in
    # a fresh JVM otherwise pays compilation — measured 19.7s vs 16.0s
    # warm for 30M pagerank on identical plans
    from graphchi_cpp_spark.algos.pagerank import pagerank as _pr_warm

    warm = erdos_renyi(spark, 100_000, avg_degree=10, seed=7).localCheckpoint(
        eager=True
    )
    _pr_warm(PropertyGraph(warm), max_iter=2).count()
    results = []
    for n_edges in sizes:
        n = max(1000, n_edges // 10)  # avg degree 10
        edges = erdos_renyi(spark, n, avg_degree=10, seed=42).localCheckpoint(
            eager=True
        )
        m = edges.count()
        g = PropertyGraph(edges)

        def _reclaim():
            # drop superseded checkpoint blocks before timing the next
            # workload: ContextCleaner only acts when the driver GCs
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(2)

        _reclaim()
        t0 = time.time()
        from graphchi_cpp_spark.algos.pagerank import pagerank

        pagerank(g, max_iter=3).count()
        pr_s = time.time() - t0

        _reclaim()
        t0 = time.time()
        from graphchi_cpp_spark.algos.connected_components import (
            connected_components,
        )

        connected_components(g, max_iter=30).count()
        cc_s = time.time() - t0

        _reclaim()
        t0 = time.time()
        from graphchi_cpp_spark.algos.connected_components import (
            connected_components_star,
        )

        connected_components_star(g).count()
        ccs_s = time.time() - t0

        # triangle counting shuffles the full wedge set; the cap guards
        # scratch disk on small hosts (100M edges measured < 10G shuffle
        # once checkpoint reclaim is active, so the default is generous)
        tri_cap = int(
            float(os.environ.get("SPARK_GRAFT_TRI_CAP_EDGES", 200_000_000))
        )
        tri_s = None
        if m <= tri_cap:
            _reclaim()
            t0 = time.time()
            from graphchi_cpp_spark.algos.triangles import triangle_count

            triangle_count(g).collect()
            tri_s = time.time() - t0

        # ALS ratings-throughput (baseline row: 1.7M ratings/s/iter):
        # synthetic (user, item, rating) at the same row count, d=2
        # expression path, 3 iterations
        from pyspark.sql import functions as F

        from graphchi_cpp_spark.cf.als import als

        n_users, n_items = max(1000, m // 10), max(500, m // 100)
        ratings = (
            spark.range(m)
            .select(
                (F.col("id") % n_users).alias("user"),
                F.pmod(F.col("id") * 2654435761, F.lit(n_items)).alias("item"),
                (1.0 + (F.col("id") % 5)).cast("double").alias("rating"),
            )
            .localCheckpoint(eager=True)
        )
        _reclaim()
        t0 = time.time()
        als(ratings, d=2, iterations=3)
        als_s = time.time() - t0

        results.append(
            {
                "n_edges": m,
                "pagerank_3iter_s": round(pr_s, 2),
                "pagerank_edges_per_s_per_iter": int(3 * m / pr_s),
                "wcc_s": round(cc_s, 2),
                "wcc_edges_per_s": int(m / cc_s),
                "wcc_star_s": round(ccs_s, 2),
                "wcc_star_edges_per_s": int(m / ccs_s),
                "triangles_s": round(tri_s, 2) if tri_s else None,
                "triangles_edges_per_s": int(m / tri_s) if tri_s else None,
                "als_3iter_s": round(als_s, 2),
                "als_ratings_per_s_per_iter": int(3 * m / als_s),
            }
        )
        print(json.dumps(results[-1]))
    print(json.dumps({"throughput_scaling": results}))


if __name__ == "__main__":
    main()
