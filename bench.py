"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are the benchmark-visible subset of __spark_entry__.queries();
each timing includes full materialization (count of the result).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from graphchi_cpp_spark.session import get_spark

# benchmark-visible subset (grown as operators land)
BENCH_QUERIES = [
    "pagerank",
    "wcc",
    "wcc_star",
    "wcc_sizes",
    "degree_distribution",
    "topk_per_user",
    "triangle_count",
    "kcores",
    "lpa_communities",
    "khop_vertices",
    "itemcf_jaccard",
    "itemsim2rating",
    "als_rmse_history",
    "minhash_dedup",
    "simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ngram_jaccard_dedup",
    "ngram_jaccard_dedup_pruned",
    "ngram_contamination",
    "clean_corpus",
    "random_walks",
    "word_pair_mi",
    "events_hourly",
    "sessionize",
    "scc",
    "msf",
    "streaming_pagerank",
    "als_coord_rmse_history",
    "session_windows",
    "featurized_ratings",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("graphchi-bench", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session before the first timed query: parquet footer reads,
    # whole-stage codegen compilation, shuffle machinery. No timed query's
    # work is precomputed here — this only removes one-time JVM costs that
    # otherwise land entirely on whichever query runs first.
    from pyspark.sql import functions as F

    from graphchi_cpp_spark.datasets import load_table

    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    spark.range(1_000_000).groupBy(F.col("id") % 64).count().count()

    def reclaim_blocks():
        """Free localCheckpoint RDD blocks leaked by the PREVIOUS run.

        Operators materialize multiply-consumed intermediates with
        ``localCheckpoint(eager=True)``; the blocks of intermediates
        that are NOT memoized become garbage when the run's DataFrames
        go out of scope, but Spark only frees them when the driver's
        ContextCleaner notices the JVM-side RDD got GC'd — minutes
        later under a roomy heap. Across 32 queries × 2-4 executions
        that lag accumulates gigabytes of dead blocks in the single
        local-mode JVM, evicting live cache partitions and inflating
        LATER queries' timings by 2-4× (measured r10: als_rmse_history
        5.7s isolated vs 16.0s mid-sequence on identical code). This
        forces the py4j release + JVM GC so the ContextCleaner drops
        dead generations NOW, outside any timed region. Memoized
        checkpoints stay referenced (entrymod._MEMO) and keep their
        blocks — this frees garbage only; no timed work is skipped and
        every run still computes from the parquet inputs.
        """
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    qs = entrymod.queries()
    # comma subset for targeted confirmation runs (mirrors
    # SPARK_GRAFT_GRAPH_OPS / SPARK_GRAFT_DEDUP_OPS in the throughput
    # tool); default: the full benchmark-visible list
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").strip()
    bench_queries = (
        [q for q in only.split(",") if q] if only else BENCH_QUERIES
    )
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    # Iterative queries (multi-superstep driver loops) showed round-over-
    # round wall drift with unchanged plans (pagerank 6.24→8.19s r4→r6);
    # host variance is documented at up to 3×. Min-of-3 minimum on this
    # set so the reported number is the query, not the host.
    iterative = {
        "pagerank", "wcc", "wcc_star", "scc", "kcores",
        "lpa_communities", "streaming_pagerank",
        # equally drift-exposed multi-superstep drivers
        "msf", "als_rmse_history", "als_coord_rmse_history",
    }
    timings: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    errors: dict[str, str] = {}
    spread: dict[str, float] = {}
    for name in bench_queries:
        if name not in qs:
            continue
        q_runs = max(n_runs, 3) if name in iterative else n_runs
        # Per-query fault isolation: one broken query must not destroy the
        # round's timings (r3 lost the whole bench to one AnalysisException).
        # Min-of-N because single-run walls at sf0.1 are cold/warm-noise
        # dominated (measured 23s → 9.8s on identical code). Each repeat
        # starts from the memo state as it was BEFORE this query's first
        # run: repeats recompute the query's own work honestly (no timing
        # a cached checkpoint), while intentional cross-query sharing
        # (wcc → wcc_sizes) keeps single-pass semantics.
        memo_before = dict(getattr(entrymod, "_MEMO", {}))
        runs: list[float] = []
        rows = None
        # Iterative queries get ONE untimed warm-up execution first:
        # their first run in a session pays query-specific codegen/JIT
        # that min-of-N can't fully hide (pagerank BENCH spread 86.9% at
        # n_runs=2 vs ~11% in the throughput tool, which warms up —
        # VERDICT r9 task 8). Warm-up work is identical to a timed run
        # (memo restored, caches cleared) but its wall time is discarded.
        warmup = int(
            os.environ.get(
                "SPARK_GRAFT_BENCH_WARMUP", "1" if name in iterative else "0"
            )
        )
        try:
            for _ in range(warmup):
                entrymod._MEMO.clear()
                entrymod._MEMO.update(memo_before)
                spark.catalog.clearCache()
                reclaim_blocks()
                # label jobs (guide §1.5) so UI/event-log analysis can
                # attribute stages to queries; no timing change
                spark.sparkContext.setJobDescription(f"bench:{name}:warmup")
                qs[name](spark, sf_dir).count()
            for _ in range(q_runs):
                entrymod._MEMO.clear()
                entrymod._MEMO.update(memo_before)
                # queries that .cache() internally (pagerank's
                # co-partitioned edges) would get plan-cache HITS on
                # repeats and skip their load phase — clear so every
                # run does identical work (_MEMO sharing is checkpoint-
                # based and unaffected)
                spark.catalog.clearCache()
                reclaim_blocks()
                spark.sparkContext.setJobDescription(f"bench:{name}")
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                rows = df.count()
                runs.append(round(time.time() - t0, 3))
                # drop the run's result reference so the next run's
                # reclaim_blocks() can actually free its checkpoints
                df = None
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            metrics[name] = {"err": errors[name], "runs": runs}
            continue
        timings[name] = min(runs)
        # spread = (max-min)/min as %, the honest per-query noise figure
        spread[name] = round(100.0 * (max(runs) - min(runs)) / min(runs), 1)
        metrics[name] = {
            "wall_sec": min(runs),
            "runs": runs,
            "spread_pct": spread[name],
            "rows": rows,
        }

    total = round(sum(timings.values()), 3)
    # C14-lite metrics reporter (reference src/metrics/metrics.hpp:165
    # file reporter): per-query timers + row counts, one JSON file next
    # to the repo for post-hoc comparison across rounds
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_metrics.json"), "w") as f:
        json.dump(
            {
                "sf": sf,
                "sf_dir": sf_dir,
                "total_sec": total,
                "n_runs": n_runs,
                "queries": metrics,
                "errors": errors,
                "unix_time": int(time.time()),
            },
            f,
            indent=2,
        )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread_pct": spread,
                "n_runs": n_runs,
                "errors": errors,
                "sf": sf,
            }
        )
    )
    # partial results must survive: always exit 0 so the driver records
    # the JSON line even when individual queries failed
    sys.exit(0)


if __name__ == "__main__":
    main()
