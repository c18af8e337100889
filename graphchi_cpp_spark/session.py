"""SparkSession factory with scale-appropriate defaults.

The reference engine's runtime config surface (membudget_mb, execthreads,
loadthreads, niothreads, io.blocksize — ``src/util/cmdopts.hpp:154-214``,
``conf/graphchi.cnf``) maps onto Spark conf. Defaults here are tuned for
the local[32] test harness but chosen to also be the right *shape* for a
1000-executor cluster: AQE on (runtime partition coalescing + skew-join
splitting replaces GraphChi's memory-budget window sizing), generous
broadcast threshold (vertex-state tables for small graphs / dimension
tables broadcast instead of shuffling), Arrow enabled for the few pandas
UDF escape hatches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "graphchi_cpp_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    At cluster scale the same conf keys apply; only master/memory change.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = int(
        shuffle_partitions
        or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r11 A/B (verdict task 2) REVERTED the r10 shuffled-hash-join
        # preference: with everything else fixed, preferSortMergeJoin=
        # false measured 83.3s vs 78.6s total on the driver's invocation
        # shape, regressing 9 queries >15% (ann_cosine 0.65×, simhash
        # 0.76×, streaming_pagerank 0.78×, featurized 0.81×, ann_lsh/
        # ann_ivf/als_coord 0.85-0.87×) while helping nothing beyond
        # noise — matching the driver-observed r10 regression cluster on
        # untouched queries. SMJ's sorts are cheap on these mostly-small
        # post-shuffle partitions, and SMJ spills gracefully; SHJ stays
        # one env var away (SPARK_GRAFT_PREFER_SHJ=1, with the 64m AQE
        # per-partition build guard) for workloads that measure faster.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "false" if os.environ.get("SPARK_GRAFT_PREFER_SHJ") == "1" else "true",
        )
        # shuffle/spill codec (guide §2.3): lz4 measured faster than zstd
        # end-to-end on this host (local NVMe, CPU-bound shuffles — see
        # OPTIMIZATION_r10.md); on network-bound clusters zstd's ratio
        # usually wins, so the codec is env-tunable rather than fixed
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m" if os.environ.get("SPARK_GRAFT_PREFER_SHJ") == "1" else "0",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's events.parquet stores TIMESTAMP(NANOS) which Spark
        # rejects by default; read as long (ns since epoch) — convert with
        # timestamp_micros(ts div 1000) where event-time semantics matter
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # keep the committed heap from SHRINKING after a full GC (e.g.
        # the bench's between-run reclaim): G1 uncommitting and then
        # re-growing the heap mid-query showed up as a consistent
        # +0.5-2s on every timed run. MaxHeapFreeRatio=100 disables the
        # shrink policy while still letting the heap grow on demand —
        # outright pinning (-Xms=-Xmx) was measured 3-8x SLOWER for
        # 30M-edge pagerank on a 48g heap (pathological G1 sizing on a
        # fully pre-committed large heap). Explicit GCs stay synchronous
        # on purpose — the reclaim runs OUTSIDE timed regions, and a
        # concurrent cycle instead bled marking work into the next
        # timed query (measured +30-100% on the queries that follow
        # garbage-heavy ones).
        # A/B knob (r10 verdict task 2): SPARK_GRAFT_HEAP_FREE_RATIO=jvm
        # drops the flag entirely (JVM default shrink policy). r11 A/B
        # on the driver's invocation shape KEPT the flag: ratio=100
        # measured 78.6s vs 81.2s total for the JVM default, with the
        # flag flat-or-better on 24 of 32 queries (als_coord 0.74× and
        # featurized 0.83× without it).
        .config(
            "spark.driver.extraJavaOptions",
            ""
            if os.environ.get("SPARK_GRAFT_HEAP_FREE_RATIO") == "jvm"
            else "-XX:MaxHeapFreeRatio="
            + os.environ.get("SPARK_GRAFT_HEAP_FREE_RATIO", "100"),
        )
        # localCheckpoint blocks are only reclaimed when the ContextCleaner
        # sees the RDD get GC'd; with a roomy heap the driver may not GC for
        # the 30min default interval, so superseded superstep states pile up
        # in the block manager and starve later jobs (measured: 2-3x slower
        # back-to-back iterative workloads at 30M edges). Tighten it.
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
