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
        # prefer hash joins over sort-merge where safe: most joins here
        # run on checkpointed/cached inputs whose stats are gone, so the
        # planner would default to SMJ and pay two sorts per join. The
        # AQE rewrite is the scale-adaptive guard — it only swaps
        # SMJ→shuffled-hash when every post-shuffle partition of the
        # build side is under the threshold (small at bench scale,
        # automatically NOT taken when partitions are GB-sized at
        # cluster scale), so no OOM risk from an unbounded build.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # shuffle/spill codec (guide §2.3): lz4 measured faster than zstd
        # end-to-end on this host (local NVMe, CPU-bound shuffles — see
        # OPTIMIZATION_r10.md); on network-bound clusters zstd's ratio
        # usually wins, so the codec is env-tunable rather than fixed
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
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
        .config(
            "spark.driver.extraJavaOptions", "-XX:MaxHeapFreeRatio=100"
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
