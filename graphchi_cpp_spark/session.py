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
