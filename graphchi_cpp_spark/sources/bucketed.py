"""Bucketed edge-table storage — the cluster-scale sharding analog (S9).

GraphChi's sharder pre-sorts edges into dst-interval shards so every
pass streams co-located data (``src/preprocessing/sharder.hpp``). The
Spark-native equivalent at 100 TB is a BUCKETED table: write the edge
table bucketed (+sorted) by the join key once; every subsequent join or
aggregation on that key is exchange-free — the shuffle is paid at write
time, amortized over all queries, exactly like sharding.

``partition_by_dst`` (graph.py) gives the same co-location within one
session; bucketing persists it across sessions/jobs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _orphan_location(spark: SparkSession, table: str) -> str | None:
    """Default managed-table directory for ``table`` when it is NOT in the
    catalog (a crashed previous write leaves the directory behind without a
    catalog entry). Returns None for non-local warehouses — nothing the
    driver can (or should) delete there."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if "://" in wh and not wh.startswith("file:"):
        return None
    wh = wh.removeprefix("file:")
    parts = [p.strip("`").lower() for p in table.split(".")]
    if parts and parts[0] == "spark_catalog":
        parts = parts[1:]
    if len(parts) == 2 and parts[0] != "default":
        return os.path.join(wh, parts[0] + ".db", parts[1])
    if parts:
        return os.path.join(wh, parts[-1])
    return None


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 32,
    key: str = "src",
) -> None:
    """Persist edges bucketed+sorted by ``key`` into the session catalog."""
    spark = edges.sparkSession
    if spark.catalog.tableExists(table):
        # managed-table DROP removes the data directory via the catalog —
        # no path guessing needed
        spark.sql(f"DROP TABLE {table}")
    else:
        loc = _orphan_location(spark, table)
        if loc is not None:
            shutil.rmtree(loc, ignore_errors=True)
    (
        edges.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
