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

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 32,
    key: str = "src",
) -> None:
    """Persist edges bucketed+sorted by ``key`` into the session catalog."""
    spark = edges.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous write can leave an orphaned managed location
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/{table}", ignore_errors=True)
    (
        edges.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
