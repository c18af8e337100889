"""Bucketed edge tables: co-located joins are exchange-free on the
bucketed side (the persisted sharding analog, SURVEY §2.2 S9)."""

from pyspark.sql import functions as F

from graphchi_cpp_spark.sources.bucketed import (
    read_bucketed_edges,
    write_bucketed_edges,
)


def test_bucketed_join_elides_shuffle(spark):
    edges = spark.range(10_000).select(
        (F.col("id") % 500).alias("src"), (F.col("id") % 777).alias("dst")
    )
    write_bucketed_edges(edges, "edges_b", buckets=8, key="src")
    t = read_bucketed_edges(spark, "edges_b")

    # self-join on the bucket key: no SHUFFLE exchange (Catalyst may
    # still pick a broadcast join for tiny tables — also shuffle-free)
    j = t.alias("a").join(t.alias("b"), "src")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan

    # aggregation on the bucket key: no exchange at all
    agg = t.groupBy("src").agg(F.count("*").alias("c"))
    plan2 = agg._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") == 0, plan2

    # and results are right
    assert agg.agg(F.sum("c")).collect()[0][0] == 10_000
    spark.sql("DROP TABLE IF EXISTS edges_b")
