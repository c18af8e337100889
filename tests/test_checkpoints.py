"""CheckpointJanitor: superstep loops must not accrete localCheckpoint
RDD blocks (DataFrame.unpersist cannot free them; the janitor tracks and
unpersists the previous generation explicitly)."""

from pyspark.sql import functions as F

from graphchi_cpp_spark.checkpoints import CheckpointJanitor


def _n_persistent(spark) -> int:
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


def test_janitor_frees_previous_generation(spark):
    spark.catalog.clearCache()
    base = _n_persistent(spark)
    jan = CheckpointJanitor(spark)
    v = spark.range(1000).select(F.col("id"), F.lit(0.0).alias("x"))
    for _ in range(6):
        v = jan.checkpoint(v.select("id", (F.col("x") + 1).alias("x")))
    # only the LIVE generation's blocks remain pinned; without the
    # janitor this loop leaves 6 persistent checkpoint RDDs
    assert _n_persistent(spark) - base <= 1
    # the surviving frame still computes (its own generation was kept)
    assert v.agg(F.sum("x")).collect()[0][0] == 6000.0


def test_janitor_keeps_current_generation_readable(spark):
    jan = CheckpointJanitor(spark)
    a = jan.checkpoint(spark.range(100).select((F.col("id") * 2).alias("y")))
    b = jan.checkpoint(a.select((F.col("y") + 1).alias("y")))
    # a's blocks were freed when b landed; b must stay fully readable
    assert b.count() == 100
    assert b.agg(F.min("y")).collect()[0][0] == 1
