"""AdPredictor (T1): calibration + determinism."""

from pyspark.sql import functions as F

from graphchi_cpp_spark.cf.adpredictor import (
    adpredictor,
    event_impressions,
    predict_ctr,
)
from graphchi_cpp_spark.datasets import load_table


def test_adpredictor_separates_synthetic(spark):
    # feature 1 fires only on positives, feature 2 only on negatives
    rows = [(i, 1, [1, 3]) for i in range(30)] + [
        (100 + i, 0, [2, 3]) for i in range(30)
    ]
    imp = spark.createDataFrame(
        rows, "impression_id long, label int, features array<long>"
    )
    w = adpredictor(imp, sweeps=3)
    preds = predict_ctr(imp, w)
    avg = {
        r["label"]: r["p"]
        for r in preds.groupBy("label").agg(F.avg("p").alias("p")).collect()
    }
    assert avg[1] > 0.7 > 0.3 > avg[0]


def test_adpredictor_on_events_deterministic(spark, sf_dir):
    imp = event_impressions(load_table(spark, sf_dir, "events"))
    w1 = sorted(
        (r["feature"], round(r["mu"], 8)) for r in adpredictor(imp, 2).collect()
    )
    w2 = sorted(
        (r["feature"], round(r["mu"], 8)) for r in adpredictor(imp, 2).collect()
    )
    assert w1 == w2
    assert len(w1) > 10
