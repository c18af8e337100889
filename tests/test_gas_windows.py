"""GAS API veneer, event-time windows, pyspark.ml ALS backend."""

import pytest
from pyspark.sql import functions as F

from graphchi_cpp_spark.datasets import load_table
from graphchi_cpp_spark.gas import run_gas
from graphchi_cpp_spark.graph import PropertyGraph
from graphchi_cpp_spark.pregel import msg, old, src
from graphchi_cpp_spark.streaming.windows import (
    hourly_event_stats,
    hourly_event_stats_sql,
    sessionize,
    sessionize_sql,
)
from tests.conftest import assert_df_matches_oracle


def test_gas_pagerank_equivalence(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], ["src", "dst"])
    g = PropertyGraph.from_edges(edges)
    outdeg = g.out_degrees()
    g2 = PropertyGraph(
        edges, g.vertices.join(outdeg, "id", "left").select(
            "id", F.coalesce("out_degree", F.lit(0)).cast("double").alias("outdeg")
        )
    )
    ranks = run_gas(
        g2,
        vertex_col="rank",
        initial=F.lit(1.0),
        gather=F.try_divide(src("rank"), src("outdeg")),
        sum_agg=F.sum(msg()),
        apply=F.lit(0.15) + F.lit(0.85) * F.coalesce(msg(), F.lit(0.0)),
        num_iterations=2,
    )
    from graphchi_cpp_spark.algos.pagerank import pagerank

    want = {r["id"]: r["rank"] for r in pagerank(g, max_iter=2).collect()}
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_gas_wcc_with_signal(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], ["src", "dst"])
    g = PropertyGraph.from_edges(edges).symmetrize()
    labels = run_gas(
        g,
        vertex_col="label",
        initial=F.col("id"),
        gather=src("label"),
        sum_agg=F.min(msg()),
        apply=F.least(F.col("label"), F.coalesce(msg(), F.col("label"))),
        signal_condition=F.col("label") < old("label"),
        num_iterations=20,
    )
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_gas_out_direction_with_signal(spark):
    """Frontier + gather_direction='out': the message SENDER is the dst
    vertex, so frontier filtering must keep edges whose dst is active
    (regression: filtering by active src starves inactive receivers and
    stalls propagation — ADVICE r1).

    Chain 1→2→3 with labels (5, 6, 0): vertex 1 is inactive after iter 1
    (min(5,6)=5 unchanged) but must still receive 2's new label 0 at
    iter 2 once 2 changes.
    """
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    g = PropertyGraph.from_edges(edges)
    labels = run_gas(
        g,
        vertex_col="label",
        initial=F.when(F.col("id") == 1, 5)
        .when(F.col("id") == 2, 6)
        .otherwise(0)
        .cast("long"),
        gather=F.col("dst.label"),
        sum_agg=F.min(msg()),
        apply=F.least(F.col("label"), F.coalesce(msg(), F.col("label"))),
        gather_direction="out",
        signal_condition=F.col("label") < old("label"),
        num_iterations=20,
    )
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_pregel_frontier_both_directions(spark):
    """Frontier + messages in BOTH directions: the edge filter must keep
    edges where EITHER endpoint is an active sender. Min-label push on a
    directed chain without symmetrizing reaches every vertex and matches
    WCC semantics."""
    from graphchi_cpp_spark.pregel import Pregel, dst, msg, old, src

    edges = spark.createDataFrame([(1, 2), (3, 2), (3, 4), (5, 4)], ["src", "dst"])
    g = PropertyGraph.from_edges(edges)
    p = (
        Pregel(g.edges, g.vertices)
        .with_vertex_column(
            "label",
            F.col("id"),
            F.least(F.col("label"), F.coalesce(msg(), F.col("label"))),
        )
        .send_msg_to_dst(src("label"))
        .send_msg_to_src(dst("label"))
        .agg_msgs(F.min(msg()))
        .with_frontier(F.col("label") < old("label"))
    )
    got = {r["id"]: r["label"] for r in p.run(max_iter=20).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_ts_us_sql_across_parquet_encodings(spark, tmpdir):
    """Regression guard for the r3-class breakage: the driver's
    events.parquet has shipped ts as TIMESTAMP(NANOS)-read-as-long AND as
    timestamp[us] (TIMESTAMP_NTZ) across testdata generations. ts_us_sql
    must yield identical µs-since-epoch for every on-disk encoding."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphchi_cpp_spark.streaming.windows import ts_us_sql

    base_us = [1_704_103_200_000_000 + i * 37_000_001 for i in range(50)]
    encodings = {
        "ntz": pa.array(base_us, type=pa.timestamp("us")),
        "utc": pa.array(base_us, type=pa.timestamp("us", tz="UTC")),
        # version>=2.6 keeps TIMESTAMP(NANOS) on disk — the encoding the
        # nanosAsLong session conf reads back as int64
        "ns": pa.array([u * 1000 for u in base_us], type=pa.timestamp("ns")),
    }
    for name, arr in encodings.items():
        path = os.path.join(tmpdir, f"{name}.parquet")
        pq.write_table(pa.table({"ts": arr}), path, version="2.6")
        df = spark.read.parquet(path)
        got = sorted(
            r["us"]
            for r in df.select(F.expr(ts_us_sql(df)).alias("us")).collect()
        )
        assert got == base_us, f"encoding {name}: {df.schema['ts'].dataType}"


def test_pregel_frontier_both_directions_sum(spark):
    """Non-idempotent (sum) aggregate with a both-directions frontier:
    each direction must draw from its OWN sender-active edge set. The old
    either-endpoint union filter let an inactive endpoint "send" whenever
    the other endpoint was active — harmless for min/max, but it inflates
    sum/count aggregates (VERDICT r3 item 6)."""
    from graphchi_cpp_spark.pregel import Pregel, msg

    edges = spark.createDataFrame([(1, 2), (3, 2)], ["src", "dst"])
    g = PropertyGraph.from_edges(edges)
    p = (
        Pregel(g.edges, g.vertices)
        .with_vertex_column(
            "x", F.lit(0).cast("long"), F.col("x") + F.coalesce(msg(), F.lit(0))
        )
        .send_msg_to_dst(F.lit(1))
        .send_msg_to_src(F.lit(1))
        .agg_msgs(F.sum(msg()))
        .with_frontier(msg().isNotNull(), initially_active=F.col("id") == 1)
    )
    got = {r["id"]: r["x"] for r in p.run(max_iter=3).collect()}
    # s1: only 1 active → v2 += 1 via the src-active edge 1→2 (an
    #     inactive-sender leak would also bump v1 here, making v1 = 2)
    # s2: only 2 active → v1 += 1 and v3 += 1 via the dst-active edges
    # s3: 1 and 3 active → v2 += 2
    assert got == {1: 1, 2: 3, 3: 1}


def test_pregel_tol_without_tol_col_raises(spark):
    from graphchi_cpp_spark.pregel import Pregel

    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    g = PropertyGraph.from_edges(edges)
    p = (
        Pregel(g.edges, g.vertices)
        .with_vertex_column("x", F.lit(1.0), F.coalesce(msg(), F.col("x")))
        .send_msg_to_dst(src("x"))
        .agg_msgs(F.sum(msg()))
    )
    with pytest.raises(ValueError, match="tol"):
        p.run(max_iter=2, tol=0.01)


def test_hourly_event_stats_vs_duckdb(spark, sf_dir, duck):
    ev = load_table(spark, sf_dir, "events")
    assert_df_matches_oracle(
        hourly_event_stats(ev), duck, hourly_event_stats_sql(), float_ndigits=3
    )


def test_sessionize_vs_duckdb(spark, sf_dir, duck):
    ev = load_table(spark, sf_dir, "events")
    assert_df_matches_oracle(sessionize(ev), duck, sessionize_sql())


def test_als_ml_backend(spark, sf_dir):
    from graphchi_cpp_spark.cf.als_ml import als_ml
    from graphchi_cpp_spark.datasets import ratings

    r = ratings(spark, sf_dir)
    uf, itf, preds = als_ml(r, d=4, iterations=5)
    rmse = preds.agg(
        F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"), 2)))
    ).collect()[0][0]
    assert rmse < 1.0  # fits the planted ratings structure
    assert uf.count() > 0 and itf.count() > 0
