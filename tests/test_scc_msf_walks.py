"""SCC, minimum spanning forest, random walks."""

import pytest
from pyspark.sql import functions as F

from graphchi_cpp_spark.algos.msf import minimum_spanning_forest
from graphchi_cpp_spark.algos.random_walks import random_walks
from graphchi_cpp_spark.algos.scc import scc_sql, strongly_connected_components
from graphchi_cpp_spark.datasets import ORDERFLOW_EDGES_SQL, orderflow_edges
from graphchi_cpp_spark.graph import PropertyGraph
from tests.conftest import assert_df_matches_oracle


def test_scc_tiny(spark):
    # cycle {0,1,2}, cycle {3,4}, chain 5->6 into cycle 0
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (5, 6), (6, 0)]
    g = PropertyGraph.from_edges(spark.createDataFrame(edges, ["src", "dst"]))
    scc = {r["id"]: r["component"] for r in
           strongly_connected_components(g).collect()}
    assert scc[0] == scc[1] == scc[2] == 0
    assert scc[3] == scc[4] == 3
    assert scc[5] == 5 and scc[6] == 6


def test_scc_orderflow_vs_duckdb(spark, sf_dir, duck):
    g = PropertyGraph.from_edges(orderflow_edges(spark, sf_dir))
    result = strongly_connected_components(g)
    assert_df_matches_oracle(result, duck, scc_sql(ORDERFLOW_EDGES_SQL))


def _kruskal(edges):
    """Reference MSF via union-find on collected (src, dst, w) rows."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, picked = 0.0, []
    for w, s, d in sorted((e[2], e[0], e[1]) for e in edges):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            total += w
            picked.append((s, d))
    return total, picked


def test_msf_tiny(spark):
    # square with diagonal: MST = three cheapest non-cycle edges
    edges = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0), (3, 0, 4.0), (0, 2, 5.0),
        (10, 11, 1.5),  # second component
    ]
    g = PropertyGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    forest = minimum_spanning_forest(g)
    rows = [(r["src"], r["dst"], r["weight"]) for r in forest.collect()]
    assert sum(w for _, _, w in rows) == pytest.approx(1.0 + 2.0 + 3.0 + 1.5)
    assert len(rows) == 4


def test_msf_matches_kruskal(spark, sf_dir):
    e = (
        orderflow_edges(spark, sf_dir)
        .select("src", "dst", (F.pmod(F.col("src") * 7 + F.col("dst") * 13, F.lit(97))
                               + 1).cast("double").alias("weight"))
    )
    g = PropertyGraph(e)
    forest = minimum_spanning_forest(g)
    got_total = forest.agg(F.sum("weight")).collect()[0][0]
    rows = [(r["src"], r["dst"], r["weight"]) for r in e.collect()]
    # kruskal over the same undirected min-weight-canonical view
    canon = {}
    for s, d, w in rows:
        a, b = min(s, d), max(s, d)
        canon[(a, b)] = min(w, canon.get((a, b), float("inf")))
    want_total, _ = _kruskal([(a, b, w) for (a, b), w in canon.items()])
    assert got_total == pytest.approx(want_total)


def test_msf_distributed_contraction_fallback(spark, sf_dir):
    """contraction_collect_threshold=0 forces every round down the
    distributed pointer-jumping contraction path; the forest must be
    identical to the driver-union-find fast path."""
    e = orderflow_edges(spark, sf_dir).select(
        "src",
        "dst",
        (F.pmod(F.col("src") * 7 + F.col("dst") * 13, F.lit(97)) + 1)
        .cast("double")
        .alias("weight"),
    )
    g = PropertyGraph(e)
    fast = minimum_spanning_forest(g)
    slow = minimum_spanning_forest(g, contraction_collect_threshold=0)
    assert fast.agg(F.sum("weight")).collect()[0][0] == pytest.approx(
        slow.agg(F.sum("weight")).collect()[0][0]
    )
    assert fast.count() == slow.count()


def test_random_walks(spark):
    # deterministic walk on a cycle: every step moves (single out-edge)
    edges = [(0, 1), (1, 2), (2, 0)]
    g = PropertyGraph.from_edges(spark.createDataFrame(edges, ["src", "dst"]))
    sources = spark.createDataFrame([(0,)], ["id"])
    v = {r["vertex"]: r["visits"] for r in
         random_walks(g, sources, walks_per_source=2, steps=3).collect()}
    # 2 walks, 3 steps each, cycle: positions 1,2,0 → each vertex visited twice
    assert v == {0: 2, 1: 2, 2: 2}


def test_random_walks_deterministic(spark, sf_dir):
    g = PropertyGraph.from_edges(orderflow_edges(spark, sf_dir))
    sources = g.vertices.filter(F.col("id") % 100 == 0)
    a = sorted(map(tuple, random_walks(g, sources, 5, 4).collect()))
    b = sorted(map(tuple, random_walks(g, sources, 5, 4).collect()))
    assert a == b
    assert len(a) > 0
