"""WCC vs hand graph + recursive-CTE oracle; frontier termination."""

from graphchi_cpp_spark.algos.connected_components import (
    component_sizes,
    connected_components,
    wcc_sql,
)
from graphchi_cpp_spark.datasets import COSUPPLY_EDGES_SQL, cosupply_edges
from graphchi_cpp_spark.graph import PropertyGraph
from tests.conftest import assert_df_matches_oracle


def test_graph_generators(spark):
    """chain / grid / crossgrid (reference graphgenerators.cpp) + WCC
    sanity: each generated graph is one connected component."""
    from graphchi_cpp_spark.graph import PropertyGraph, chain_graph, grid_graph

    ch = chain_graph(spark, 10)
    assert ch.count() == 9
    g4 = grid_graph(spark, 4)
    assert g4.count() == 2 * 4 * 3  # right + down edges
    x4 = grid_graph(spark, 4, cross=True)
    assert x4.count() == 2 * 4 * 3 + 9
    from graphchi_cpp_spark.algos.connected_components import (
        connected_components,
    )

    comps = connected_components(PropertyGraph.from_edges(x4))
    assert comps.select("component").distinct().count() == 1


def test_wcc_two_components(spark):
    # component {0,1,2} and {10,11}; directed edges, WCC ignores direction
    edges = spark.createDataFrame(
        [(0, 1), (2, 1), (10, 11)], ["src", "dst"]
    )
    g = PropertyGraph.from_edges(edges)
    cc = {r["id"]: r["component"] for r in connected_components(g).collect()}
    assert cc == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_wcc_chain_frontier_terminates_early(spark):
    # long chain: frontier should still converge within max_iter
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"]
    )
    g = PropertyGraph.from_edges(edges)
    cc = connected_components(g, max_iter=n + 5)
    assert cc.filter("component != 0").count() == 0
    assert cc.count() == n + 1


def test_wcc_cosupply_vs_duckdb(spark, sf_dir, duck):
    g = PropertyGraph.from_edges(cosupply_edges(spark, sf_dir))
    result = connected_components(g)
    assert_df_matches_oracle(result, duck, wcc_sql(COSUPPLY_EDGES_SQL))


def test_component_sizes(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], ["src", "dst"])
    g = PropertyGraph.from_edges(edges)
    sizes = component_sizes(connected_components(g)).collect()
    assert [(r["component"], r["size"]) for r in sizes] == [(0, 3), (5, 2)]


def test_wcc_star_matches_and_beats_lpa_on_high_diameter(spark):
    """The star contraction converges in O(log V) rounds on a
    diameter-10^4 path — label propagation, capped at the same round
    budget, cannot (it needs one superstep per hop). Also checks exact
    agreement with min-label WCC on a multi-component graph."""
    import time

    from graphchi_cpp_spark.algos.connected_components import (
        connected_components_star,
    )
    from graphchi_cpp_spark.graph import chain_graph

    # correctness on a small multi-component graph
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (20, 20), (7, 3)],
        ["src", "dst"],
    )
    g = PropertyGraph.from_edges(edges)
    want = {
        (r["id"], r["component"])
        for r in connected_components(g).collect()
    }
    got = {
        (r["id"], r["component"])
        for r in connected_components_star(g).collect()
    }
    assert got == want

    # diameter 10^4: star converges within 20 rounds, LPA at the same
    # budget is still propagating (path needs ~10^4 supersteps)
    path = PropertyGraph.from_edges(chain_graph(spark, 10_001))
    t0 = time.time()
    comp = connected_components_star(path, max_iter=20)
    n_comp = comp.select("component").distinct().count()
    star_secs = time.time() - t0
    assert n_comp == 1
    lpa = connected_components(path, max_iter=20)
    assert lpa.select("component").distinct().count() > 1
    assert star_secs < 300
