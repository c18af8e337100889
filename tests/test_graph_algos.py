"""Triangles, k-cores, LPA, k-hop subgraph, bond percolation."""

from pyspark.sql import functions as F

from graphchi_cpp_spark.algos.kcores import kcores
from graphchi_cpp_spark.algos.label_propagation import (
    lpa_communities,
    lpa_sql,
    seeded_label_propagation,
)
from graphchi_cpp_spark.algos.percolation import (
    bond_percolation,
    percolate_edges,
)
from graphchi_cpp_spark.algos.subgraph import (
    khop_subgraph,
    khop_vertices,
    khop_vertices_sql,
)
from graphchi_cpp_spark.algos.triangles import (
    triangle_count,
    triangles_per_vertex,
    triangles_per_vertex_sql,
)
from graphchi_cpp_spark.datasets import COSUPPLY_EDGES_SQL, cosupply_edges
from graphchi_cpp_spark.graph import PropertyGraph
from tests.conftest import assert_df_matches_oracle


def _tiny(spark):
    # triangle 0-1-2, square 3-4-5-6 (no triangle), pendant 7 on 0
    return PropertyGraph.from_edges(
        spark.createDataFrame(
            [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (5, 6), (6, 3), (0, 7)],
            ["src", "dst"],
        )
    )


def test_triangles_tiny(spark):
    g = _tiny(spark)
    assert triangle_count(g, orient="id").collect()[0]["n_triangles"] == 1
    assert triangle_count(g, orient="degree").collect()[0]["n_triangles"] == 1
    pv = {r["id"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    assert pv == {0: 1, 1: 1, 2: 1}


def test_triangles_cosupply_vs_duckdb(spark, sf_dir, duck):
    g = PropertyGraph.from_edges(cosupply_edges(spark, sf_dir))
    result = triangles_per_vertex(g, orient="id")
    assert_df_matches_oracle(
        result, duck, triangles_per_vertex_sql(COSUPPLY_EDGES_SQL)
    )


def test_triangle_orientations_agree(spark, sf_dir):
    g = PropertyGraph.from_edges(cosupply_edges(spark, sf_dir))
    a = triangle_count(g, orient="id").collect()[0]["n_triangles"]
    b = triangle_count(g, orient="degree").collect()[0]["n_triangles"]
    assert a == b


def test_triangle_dense_bitmap_matches_join_plan(spark, sf_dir, monkeypatch):
    """The dense adjacency-bitmap count must equal the enumeration-join
    count (and the brute wedge count) on a non-trivial graph."""
    from graphchi_cpp_spark.algos import triangles as tri_mod
    from graphchi_cpp_spark.graph import erdos_renyi

    g = PropertyGraph.from_edges(erdos_renyi(spark, 500, 8, seed=7))
    dense = triangle_count(g, orient="degree").collect()[0]["n_triangles"]
    # force the sparse fallback (join plan) by shrinking the bitmap cap
    monkeypatch.setattr(tri_mod, "DENSE_BITMAP_MAX_BYTES", 0)
    sparse = triangle_count(g, orient="degree").collect()[0]["n_triangles"]
    assert dense == sparse
    assert dense == tri_mod.triangles(g, orient="id").count()


def test_triangle_dense_bitmap_triangle_free(spark):
    """Dense-mode count on a triangle-free graph must be 0, not NULL:
    on a star no oriented dst has out-neighbors, so the bitmap join
    drops every edge and the aggregate input is empty."""
    star = PropertyGraph.from_edges(
        spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    )
    for orient in ("id", "degree"):
        n = triangle_count(star, orient=orient).collect()[0]["n_triangles"]
        assert n == 0


def test_kcores_tiny(spark):
    # K4 on {0,1,2,3} (core 3), path 10-11-12 (core 1), isolated 20
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(10, 11), (11, 12)]
    g = PropertyGraph(
        spark.createDataFrame(edges, ["src", "dst"]),
        spark.createDataFrame(
            [(i,) for i in [0, 1, 2, 3, 10, 11, 12, 20]], ["id"]
        ),
    )
    cores = {r["id"]: r["core"] for r in kcores(g).collect()}
    assert cores == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1, 12: 1, 20: 0}
    peel = {r["id"]: r["core"] for r in kcores(g, method="peel").collect()}
    assert peel == cores


def test_kcores_hindex_equals_peel_random(spark):
    # deterministic pseudo-random graph: h-index fixpoint must agree with
    # literal peeling (they share the output contract)
    from graphchi_cpp_spark.graph import PropertyGraph as PG

    g = PG.from_edges(
        spark.range(300).select(
            (F.col("id") * 37 % 80).alias("src"),
            (F.col("id") * 61 % 80 + F.col("id") % 7).alias("dst"),
        )
    )
    a = {r["id"]: r["core"] for r in kcores(g, method="hindex").collect()}
    b = {r["id"]: r["core"] for r in kcores(g, method="peel").collect()}
    assert a == b


def test_lpa_tiny_converges(spark):
    # two cliques joined by one edge: labels should settle per-clique
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    g = PropertyGraph.from_edges(
        spark.createDataFrame(c1 + c2 + [(3, 10)], ["src", "dst"])
    )
    labels = {r["id"]: r["label"] for r in lpa_communities(g, max_iter=5).collect()}
    assert len({labels[i] for i in range(4)}) == 1
    assert len({labels[i] for i in range(10, 14)}) == 1


def test_lpa_vs_duckdb(spark, sf_dir, duck):
    g = PropertyGraph.from_edges(cosupply_edges(spark, sf_dir))
    result = lpa_communities(g, max_iter=2)
    assert_df_matches_oracle(result, duck, lpa_sql(COSUPPLY_EDGES_SQL, 2))


def test_seeded_label_propagation(spark):
    # chain 0-1-2-3-4 with seeds at the ends
    g = PropertyGraph.from_edges(
        spark.createDataFrame([(i, i + 1) for i in range(4)], ["src", "dst"])
    )
    seeds = spark.createDataFrame([(0, 0), (4, 1)], ["id", "label"])
    out = seeded_label_propagation(g, seeds, num_labels=2, max_iter=10)
    lab = {r["id"]: r["label"] for r in out.collect()}
    assert lab[0] == 0 and lab[1] == 0
    assert lab[4] == 1 and lab[3] == 1


def test_khop_tiny(spark):
    g = _tiny(spark)
    seeds = spark.createDataFrame([(7,)], ["id"])
    hops = {r["id"]: r["hop"] for r in khop_vertices(g, seeds, 2).collect()}
    assert hops == {7: 0, 0: 1, 1: 2, 2: 2}
    sub = khop_subgraph(g, seeds, 1)
    assert {(r["src"], r["dst"]) for r in sub.collect()} == {(0, 1), (0, 2), (0, 7)}


def test_khop_vs_duckdb(spark, sf_dir, duck):
    from graphchi_cpp_spark.datasets import bipartite_edges, BIPARTITE_EDGES_SQL

    g = PropertyGraph.from_edges(bipartite_edges(spark, sf_dir))
    seeds = g.vertices.filter(F.col("id") % 50 == 0)
    result = khop_vertices(g, seeds, 2)
    seeds_sql = (
        f"SELECT id FROM (SELECT src AS id FROM ({BIPARTITE_EDGES_SQL}) "
        f"UNION SELECT dst FROM ({BIPARTITE_EDGES_SQL})) WHERE id % 50 = 0"
    )
    assert_df_matches_oracle(
        result, duck, khop_vertices_sql(BIPARTITE_EDGES_SQL, seeds_sql, 2)
    )


def test_percolation(spark):
    g = _tiny(spark)
    surv = percolate_edges(g.edges, 0.5)
    assert surv.count() < g.edges.count()
    comp = bond_percolation(g, p=0.5)
    assert comp.count() == 8  # every original vertex labeled


def test_kcores_gate_converges_within_oracle_unroll(spark, sf_dir):
    """The registered kcores query's DuckDB oracle unrolls the h-index
    fixpoint 24 times (__spark_entry__.py kcores_sql(iterations=24)) —
    sufficient only if the Spark side actually converges within that
    budget on the gate graph. Assert the margin instead of assuming it:
    the fixture's convergence depth must sit comfortably under the
    unroll (extra oracle iterations past the fixpoint are no-ops, so
    only TOO FEW is dangerous)."""
    from graphchi_cpp_spark.datasets import cosupply_edges

    g = PropertyGraph.from_edges(cosupply_edges(spark, sf_dir))
    stats: dict = {}
    kcores(g, stats=stats).count()
    assert 0 < stats["iterations"] <= 24, (
        f"h-index fixpoint took {stats['iterations']} supersteps — the "
        "registered oracle's 24-iteration CTE unroll no longer covers it; "
        "raise iterations= in __spark_entry__.py's kcores query"
    )
