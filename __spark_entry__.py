"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Conventions keeping Spark↔DuckDB hash-comparable:
- every computed column is aliased identically on both sides;
- floating-point outputs of iterative algorithms are rounded (round(x, 4))
  on BOTH sides; money-style sums round(x, 2);
- aggregates that DuckDB widens (sum(BIGINT)→HUGEINT) are cast explicitly.
"""

from __future__ import annotations

import sys
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------- #
# graph algorithms
# --------------------------------------------------------------------- #
def _bipartite_graph(spark, sf_dir):
    from graphchi_cpp_spark.datasets import bipartite_edges
    from graphchi_cpp_spark.graph import PropertyGraph

    return PropertyGraph.from_edges(bipartite_edges(spark, sf_dir))


def _cosupply_graph(spark, sf_dir):
    from graphchi_cpp_spark.datasets import cosupply_edges
    from graphchi_cpp_spark.graph import PropertyGraph

    return PropertyGraph.from_edges(cosupply_edges(spark, sf_dir))


def _register_core():
    from graphchi_cpp_spark.algos.pagerank import pagerank, pagerank_sql
    from graphchi_cpp_spark.algos.connected_components import (
        component_sizes,
        connected_components,
        wcc_sql,
    )
    from graphchi_cpp_spark.datasets import (
        BIPARTITE_EDGES_SQL,
        COSUPPLY_EDGES_SQL,
    )

    @query("pagerank", pagerank_sql(BIPARTITE_EDGES_SQL, iterations=3))
    def q_pagerank(spark, sf_dir):
        g = _bipartite_graph(spark, sf_dir)
        return pagerank(g, max_iter=3).select(
            "id", F.round("rank", 4).alias("rank")
        )

    @query("wcc", wcc_sql(COSUPPLY_EDGES_SQL))
    def q_wcc(spark, sf_dir):
        return connected_components(_cosupply_graph(spark, sf_dir))

    @query(
        "wcc_sizes",
        f"""
        WITH cc AS ({wcc_sql(COSUPPLY_EDGES_SQL)})
        SELECT component, count(*) AS size FROM cc GROUP BY component
        """,
    )
    def q_wcc_sizes(spark, sf_dir):
        return component_sizes(
            connected_components(_cosupply_graph(spark, sf_dir))
        )

    @query(
        "degree_distribution",
        f"""
        WITH edges AS ({BIPARTITE_EDGES_SQL}),
        deg AS (
            SELECT id,
                   coalesce(i.ind, 0) + coalesce(o.outd, 0) AS degree
            FROM (SELECT src AS id FROM edges UNION SELECT dst FROM edges) v
            LEFT JOIN (SELECT dst AS id, count(*) AS ind FROM edges GROUP BY 1) i USING (id)
            LEFT JOIN (SELECT src AS id, count(*) AS outd FROM edges GROUP BY 1) o USING (id)
        )
        SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree
        """,
    )
    def q_degree_distribution(spark, sf_dir):
        from graphchi_cpp_spark.operators.aggregates import degree_distribution

        g = _bipartite_graph(spark, sf_dir)
        return degree_distribution(g.degrees())


def _register_ops():
    from graphchi_cpp_spark.datasets import RATINGS_SQL, ratings
    from graphchi_cpp_spark.operators.toplist import top_k_per_key

    @query(
        "topk_per_user",
        f"""
        WITH r AS ({RATINGS_SQL})
        SELECT "user", item, rating, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY "user" ORDER BY rating DESC, item ASC
            ) AS rank
            FROM r
        ) WHERE rank <= 5
        """,
    )
    def q_topk_per_user(spark, sf_dir):
        r = ratings(spark, sf_dir)
        return top_k_per_key(
            r, "user", "rating", k=5, tiebreak_col="item"
        ).select("user", "item", "rating", F.col("rank").cast("long"))


def _register_graph_algos():
    from graphchi_cpp_spark.algos.kcores import kcores
    from graphchi_cpp_spark.algos.label_propagation import lpa_communities, lpa_sql
    from graphchi_cpp_spark.algos.percolation import (
        bond_percolation,
        percolation_survivors_sql,
    )
    from graphchi_cpp_spark.algos.subgraph import khop_vertices, khop_vertices_sql
    from graphchi_cpp_spark.algos.connected_components import wcc_sql
    from graphchi_cpp_spark.algos.triangles import (
        triangle_count,
        triangles_per_vertex,
        triangles_per_vertex_sql,
    )
    from graphchi_cpp_spark.datasets import BIPARTITE_EDGES_SQL, COSUPPLY_EDGES_SQL

    @query("triangles_per_vertex", triangles_per_vertex_sql(COSUPPLY_EDGES_SQL))
    def q_tpv(spark, sf_dir):
        return triangles_per_vertex(_cosupply_graph(spark, sf_dir), orient="id")

    @query(
        "triangle_count",
        f"""
        WITH e AS ({COSUPPLY_EDGES_SQL})
        SELECT count(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        """,
    )
    def q_tc(spark, sf_dir):
        # degree orientation exercises the S11 optimization; count is
        # orientation-invariant so the id-oriented oracle matches
        return triangle_count(_cosupply_graph(spark, sf_dir), orient="degree")

    @query("kcores")  # iterative peeling — not single-SQL-expressible
    def q_kcores(spark, sf_dir):
        return kcores(_cosupply_graph(spark, sf_dir))

    @query("lpa_communities", lpa_sql(COSUPPLY_EDGES_SQL, 2))
    def q_lpa(spark, sf_dir):
        return lpa_communities(_cosupply_graph(spark, sf_dir), max_iter=2)

    _SEEDS_SQL = (
        f"SELECT id FROM (SELECT src AS id FROM ({BIPARTITE_EDGES_SQL}) "
        f"UNION SELECT dst FROM ({BIPARTITE_EDGES_SQL})) WHERE id % 50 = 0"
    )

    @query("khop_vertices", khop_vertices_sql(BIPARTITE_EDGES_SQL, _SEEDS_SQL, 2))
    def q_khop(spark, sf_dir):
        g = _bipartite_graph(spark, sf_dir)
        seeds = g.vertices.filter(F.col("id") % 50 == 0)
        return khop_vertices(g, seeds, 2)

    @query(
        "bond_percolation",
        wcc_sql(
            percolation_survivors_sql(COSUPPLY_EDGES_SQL, 0.5),
            vertices_sql=(
                f"SELECT src AS id FROM ({COSUPPLY_EDGES_SQL}) "
                f"UNION SELECT dst FROM ({COSUPPLY_EDGES_SQL})"
            ),
        ),
    )
    def q_percolation(spark, sf_dir):
        return bond_percolation(_cosupply_graph(spark, sf_dir), p=0.5)


_register_core()
_register_ops()
_register_graph_algos()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-10 on the sf0.001 customer→supplier graph."""
    from graphchi_cpp_spark.algos.pagerank import pagerank
    from graphchi_cpp_spark.operators.toplist import top_k_vertices

    g = _bipartite_graph(spark, "/root/testdata/sf0.001")
    return top_k_vertices(pagerank(g, max_iter=3), "rank", 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
