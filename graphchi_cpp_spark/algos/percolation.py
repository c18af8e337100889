"""Bond percolation (G13): random edge survival, then component sizes.

Reference: ``toolkits/graph_analytics/bond_percolation.cpp:101`` — each
edge survives with probability p (C rand()), then connected components of
the surviving graph are labeled and measured.

Determinism: the reference uses a process-local RNG; for oracle
comparability we replace it with a hash-based coin both Spark and DuckDB
compute identically: edge (s,d) survives iff
(s*7919 + d*104729) mod 1000 < p*1000. Same marginal survival rate,
reproducible across engines and runs (the determinism contract,
``unittest.sh:25-28``, strengthened).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.algos.connected_components import connected_components
from graphchi_cpp_spark.graph import PropertyGraph

_A, _B, _M = 7919, 104729, 1000


def percolate_edges(edges: DataFrame, p: float) -> DataFrame:
    """Surviving edges under the deterministic hash coin."""
    thresh = int(p * _M)
    return edges.filter(
        F.pmod(F.col("src") * _A + F.col("dst") * _B, F.lit(_M)) < thresh
    )


def bond_percolation(graph: PropertyGraph, p: float = 0.5, max_iter: int = 50) -> DataFrame:
    """(id, component) over the percolated graph; vertices of the ORIGINAL
    graph that lost all edges keep themselves as singleton components."""
    surviving = percolate_edges(graph.edges.select("src", "dst"), p)
    g = PropertyGraph(surviving, graph.vertices.select("id"))
    return connected_components(g, max_iter=max_iter)


def percolation_survivors_sql(edges_sql: str, p: float) -> str:
    thresh = int(p * _M)
    return f"""
        SELECT src, dst FROM ({edges_sql})
        WHERE (src * {_A} + dst * {_B}) % {_M} < {thresh}
    """
