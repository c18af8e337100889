"""PageRank (G1/G2) — power iteration, damping 0.85.

Reference: ``example_apps/pagerank.cpp:73-113`` (update function), functional
variants ``example_apps/pagerank_functional.cpp:48-103``. Semantics of the
reference update:

    rank(v) = RANDOMRESETPROB + (1 - RANDOMRESETPROB) * sum_{u->v} rank(u)/outdeg(u)

with RANDOMRESETPROB = 0.15. Dangling mass is NOT redistributed (the
reference broadcasts ``rank/outc`` only when outc > 0, pagerank.cpp:100) —
we match that exactly so results are oracle-comparable.

Spark recipe (one superstep):
    msgs  = edges ⋈ ranks(src) → groupBy(dst).agg(sum(rank/outdeg))
    ranks = vertices ⟕ msgs → 0.15 + 0.85·coalesce(sum, 0)

Scale notes: edges cached + the static (vertex, outdeg) table computed
once; the per-iteration shuffle carries only (dst, partial-sum) thanks to
Catalyst's map-side partial aggregation — O(V) shuffle rows per superstep,
not O(E). Power-law hubs are fine: sum is commutative so partial aggs
absorb skew. Lineage cut via localCheckpoint in the Pregel runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph
from graphchi_cpp_spark.pregel import Pregel, msg, src

RESET = 0.15
DAMPING = 0.85


def pagerank(
    graph: PropertyGraph,
    max_iter: int = 3,
    tol: float | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Returns (id, rank). Fixed-iteration when tol is None (matches the
    reference's ``niters`` mode); convergence-delta early stop (C3) when
    tol is given."""
    # materialize the (possibly derived) edge table ONCE — every superstep
    # joins it; without this a view over e.g. orders⋈lineitem would be
    # recomputed per iteration
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=True)
    g = PropertyGraph(edges)
    out_deg = g.out_degrees()
    vertices = (
        g.vertices.select("id")
        .join(out_deg, "id", "left")
        .select(
            "id", F.coalesce("out_degree", F.lit(0)).cast("double").alias("outdeg")
        )
    )

    p = (
        Pregel(edges, vertices)
        .with_vertex_column(
            "rank",
            F.lit(1.0),
            F.lit(RESET) + F.lit(DAMPING) * F.coalesce(msg(), F.lit(0.0)),
        )
        # try_divide: Catalyst pushes this single-sided projection below the
        # edge join, so it is also evaluated for sinks (outdeg=0) — ANSI mode
        # would raise; null messages never materialize because sinks have no
        # out-edges to join with.
        .send_msg_to_dst(F.try_divide(src("rank"), src("outdeg")))
        .agg_msgs(F.sum(msg()))
    )
    result = p.run(
        max_iter=max_iter,
        tol=tol,
        tol_col="rank" if tol is not None else None,
        checkpoint_every=checkpoint_every,
    )
    return result.select("id", "rank")


def pagerank_sql(edges_sql: str, iterations: int = 3, ndigits: int = 4) -> str:
    """DuckDB oracle: the same power iteration unrolled as chained CTEs.

    ``edges_sql`` must yield columns (src, dst); duplicate (src,dst) pairs
    are allowed and counted as parallel edges, matching the Spark side.
    """
    ctes = [
        f"edges AS ({edges_sql})",
        "verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY 1)",
        "r0 AS (SELECT id, 1.0::DOUBLE AS rank FROM verts)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
              SELECT v.id, 0.15 + 0.85 * coalesce(m.s, 0.0) AS rank
              FROM verts v LEFT JOIN (
                SELECT e.dst AS id, sum(r.rank / o.od) AS s
                FROM edges e
                JOIN r{i - 1} r ON r.id = e.src
                JOIN outdeg o ON o.id = e.src
                GROUP BY e.dst
              ) m ON m.id = v.id
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, round(rank, {ndigits}) AS rank FROM r{iterations}"
    )
