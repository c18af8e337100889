"""Strongly connected components (G5) — forward-backward coloring.

Reference: ``example_apps/stronglyconnectedcomponents.cpp`` — the
Salihoglu-Widom FW-BW algorithm: repeat {forward min-color propagation
along out-edges; backward propagation of the same colors along in-edges;
vertices whose forward color == their own id and backward-confirmed form
the SCC of that root; remove them} (bidirectional_label struct at ``:94``,
forward phase ``:154-``, backward ``:227-267``, loop ``:344-357``,
edge deletions via ``SUPPORT_DELETIONS`` ``:34``).

Spark recipe per round (classic distributed FW-BW-coloring):
1. color(v) = min vertex id reachable *backward*: propagate min id along
   out-edges to fixpoint (a WCC-style frontier loop on the directed graph).
2. Within each color class, compute B = vertices that can reach the
   color's root going backward (propagate a 'confirmed' flag from the
   root along REVERSED edges, but only across same-color vertices).
3. color ∩ B is an SCC (the root's SCC). Assign, remove those vertices
   (anti-join — the relational analog of the reference's tombstone
   deletions, C8), repeat until no vertices remain.

Each phase is a Pregel-style frontier loop; edges shrink every round.
Trivial SCCs (sources/sinks after trimming) fall out naturally when a
vertex is its own color root and nothing else confirms.

Scale note: worst case O(rounds · E); real graphs finish in few rounds
(giant SCC + periphery). Edges are re-checkpointed per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph


def _propagate_min(edges: DataFrame, vertices: DataFrame, max_iter: int = 100) -> DataFrame:
    """min-id propagation along edge direction: color(v) = min(id(u)) over
    u with a directed path u →* v (including v). Frontier-optimized, with
    the WCC hybrid: once the active set fits the broadcast row cap the
    gather join probes a broadcast frontier map instead of shuffling the
    (stats-less, checkpointed) edge table every superstep."""
    from graphchi_cpp_spark.algos.connected_components import BCAST_FRONTIER_MAX
    from graphchi_cpp_spark.checkpoints import CheckpointJanitor

    jan = CheckpointJanitor(edges.sparkSession)
    v = vertices.select("id", F.col("id").alias("color"), F.lit(True).alias("act"))
    # lazy: the count below materializes the checkpoint in the same job
    v = v.localCheckpoint(eager=False)
    n_active = v.count()
    for _ in range(max_iter):
        frontier = v.filter("act").select(F.col("id").alias("src"), "color")
        if n_active <= BCAST_FRONTIER_MAX:
            frontier = F.broadcast(frontier)
        msgs = (
            edges.join(frontier, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("color").alias("m"))
        )
        # job folding: the lazy checkpoint is materialized BY the
        # active-count probe (one job per superstep; the eager variant
        # paid a checkpoint job plus a probe job over the same blocks).
        # The probe references v exactly once — checkpoint_lazy contract.
        v = jan.checkpoint_lazy(
            v.join(msgs, "id", "left").select(
                "id",
                F.least(F.col("color"), F.coalesce("m", F.col("color"))).alias("color"),
                (F.coalesce("m", F.col("color") + 1) < F.col("color")).alias("act"),
            )
        )
        n_active = v.filter("act").count()
        jan.sweep()
        if n_active == 0:
            break
    # the final generation's blocks stay alive (the janitor only frees
    # superseded generations), so the caller can keep reading this view
    return v.select("id", "color")


def strongly_connected_components(
    graph: PropertyGraph, max_rounds: int = 20
) -> DataFrame:
    """Returns (id, component) — component = min vertex id in the SCC."""
    from graphchi_cpp_spark.partitioning import (
        adaptive_partitions,
        scoped_shuffle_partitions,
    )

    spark = graph.edges.sparkSession
    # data-derived partition count for every per-round exchange and
    # checkpoint layout (guide §2); the conf cap binds at cluster scale
    p = adaptive_partitions(spark, graph.edges.count())
    with scoped_shuffle_partitions(spark, p):
        return _scc_rounds(graph, max_rounds)


def _scc_rounds(graph: PropertyGraph, max_rounds: int) -> DataFrame:
    from graphchi_cpp_spark.algos.connected_components import BCAST_FRONTIER_MAX

    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    # lazy: the round-top count materializes it in the same job
    remaining = graph.vertices.select("id").localCheckpoint(eager=False)
    assigned_parts: list[DataFrame] = []

    def _b(df, small):
        # |V|-bounded vertex sets broadcast into joins against the edge
        # table under the shared frontier cap (stats-less checkpointed
        # inputs would otherwise shuffle the edge table each rewrite)
        return F.broadcast(df) if small else df

    for _ in range(max_rounds):
        n_remaining = remaining.count()
        if n_remaining == 0:
            break
        small = n_remaining <= BCAST_FRONTIER_MAX
        # 0. trim: vertices with no in- or no out-edges in the remaining
        #    graph are singleton SCCs (kills chains/DAG periphery fast —
        #    the standard FW-BW-Trim step)
        n_left = n_remaining
        while True:
            srcs = edges.select(F.col("src").alias("id")).distinct()
            dsts = edges.select(F.col("dst").alias("id")).distinct()
            nontrivial = srcs.join(_b(dsts, small), "id", "left_semi")
            # job folding: the count materializes the lazy checkpoint in
            # the same job (was an eager-checkpoint job + a limit(1)
            # probe job over its blocks)
            trivial = remaining.join(
                _b(nontrivial, small), "id", "left_anti"
            ).localCheckpoint(eager=False)
            n_trivial = trivial.count()
            if n_trivial == 0:
                break
            n_left -= n_trivial
            # lazy projection over the materialized blocks — the former
            # eager re-checkpoint of the same rows was one full extra
            # job per trim round for a column rename
            assigned_parts.append(
                trivial.select("id", F.col("id").alias("component"))
            )
            # lazy: the next consumer (the following trim probe's count,
            # or _propagate_min's superstep-0 count) references it once
            # and materializes it in its own job
            remaining = remaining.join(
                _b(trivial, small), "id", "left_anti"
            ).localCheckpoint(eager=False)
            # edges stays EAGER: the next trim probe reads it twice
            # (srcs + dsts subtrees of one job) — an unmaterialized lazy
            # checkpoint would compute the rewrite once per consumer
            edges = (
                edges.join(
                    _b(trivial.withColumnRenamed("id", "src"), small),
                    "src",
                    "left_anti",
                )
                .join(
                    _b(trivial.withColumnRenamed("id", "dst"), small),
                    "dst",
                    "left_anti",
                )
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
        # trivial ⊆ remaining and both are duplicate-free, so the counts
        # already taken replace the former remaining.limit(1).count()
        # probe job per round
        if n_left == 0:
            break
        # 1. forward coloring from min ids
        colors = _propagate_min(edges, remaining)
        # 2. backward confirmation within color classes: root reaches v
        #    along reversed edges staying inside the color class
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ec = (
            rev.join(
                _b(
                    colors.withColumnRenamed("id", "src").withColumnRenamed(
                        "color", "c_src"
                    ),
                    small,
                ),
                "src",
            )
            .join(
                _b(
                    colors.withColumnRenamed("id", "dst").withColumnRenamed(
                        "color", "c_dst"
                    ),
                    small,
                ),
                "dst",
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        # confirmed accumulates as a LAZY union of the eagerly-
        # checkpointed waves: the former per-wave re-checkpoint of the
        # whole confirmed set re-materialized O(|SCC|) rows every wave
        # (one extra full job per wave); the anti-join/semi-join readers
        # scan the same checkpointed blocks either way
        from graphchi_cpp_spark.algos.connected_components import (
            BCAST_FRONTIER_MAX,
        )

        # job folding (this wave loop is wave-per-job on long chains —
        # the count materializes each lazy checkpoint, halving per-wave
        # jobs vs eager-checkpoint + count over the same blocks)
        confirmed = colors.filter(F.col("id") == F.col("color")).select(
            "id"
        ).localCheckpoint(eager=False)
        frontier = confirmed
        n_confirmed = confirmed.count()
        while True:
            f_side = frontier.withColumnRenamed("id", "src")
            c_side = confirmed
            if n_confirmed <= BCAST_FRONTIER_MAX:
                # frontier ⊆ confirmed, so one cap covers both sides
                f_side, c_side = F.broadcast(f_side), F.broadcast(c_side)
            nxt = (
                ec.join(f_side, "src", "left_semi")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(c_side, "id", "left_anti")
                .localCheckpoint(eager=False)
            )
            n = nxt.count()
            if n == 0:
                break
            confirmed = confirmed.unionByName(nxt)
            n_confirmed += n
            frontier = nxt
        scc = colors.join(_b(confirmed, small), "id", "left_semi").select(
            "id", F.col("color").alias("component")
        )
        assigned_parts.append(scc.localCheckpoint(eager=True))
        scc = assigned_parts[-1]
        # 3. remove assigned vertices and their edges (remaining lazy —
        #    the next round-top count references it once and materializes)
        remaining = remaining.join(
            _b(scc.select("id"), small), "id", "left_anti"
        ).localCheckpoint(eager=False)
        edges = (
            edges.join(
                _b(scc.select(F.col("id").alias("src")), small), "src", "left_anti"
            )
            .join(
                _b(scc.select(F.col("id").alias("dst")), small), "dst", "left_anti"
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

    if not assigned_parts:
        return graph.edges.sparkSession.createDataFrame([], "id long, component long")
    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    return out


def scc_sql(edges_sql: str, vertices_sql: str | None = None) -> str:
    """DuckDB oracle: v,w in same SCC iff v→*w and w→*v; component = min
    id of mutually-reachable set (recursive CTE transitive closure —
    fine at oracle scale, quadratic in the worst case)."""
    verts = (
        f"({vertices_sql})"
        if vertices_sql
        else "(SELECT src AS id FROM base_edges UNION SELECT dst FROM base_edges)"
    )
    return f"""
        WITH RECURSIVE
        base_edges AS ({edges_sql}),
        verts AS (SELECT id FROM {verts}),
        reach(a, b) AS (
            SELECT src AS a, dst AS b FROM base_edges
            UNION
            SELECT r.a, e.dst AS b
            FROM reach r JOIN base_edges e ON e.src = r.b
        ),
        mutual AS (
            SELECT r1.a AS v, r1.b AS w
            FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
        )
        SELECT v.id, least(v.id, coalesce(min(m.w), v.id)) AS component
        FROM verts v LEFT JOIN mutual m ON m.v = v.id
        GROUP BY v.id
    """
