"""BSP aggregate-messages / Pregel runtime — THE computation primitive.

Reference: GraphChi's update-function engine (``src/api/graphchi_program.hpp:87``,
driver loop ``src/engine/graphchi_engine.hpp:779-959``) and its GAS/functional
APIs (``src/api/graphlab2_1_GAS_api/graphchi_graphlabv2_1.hpp:326-393``,
``src/api/functional/functional_api.hpp:55-75``). GraphChi is *asynchronous*
(updates can observe same-iteration writes, C6); this runtime is bulk-
synchronous — identical fixed points for the min/sum-propagation algorithm
family, possibly different iteration counts (documented deviation,
SURVEY.md §2.1 C6).

One superstep is pure relational algebra, so Catalyst plans it:

    triplets = edges ⋈ vertices[src] (⋈ vertices[dst])
    msgs     = triplets.select(target, msg_expr).groupBy(target).agg(agg)
    vertices = vertices ⟕ msgs → update expressions

Scale design:
- The edge table is joined fresh each superstep; callers cache (and
  optionally pre-partition by the join key) so the scan side is reused.
- Map-side partial aggregation (Catalyst does this for sum/min/max/count)
  bounds the shuffle per superstep to ~|V| message rows, not |E|.
- Frontier mode (C4 selective scheduling, ``src/engine/
  bitset_scheduler.hpp:38-110``) restricts the triplet build to edges whose
  source changed last superstep — the difference between O(E·iters) and
  O(work) for convergent algorithms like WCC.
- Lineage is cut with localCheckpoint every ``checkpoint_every`` supersteps
  (driver-side loop grows the plan unboundedly otherwise; §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

MSG_COL = "_pregel_msg"
ACTIVE_COL = "_active"


def src(col: str) -> Column:
    """Reference a source-vertex attribute inside a message expression."""
    return F.col(f"src.{col}")


def dst(col: str) -> Column:
    """Reference a destination-vertex attribute inside a message expression."""
    return F.col(f"dst.{col}")


def edge(col: str) -> Column:
    """Reference an edge attribute inside a message expression."""
    return F.col(f"edge.{col}")


def msg() -> Column:
    """Reference the aggregated message inside a vertex-update expression."""
    return F.col(MSG_COL)


def old(col: str) -> Column:
    """Reference the pre-update value of a vertex column inside the
    frontier ``active_after_update`` expression (change detection)."""
    return F.col(f"_old_{col}")


def _triplets(
    edges: DataFrame,
    vertices: DataFrame,
    need_src: bool,
    need_dst: bool,
) -> DataFrame:
    """edges ⋈ vertex state, exposing `edge`, `src`, `dst` structs.

    Joining only the sides actually referenced keeps PageRank-style
    gather (src side only) to a single join per superstep.

    The join keys are PLAIN projected columns, not struct fields: a join
    on ``edge.src`` (a field extraction) defeats outputPartitioning
    propagation, so an edge table the caller pre-partitioned by src gets
    re-shuffled EVERY superstep — measured as an extra
    ``Exchange hashpartitioning(edge.src)`` per iteration. Projecting
    the key beside the struct (``src AS _jsrc``) keeps the cache's
    hashpartitioning visible to the planner: the gather join of a
    co-partitioned (edges by src, state by id) pair is exchange-free,
    which is the O(E)-shuffle-per-superstep vs O(V) difference at scale.
    """
    t = edges.select(
        F.struct(*edges.columns).alias("edge"),
        F.col("src").alias("_jsrc"),
        F.col("dst").alias("_jdst"),
    )
    if need_src:
        vs = vertices.select(
            F.struct(*vertices.columns).alias("src"),
            F.col("id").alias("_vsid"),
        )
        t = t.join(vs, F.col("_jsrc") == F.col("_vsid")).drop("_vsid")
    if need_dst:
        vd = vertices.select(
            F.struct(*vertices.columns).alias("dst"),
            F.col("id").alias("_vdid"),
        )
        t = t.join(vd, F.col("_jdst") == F.col("_vdid")).drop("_vdid")
    return t.drop("_jsrc", "_jdst")


def aggregate_messages(
    edges: DataFrame,
    vertices: DataFrame,
    agg: Column,
    to_dst: Column | None = None,
    to_src: Column | None = None,
    need_src: bool = True,
    need_dst: bool = False,
    edges_for_to_src: DataFrame | None = None,
) -> DataFrame:
    """One gather step: returns (id, <agg aliases>) for vertices receiving messages.

    GraphFrames-style aggregateMessages; the GAS gather phase
    (``graphchi_graphlabv2_1.hpp:326-393``) with gather_edges direction
    chosen by which of to_dst/to_src is set.

    ``edges_for_to_src``: optional distinct edge set for the to_src
    direction (frontier mode sends to_dst over src-active edges and
    to_src over dst-active edges — one shared set would let an inactive
    endpoint "send" whenever the other endpoint is active, which is wrong
    for non-idempotent aggregates like sum/count).
    """
    parts = []
    if to_dst is not None:
        t = _triplets(edges, vertices, need_src, need_dst)
        parts.append(
            t.select(F.col("edge.dst").alias("id"), to_dst.alias(MSG_COL))
        )
    if to_src is not None:
        e = edges_for_to_src if edges_for_to_src is not None else edges
        t = _triplets(e, vertices, need_src, need_dst)
        parts.append(
            t.select(F.col("edge.src").alias("id"), to_src.alias(MSG_COL))
        )
    if not parts:
        raise ValueError("need at least one of to_dst/to_src")
    allm = parts[0]
    for p in parts[1:]:
        allm = allm.unionByName(p)
    return allm.filter(F.col(MSG_COL).isNotNull()).groupBy("id").agg(agg)


@dataclass
class Pregel:
    """Builder-style Pregel operator (public API shape per SURVEY §2.8).

    Example (PageRank)::

        ranks = (
            Pregel(edges, vertices)
            .with_vertex_column("rank", F.lit(1.0),
                F.lit(0.15) + F.lit(0.85) * F.coalesce(msg(), F.lit(0.0)))
            .send_msg_to_dst(src("rank") / src("out_degree"))
            .agg_msgs(F.sum(msg()))
            .run(max_iter=3)
        )

    ``vertices`` must carry an ``id`` column; extra columns are static
    vertex attributes visible to expressions.
    """

    edges: DataFrame
    vertices: DataFrame
    _cols: list[tuple[str, Column, Column]] = field(default_factory=list)
    _to_dst: Column | None = None
    _to_src: Column | None = None
    _agg: Column | None = None
    _active_expr: Column | None = None
    _initial_active: Column | None = None

    def with_vertex_column(
        self, name: str, initial: Column, update: Column
    ) -> "Pregel":
        """Declare a mutable vertex-state column (initial expr, per-superstep
        update expr; update may reference ``msg()`` and any vertex column)."""
        self._cols.append((name, initial, update))
        return self

    def send_msg_to_dst(self, expr: Column) -> "Pregel":
        self._to_dst = expr
        return self

    def send_msg_to_src(self, expr: Column) -> "Pregel":
        self._to_src = expr
        return self

    def agg_msgs(self, agg: Column) -> "Pregel":
        self._agg = agg.alias(MSG_COL)
        return self

    def with_frontier(
        self, active_after_update: Column, initially_active: Column | None = None
    ) -> "Pregel":
        """Enable selective scheduling (C4): only edges whose source was
        active last superstep produce messages; terminate when the
        frontier empties. ``active_after_update`` is evaluated with the
        updated vertex columns in scope (and ``msg()``)."""
        self._active_expr = active_after_update
        self._initial_active = (
            initially_active if initially_active is not None else F.lit(True)
        )
        return self

    # ------------------------------------------------------------------ #
    def run(
        self,
        max_iter: int = 10,
        tol: float | None = None,
        tol_col: str | None = None,
        checkpoint_every: int = 1,
        on_iteration: Callable[[int, DataFrame], None] | None = None,
    ) -> DataFrame:
        """Execute the BSP loop; returns the final vertex DataFrame.

        - ``tol``/``tol_col``: convergence-delta tracking (C3,
          ``src/api/graphchi_context.hpp:101-105``): stop when
          sum(abs(new-old)) over ``tol_col`` < tol.
        - Frontier termination (C4): stop when no vertex is active.
        - ``checkpoint_every``: eager localCheckpoint cadence. The vertex
          state is referenced 2-3× per superstep, so the *logical plan*
          grows exponentially without truncation — checkpointing every
          superstep (default) keeps analysis cost constant; raise only
          for very cheap supersteps where cache()-only is acceptable.
        """
        if self._agg is None or not self._cols:
            raise ValueError("Pregel needs at least one vertex column and agg_msgs")
        if (tol is None) != (tol_col is None):
            raise ValueError(
                "tol and tol_col must be provided together (got "
                f"tol={tol!r}, tol_col={tol_col!r})"
            )
        need_src = self._to_dst is not None
        need_dst = self._to_src is not None

        static_cols = [c for c in self.vertices.columns if c != "id"]
        v = self.vertices.select(
            "id",
            *static_cols,
            *[init.alias(name) for name, init, _ in self._cols],
        )
        if self._active_expr is not None:
            v = v.withColumn(ACTIVE_COL, self._initial_active)
        v = v.localCheckpoint(eager=True)

        use_frontier = self._active_expr is not None
        for it in range(max_iter):
            msg_edges = self.edges
            msg_edges_to_src = None
            if use_frontier:
                frontier = v.filter(F.col(ACTIVE_COL)).select("id")
                # Messages flow only out of last-superstep-changed vertices.
                # The SENDER side depends on direction: to_dst messages are
                # sent by the src vertex, to_src messages by the dst vertex —
                # each direction gets its own sender-active edge set (one
                # shared either-endpoint set would let an inactive src
                # "send" whenever dst is active: harmless for idempotent
                # min/max, wrong for sum/count aggregates).
                if self._to_dst is not None and self._to_src is not None:
                    msg_edges = self.edges.join(
                        frontier.withColumnRenamed("id", "src"), "src", "left_semi"
                    )
                    msg_edges_to_src = self.edges.join(
                        frontier.withColumnRenamed("id", "dst"), "dst", "left_semi"
                    )
                elif self._to_src is not None:
                    msg_edges = self.edges.join(
                        frontier.withColumnRenamed("id", "dst"), "dst", "left_semi"
                    )
                else:
                    msg_edges = self.edges.join(
                        frontier.withColumnRenamed("id", "src"), "src", "left_semi"
                    )
            msgs = aggregate_messages(
                msg_edges,
                v,
                self._agg,
                to_dst=self._to_dst,
                to_src=self._to_src,
                need_src=need_src,
                need_dst=need_dst,
                edges_for_to_src=msg_edges_to_src,
            )
            joined = v.join(msgs, "id", "left").select(
                "*", *[upd.alias(f"_new_{name}") for name, _, upd in self._cols]
            )
            track_delta = tol is not None and tol_col is not None
            if track_delta:
                # cache the superstep once so delta agg + new_v share it
                joined = joined.cache()

            select_cols = ["id", *static_cols] + [
                F.col(f"_new_{name}").alias(name) for name, _, _ in self._cols
            ]
            if use_frontier:
                # active expr sees updated cols under their final names,
                # pre-update values as _old_<name>, and the message
                old_cols = [
                    F.col(name).alias(f"_old_{name}") for name, _, _ in self._cols
                ]
                new_v = (
                    joined.select(*select_cols, *old_cols, F.col(MSG_COL))
                    .withColumn(ACTIVE_COL, self._active_expr)
                    .drop(MSG_COL, *[f"_old_{name}" for name, _, _ in self._cols])
                )
            else:
                new_v = joined.select(*select_cols)

            if (it + 1) % checkpoint_every == 0:
                new_v = new_v.localCheckpoint(eager=True)
            else:
                new_v = new_v.cache()

            stop = False
            if use_frontier:
                if new_v.filter(F.col(ACTIVE_COL)).limit(1).count() == 0:
                    stop = True
            if track_delta:
                delta = joined.agg(
                    F.sum(F.abs(F.col(f"_new_{tol_col}") - F.col(tol_col))).alias("d")
                ).collect()[0]["d"]
                joined.unpersist()
                if delta is not None and delta < tol:
                    stop = True
            if on_iteration is not None:
                on_iteration(it, new_v)
            v.unpersist()
            v = new_v
            if stop:
                break

        if use_frontier:
            v = v.drop(ACTIVE_COL)
        return v
