"""Weakly connected components (G3/G4/G14) — min-label propagation.

Reference: ``example_apps/connectedcomponents.cpp:79-121`` (label = min
neighbor label, iterate to fixpoint), toolkit twin
``toolkits/graph_analytics/connectedcomponents.cpp:79``, in-memory variants
``example_apps/inmemconncomps.cpp:80``. The union-find variant
(``example_apps/unionfind_connectedcomps.cpp:121``) is inherently
sequential; its distributed replacement here is the same min-label
fixpoint (identical output contract: (vertex, component=min id)).

Spark recipe: symmetrize edges once, then iterate
    msgs   = edges ⋈ labels(src) → groupBy(dst).agg(min(label))
    labels = labels ⟕ msgs → least(label, msg)
with FRONTIER filtering (C4): only vertices whose label changed last
superstep send messages — after the first few supersteps the frontier
collapses and each superstep touches a small fraction of E. This is the
reference's bitset scheduler (``src/engine/bitset_scheduler.hpp:38-110``)
expressed as a semi-join.

Scale notes: min is commutative → map-side partial agg bounds shuffle to
O(active vertices); symmetrized edge table cached once. For graphs with
giant diameter, use ``connected_components_star`` below — label
propagation is O(diameter) supersteps, the star contractions O(log² V).

Measured dead end (r4): per-round pointer jumping (label ← label(label)
via a V-row self-join on the label column) was 5× SLOWER at 10M edges
(94s vs 18s) — once the giant component forms, nearly every row carries
the same label, so the self-join has one massive hot key that AQE can't
split usefully (unique-keyed build side). Don't retry without a
skew-aware design (e.g. jump only the frontier's labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph

# Frontier size under which the gather join broadcasts the frontier
# instead of relying on co-partitioning + a partial-aggregated shuffle.
# 2M (id,label) rows ≈ a ~120MB hashed relation per executor — cheap
# against skipping a full shuffle round-trip; at 1000 executors the
# broadcast fan-out is the cost, so this is rows-based, not |E|-based.
import os as _os

BCAST_FRONTIER_MAX = int(
    _os.environ.get("SPARK_GRAFT_WCC_BCAST_MAX_FRONTIER", 2_000_000)
)


def connected_components(
    graph: PropertyGraph,
    max_iter: int = 50,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Returns (id, component) where component = min vertex id in the WCC.

    Physical strategy: partition reuse (see algos.pagerank) — symmetrized
    edges hash-partitioned by src, labels by id, both cached, so the
    frontier semi-join, gather join and update join are all
    co-partitioned: ONE exchange per superstep (the min-message partial
    aggregation). Lineage is cut (checkpoint + re-cache) every
    ``checkpoint_every`` supersteps; in between, cache() bounds
    recomputation while keeping partitioning info.

    Frontier broadcast (hybrid): once the previous superstep's change
    count drops under ``BCAST_FRONTIER_MAX`` rows, the frontier is
    broadcast into the gather join — the tail supersteps (most of them,
    on high-diameter graphs) then run with ZERO shuffled rows: scan the
    edge cache, probe a small shared map, aggregate dst-locally. Dense
    early supersteps keep the partial-aggregated shuffle plan, which
    amortizes better than broadcasting a |V|-row frontier (measured at
    100M edges: all-broadcast only beat all-shuffle by 15% because the
    first supersteps' frontier IS the vertex set). The exact change
    count is read from the already-materialized state cache — same scan
    the old limit(1) early-exit probe did, one number instead of one bit.
    """
    from graphchi_cpp_spark.checkpoints import CheckpointJanitor
    from graphchi_cpp_spark.partitioning import (
        adaptive_partitions,
        scoped_shuffle_partitions,
    )

    spark = graph.edges.sparkSession
    jan = CheckpointJanitor(spark)
    # partition count derived from the data (guide §2): |E| is one cheap
    # job against the (memoized/checkpointed) edge table; at cluster
    # scale the conf cap binds and p is unchanged
    n_edges = graph.edges.count()
    p = adaptive_partitions(spark, 2 * n_edges)
    with scoped_shuffle_partitions(spark, p):
        return _cc_loop(graph, spark, jan, p, max_iter, checkpoint_every)


def _cc_loop(graph, spark, jan, p, max_iter, checkpoint_every):
    e = graph.edges.select("src", "dst")
    # dedup AFTER the src-repartition: hashpartitioning(src) satisfies
    # the (src, dst) clustering the dedup aggregate needs, so the
    # symmetrized table pays ONE exchange instead of two (distinct's
    # (src,dst) shuffle followed by the src repartition) and the cache
    # still carries the src partitioning every superstep reuses
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(p, "src")
        .dropDuplicates(["src", "dst"])
        .cache()
    )
    v = (
        graph.vertices.select("id")
        .select("id", F.col("id").alias("label"), F.lit(True).alias("act"))
        .repartition(p, "id")
        .cache()
    )
    n_verts = v.count()
    n_active = n_verts  # superstep 0: everything is active

    for it in range(max_iter):
        if it == 0:
            # superstep 0: every vertex is active and label == id, so
            # the gather join degenerates to min(src) per dst — the
            # densest superstep loses its |E|-row join probe entirely
            # (the shuffle of partial-aggregated mins remains)
            msgs = edges.groupBy(F.col("dst").alias("id")).agg(
                F.min("src").alias("m")
            )
        else:
            frontier = v.filter("act").select(F.col("id").alias("src"), "label")
            if n_active <= BCAST_FRONTIER_MAX:
                frontier = F.broadcast(frontier)
            msgs = (
                edges.join(frontier, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("m"))
            )
        nv = (
            v.join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("m", F.col("label"))).alias(
                    "label"
                ),
                (F.coalesce("m", F.col("label") + 1) < F.col("label")).alias("act"),
            )
            .cache()
        )
        n_active = nv.filter("act").count()
        v.unpersist()
        v = nv
        if n_active == 0:
            break
        if (it + 1) % checkpoint_every == 0:
            # janitor: free the PREVIOUS checkpoint generation's blocks
            # (plain unpersist can't — see checkpoints.py), and unpersist
            # the pre-checkpoint state cache instead of leaking it until
            # driver GC: at 100M-edge scale those leaks are exactly the
            # block-manager pressure behind multi-x wall-time spread
            ck = jan.checkpoint(v)
            v.unpersist()
            v = ck.repartition(p, "id").cache()

    edges.unpersist()
    return v.select("id", F.col("label").alias("component"))


def connected_components_star(
    graph: PropertyGraph,
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star WCC (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14) — the skew-aware O(log² V)-round
    alternative to min-label propagation for HIGH-DIAMETER graphs, and
    the true logarithmic path for the union-find contract
    (``example_apps/unionfind_connectedcomps.cpp:121``): label
    propagation needs O(diameter) supersteps, these star contractions
    double the reach of every hop.

    Per round, on the current edge set E (invariant: src > dst after
    the first half-round):
      large-star: m(u) = min({u} ∪ N(u)); every neighbor v > u
                  re-links to m(u) — emit (v, m(u))
      small-star: m(u) = min of u's (all-smaller) neighbors; u and
                  each neighbor link to m — emit (u, m) ∪ (v, m)
    Fixpoint = rooted stars: every node's single out-edge points at its
    component minimum. Same output contract as ``connected_components``.

    Scale: both halves are ONE partial-aggregated groupBy(min) + one
    equi-join each; the giant-component hot key sits on the singleton
    build side of the join, which AQE's skew split handles (unlike the
    measured pointer-jumping dead end above, where the hot key carried
    the full V-row probe AND build fan-in)."""
    from graphchi_cpp_spark.partitioning import (
        adaptive_partitions,
        scoped_shuffle_partitions,
    )

    spark = graph.edges.sparkSession
    # data-derived partition count (guide §2); conf cap binds at scale
    p = adaptive_partitions(spark, 2 * graph.edges.count())
    with scoped_shuffle_partitions(spark, p):
        E = _star_rounds(graph, p, max_iter)
        # build AND materialize the final comp aggregation inside the
        # scope: the conf is read at execution time, so a merely-defined
        # plan would run its (often largest) exchanges at the session
        # conf once the caller materializes it — eager checkpoint here
        # pins them to the adaptive p like every round before them
        comp = (
            graph.vertices.select("id")
            .join(
                E.groupBy(F.col("src").alias("id")).agg(
                    F.min("dst").alias("_c")
                ),
                "id",
                "left",
            )
            .select("id", F.coalesce("_c", F.col("id")).alias("component"))
            .localCheckpoint(eager=True)
        )
    return comp


def _star_rounds(graph: PropertyGraph, p: int, max_iter: int) -> DataFrame:
    from graphchi_cpp_spark.checkpoints import CheckpointJanitor

    # lineage is cut EVERY round: E is referenced twice per round (self
    # + swap), so anything short of a checkpoint doubles the logical
    # plan per iteration (cache() bounds recomputation, not plan size)
    # janitor (r11): each round's signature/probe supersedes the previous
    # round's edge checkpoint — free those blocks deterministically
    # instead of letting them pile up until the driver's periodic GC
    # (observed: back-to-back 30M-edge runs degrading 49 -> 107s as dead
    # generations accumulate in the block manager)
    jan = CheckpointJanitor(graph.edges.sparkSession)
    E = jan.checkpoint(
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
    )
    prev_sig = None
    for it in range(max_iter):
        sym = E.unionByName(
            E.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # large-star: m = min over {u} ∪ N(u)
        mins = sym.groupBy("src").agg(
            F.least(F.col("src"), F.min("dst")).alias("m")
        )
        ls = (
            sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )
        # small-star on (src > dst)-oriented edges: m = min neighbor
        mins2 = ls.groupBy("src").agg(F.min("dst").alias("m"))
        nE = (
            ls.join(mins2, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(
                mins2.select("src", F.col("m").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .repartition(p, "src")
        )
        # lazy: the signature aggregation below references nE exactly
        # once and MATERIALIZES the checkpoint in the same job — the
        # eager variant paid a materialization job, then re-scanned
        # the same blocks for the signature (two jobs per round)
        nE = jan.checkpoint_lazy(nE)
        # fixpoint signature: count + modular hash sum (pmod keeps the
        # ANSI-mode sum far from long overflow at any edge count)
        sig = tuple(
            nE.agg(
                F.count("*"),
                F.sum(F.pmod(F.col("src"), F.lit(1_000_000_007))),
                F.sum(F.pmod(F.col("dst"), F.lit(1_000_000_007))),
                F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))),
            ).collect()[0]
        )
        # previous round's E is superseded now that the signature job
        # materialized nE — free its blocks
        jan.sweep()
        E = nE
        if sig == prev_sig:
            break
        prev_sig = sig
    return E


def component_sizes(components: DataFrame) -> DataFrame:
    """Label histogram C12/A5 (``src/util/labelanalysis.hpp:67-189``):
    component → size, descending."""
    return (
        components.groupBy("component")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), "component")
    )


def wcc_sql(edges_sql: str, vertices_sql: str | None = None) -> str:
    """DuckDB oracle: min-reachable-id via recursive CTE over the
    symmetrized graph. Component of v = min id reachable from v
    (undirected), identical to the label-propagation fixpoint.

    ``vertices_sql`` (yielding an ``id`` column) overrides the derived
    vertex set — needed when isolated vertices must appear as singleton
    components (e.g. after bond percolation)."""
    verts = (
        f"({vertices_sql})"
        if vertices_sql is not None
        else "(SELECT DISTINCT src AS id FROM sym UNION SELECT DISTINCT dst FROM sym)"
    )
    return f"""
        WITH RECURSIVE
        base_edges AS ({edges_sql}),
        sym AS (
            SELECT src, dst FROM base_edges
            UNION
            SELECT dst AS src, src AS dst FROM base_edges
        ),
        verts AS (SELECT id FROM {verts}),
        reach(id, r) AS (
            SELECT id, id AS r FROM verts
            UNION
            SELECT s.dst AS id, reach.r
            FROM reach JOIN sym s ON s.src = reach.id
        )
        SELECT id, min(r) AS component FROM reach GROUP BY id
    """
