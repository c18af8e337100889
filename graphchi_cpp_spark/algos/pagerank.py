"""PageRank (G1/G2) — power iteration, damping 0.85.

Reference: ``example_apps/pagerank.cpp:73-113`` (update function), functional
variants ``example_apps/pagerank_functional.cpp:48-103``. Semantics of the
reference update:

    rank(v) = RANDOMRESETPROB + (1 - RANDOMRESETPROB) * sum_{u->v} rank(u)/outdeg(u)

with RANDOMRESETPROB = 0.15. Dangling mass is NOT redistributed (the
reference broadcasts ``rank/outc`` only when outc > 0, pagerank.cpp:100) —
we match that exactly so results are oracle-comparable.

Two physical strategies, chosen by vertex count (``mode='auto'``):

- **broadcast** (|V| ≤ ``SPARK_GRAFT_PR_BCAST_MAX_VERTS``, default 50M):
  edges are hash-partitioned by ``dst`` and cached once; each superstep
  broadcasts the (src, rank/outdeg) contribution table (one (long,
  double) row per vertex) and the plan becomes

      msgs = edges ⋈_bcast contrib → groupBy(dst).sum   [NO exchange:
             edges are already dst-partitioned]
      ranks = v ⟕ msgs                                  [NO exchange:
             both hash-partitioned by id with the same partitioner]

  → ZERO shuffled rows per superstep. Measured at 100M edges/10M
  vertices on local[32]: 3.2× less task-CPU than the co-partitioned
  shuffle plan (479 vs 1544 task-seconds for 3 supersteps) and the
  run-to-run spread collapses (33.5/33.8/42.0s vs 25–158s), because the
  per-superstep 100M-row SMJ sort + partial-agg (1.5M-entry hash maps
  per task) + 1.2G shuffle are all gone — the superstep is one cache
  scan probing a shared read-only broadcast map into a dst-clustered
  final aggregation. Float caveat: per-dst summation order differs from
  the shuffle plan's, so ranks can differ at the 1e-15 level (both are
  valid IEEE sums; the oracle contract rounds to 4 digits).
- **shuffle** (above the threshold): the r4 co-partitioned plan — edges
  by src, vertex state by id, same partition count, one exchange per
  superstep (the message partial-aggregation). This is the 100 TB
  path: broadcasting |V| rows to every executor scales as
  |V|·n_executors network bytes per superstep (the GraphX lesson), so
  past ~50M vertices — or on memory-tight executors; lower the env —
  co-partitioned shuffle wins. At cluster scale the same layout comes
  from bucketing the edge table by src at write time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph

RESET = 0.15
DAMPING = 0.85

# Above this many vertices the per-superstep contribution broadcast
# (~64 bytes/row hashed-relation footprint, times one copy per executor)
# stops being cheaper than one shuffle of |V| message rows. Default is
# byte-derived from the session heap (partitioning.broadcast_row_cap:
# 16g local driver → 2 GiB budget → ~33M rows, which keeps the measured
# 30M-vertex/300M-edge broadcast path); tune DOWN for memory-tight
# executors via SPARK_GRAFT_PR_BCAST_MAX_VERTS or the budget env.
from graphchi_cpp_spark.partitioning import broadcast_row_cap as _brc

BCAST_MAX_VERTS = _brc(64, "SPARK_GRAFT_PR_BCAST_MAX_VERTS")


def pagerank(
    graph: PropertyGraph,
    max_iter: int = 3,
    tol: float | None = None,
    checkpoint_every: int = 4,
    mode: str = "auto",
) -> DataFrame:
    """Returns (id, rank). Fixed-iteration when tol is None (matches the
    reference's ``niters`` mode); convergence-delta early stop (C3) when
    tol is given. ``mode``: 'auto' (vertex-count threshold), 'broadcast',
    or 'shuffle' — see module docstring for the physical plans.
    """
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown pagerank mode {mode!r}")
    from graphchi_cpp_spark.partitioning import (
        adaptive_partitions,
        scoped_shuffle_partitions,
    )

    spark = graph.edges.sparkSession
    # data-derived partition count (guide §2); conf cap binds at scale
    p = adaptive_partitions(spark, graph.edges.count())
    with scoped_shuffle_partitions(spark, p):
        return _pagerank_modes(
            graph, spark, p, max_iter, tol, checkpoint_every, mode
        )


def _pagerank_modes(graph, spark, p, max_iter, tol, checkpoint_every, mode):
    if mode != "shuffle":
        # the broadcast plan wants dst-partitioned edges; build the
        # vertex state first so auto mode can count |V| (the count
        # doubles as the eager materialization both modes need anyway)
        edges = graph.edges.select("src", "dst").repartition(p, "dst").cache()
        g = PropertyGraph(edges)
        out_deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").cast("double").alias("outdeg")
        )
        v = (
            g.vertices.select("id")
            .join(out_deg, "id", "left")
            .select(
                "id",
                F.coalesce("outdeg", F.lit(0.0)).alias("outdeg"),
                F.lit(1.0).alias("rank"),
            )
            .repartition(p, "id")
            .cache()
        )
        n_verts = v.count()
        if mode == "broadcast" or n_verts <= BCAST_MAX_VERTS:
            return _pagerank_broadcast(
                spark, edges, v, p, max_iter=max_iter, tol=tol
            )
        # auto fell through to shuffle: drop the dst layout
        edges.unpersist()
        v.unpersist()

    return _pagerank_shuffle(
        spark, graph, p, max_iter=max_iter, tol=tol, checkpoint_every=checkpoint_every
    )


def _pagerank_broadcast(
    spark, edges: DataFrame, v: DataFrame, p: int, max_iter: int, tol: float | None
) -> DataFrame:
    """Zero-shuffle supersteps: broadcast contrib, dst-local aggregation,
    co-partitioned write-back. ``v`` arrives cached + materialized.

    Each superstep is materialized EAGERLY with localCheckpoint: the
    contrib broadcast and the write-back join both reference the
    previous state, so an uncut lineage doubles per superstep — the
    LOGICAL plan (and its explain string) grows 2^iters even though
    caches keep execution linear; on inputs that already carry deep
    lineage (e.g. a streamed/compacted DynamicGraph) plan analysis
    alone OOMs. The checkpoint costs one |V|-row exchange per superstep
    at the write-back join (checkpointed scans lose outputPartitioning)
    — still zero |E|-row shuffles, which is where the win lives.

    Each superstep's checkpoint blocks are freed explicitly once the
    next generation lands (CheckpointJanitor): DataFrame.unpersist does
    not release a checkpointed RDD, so long tol-mode runs would
    otherwise accrete ~|V| rows of storage per superstep until the
    driver's ContextCleaner got around to it.
    """
    from graphchi_cpp_spark.checkpoints import CheckpointJanitor

    jan = CheckpointJanitor(spark)
    for _ in range(max_iter):
        contrib = v.select(
            F.col("id").alias("src"),
            F.try_divide(F.col("rank"), F.col("outdeg")).alias("w"),
        )
        msgs = (
            edges.join(F.broadcast(contrib), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("w").alias("_s"))
        )
        nv = (
            v.join(msgs, "id", "left")
            .select(
                "id",
                "outdeg",
                (
                    F.lit(RESET) + F.lit(DAMPING) * F.coalesce("_s", F.lit(0.0))
                ).alias("rank"),
            )
        )
        nv = jan.checkpoint(nv)
        if tol is not None:
            delta = (
                nv.join(v.select("id", F.col("rank").alias("_old")), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
                .collect()[0]["d"]
            )
        v.unpersist()
        v = nv
        if tol is not None and delta is not None and delta < tol:
            break
    edges.unpersist()
    return v.select("id", "rank")


def _pagerank_shuffle(
    spark,
    graph: PropertyGraph,
    p: int,
    max_iter: int,
    tol: float | None,
    checkpoint_every: int,
) -> DataFrame:
    """PARTITION-REUSE shuffle plan: edges hash-partitioned by src and
    the vertex state by id with the SAME partition count, both cached
    (cache, not checkpoint: InMemoryRelation preserves
    outputPartitioning, a checkpointed RDD scan does not). The per-
    superstep gather join and the update join are then both
    co-partitioned, leaving exactly ONE exchange per superstep (the
    message partial-aggregation) — the relational equivalent of
    GraphChi's "in-edges of an interval live in one shard" layout, and
    ~2x faster than the naive plan at 10M edges.
    """
    edges = (
        graph.edges.select("src", "dst").repartition(p, "src").cache()
    )
    g = PropertyGraph(edges)
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("outdeg")
    )
    v = (
        g.vertices.select("id")
        .join(out_deg, "id", "left")
        .select(
            "id",
            F.coalesce("outdeg", F.lit(0.0)).alias("outdeg"),
            F.lit(1.0).alias("rank"),
        )
        .repartition(p, "id")
        .cache()
    )
    # caches stay lazy: the first action (delta collect in tol mode, the
    # final count otherwise) materializes edges+v once and reuses them
    lazy_states: list[DataFrame] = []  # supersteps deferred to one final job
    for it in range(max_iter):
        msgs = (
            edges.join(v.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.try_divide(F.col("rank"), F.col("outdeg"))).alias("_s"))
        )
        nv = v.join(msgs, "id", "left").select(
            "id",
            "outdeg",
            (
                F.lit(RESET) + F.lit(DAMPING) * F.coalesce("_s", F.lit(0.0))
            ).alias("rank"),
        )
        if tol is not None:
            nv = nv.cache()
            delta = (
                nv.join(v.select("id", F.col("rank").alias("_old")), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
                .collect()[0]["d"]
            )
            v.unpersist()
            v = nv
            if delta is not None and delta < tol:
                break
        else:
            # fixed-iteration mode: no per-superstep action — the chained
            # supersteps collapse into ONE job at the final materialization
            # (the duplicated subtrees share shuffle map stages, so unlike
            # the broadcast plan, lazy chaining does not re-execute work)
            lazy_states.append(v)
            v = nv
        if checkpoint_every > 0 and (it + 1) % checkpoint_every == 0:
            # lineage cut cadence, honored exactly as passed; the default
            # (4) trades a slightly deeper plan for fewer materializations
            v = v.localCheckpoint(eager=True).repartition(p, "id").cache()

    if tol is None:
        v = v.cache()
        v.count()  # one job runs the whole superstep chain
        for d in lazy_states:
            d.unpersist()
    edges.unpersist()
    return v.select("id", "rank")


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
