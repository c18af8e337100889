"""Streaming / dynamic graph engine (X1-X4, C8-C9).

Reference: ``src/engine/dynamic_graphs/graphchi_dynamicgraph_engine.hpp``
— ``add_edge`` buffers edges in (dst-shard × src-shard) buffers (``:289-
329``), buffered edges are visible to computation before durable commit
(``incorporate_buffered_edges`` ``:340+``), shards are rewritten/compacted
when buffers grow or >10-20% of edges are deleted (``commit_graph_changes``
``:540-620``); deletions are tombstone edge values (``src/api/
graph_objects.hpp:96-142``). ``example_apps/streaming_pagerank.cpp`` feeds
edges from a thread while PageRank re-runs (``:231-298``), i.e. warm-
started recomputation over base ∪ buffer.

Spark-first mapping:
- DynamicGraph: a base parquet table + an in-memory micro-batch buffer
  (X2 visibility = base.unionByName(buffer) minus tombstones).
- ingest_batch: append adds/deletes (op column: 'add'/'delete' —
  tombstone analog).
- compact(): rewrite base applying buffered adds/deletes when the buffer
  or deleted fraction crosses the reference's thresholds (X3).
- run_streaming_pagerank: foreachBatch-style loop — per batch, merge then
  k supersteps warm-started from the previous ranks (X4).
- With Structured Streaming, ``readStream ... foreachBatch(lambda df, id:
  dg.ingest_batch(df))`` plugs the same object into a real stream;
  backpressure = maxFilesPerTrigger (X1). The driver-testable path uses
  explicit batch DataFrames (same code path foreachBatch would call).

Scale: buffer stays small between compactions; compaction is one
partitioned parquet rewrite (the reference's shard rewrite); PageRank
warm start cuts supersteps per batch from ~30 to ~3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph


class DynamicGraph:
    """Mutable edge table = immutable base + add/delete buffer."""

    def __init__(self, base_edges: DataFrame, base_path: str | None = None):
        self.base = base_edges.select("src", "dst").localCheckpoint(eager=True)
        self.base_path = base_path
        self.buffer: DataFrame | None = None  # (src, dst, op)
        self.base_count = self.base.count()
        self._buffer_stats: tuple[int, int] | None = None  # (n_buf, n_del)

    def ingest_batch(self, batch: DataFrame) -> None:
        """X1/C9: append a micro-batch of (src, dst, op['add'|'delete'])."""
        b = batch.select(
            "src", "dst", F.coalesce(F.col("op"), F.lit("add")).alias("op")
        )
        self.buffer = (
            b if self.buffer is None else self.buffer.unionByName(b)
        ).localCheckpoint(eager=True)
        self._buffer_stats = None

    def buffer_stats(self) -> tuple[int, int]:
        """(buffered rows, buffered deletes) in ONE aggregation job over
        the checkpointed buffer (was two separate counts); memoized until
        the next ingest/compact so threshold checks and size hints share
        the same job."""
        if self.buffer is None:
            return (0, 0)
        if self._buffer_stats is None:
            row = self.buffer.agg(
                F.count("*").alias("n"),
                F.sum((F.col("op") == "delete").cast("long")).alias("d"),
            ).collect()[0]
            self._buffer_stats = (int(row["n"]), int(row["d"] or 0))
        return self._buffer_stats

    def edges(self) -> DataFrame:
        """X2: computation-visible edge set = base ∪ buffered adds,
        minus buffered deletes (tombstone anti-join, C8)."""
        e = self.base
        if self.buffer is None:
            return e
        adds = self.buffer.filter(F.col("op") == "add").select("src", "dst")
        dels = self.buffer.filter(F.col("op") == "delete").select("src", "dst")
        return (
            e.unionByName(adds)
            .dropDuplicates(["src", "dst"])
            .join(dels, ["src", "dst"], "left_anti")
        )

    def should_compact(
        self, buffer_ratio: float = 0.2, deleted_ratio: float = 0.1
    ) -> bool:
        """X3 thresholds (reference: buffers big, or ~10-20% deleted)."""
        if self.buffer is None:
            return False
        n_buf, n_del = self.buffer_stats()
        base = max(self.base_count, 1)
        return n_buf > buffer_ratio * base or n_del > deleted_ratio * base

    def compact(self) -> None:
        """X3: fold the buffer into a rewritten base (reference shard
        rewrite; optionally persisted to parquet when base_path set)."""
        merged = self.edges().localCheckpoint(eager=True)
        if self.base_path is not None:
            merged.write.mode("overwrite").parquet(self.base_path)
            # the parquet rewrite IS the materialization; reading it back
            # needs no second checkpoint
            merged = merged.sparkSession.read.parquet(self.base_path)
        # merged is already materialized either way — a second eager
        # checkpoint of the same rows was one full extra job per compact
        self.base = merged
        self.buffer = None
        self._buffer_stats = None
        self.base_count = self.base.count()

    def graph(self) -> PropertyGraph:
        return PropertyGraph.from_edges(self.edges())


def run_streaming_pagerank(
    dg: DynamicGraph,
    batches: list[DataFrame],
    supersteps_per_batch: int = 3,
    auto_compact: bool = True,
) -> DataFrame:
    """X4: per batch — merge, then ``supersteps_per_batch`` PageRank
    supersteps warm-started from the previous ranks. Returns final
    (id, rank). Matches batch PageRank at the same total superstep count
    on the final graph ONLY in the limit; the streaming trace is the
    reference's evolving-graph semantics."""
    import os as _os

    from graphchi_cpp_spark.algos.pagerank import BCAST_MAX_VERTS, DAMPING, RESET
    from graphchi_cpp_spark.checkpoints import CheckpointJanitor

    from graphchi_cpp_spark.partitioning import adaptive_partitions

    spark = dg.base.sparkSession
    jan = CheckpointJanitor(spark)
    # The pagerank broadcast-contrib plan trades O(|E|) shuffled rows per
    # superstep for a fixed per-superstep overhead (broadcast build +
    # distribute + an extra job). That trade only pays past a few million
    # edges — below the threshold the simple per-superstep join plan is
    # strictly faster (measured at sf0.1, ~40k edges: 5.8s vs 13.1s for
    # the broadcast plan), so the mode is chosen from the already-known
    # ingested edge count, no extra job.
    bcast_min_edges = int(
        _os.environ.get("SPARK_GRAFT_STREAM_PR_BCAST_MIN_EDGES", 5_000_000)
    )
    ranks: DataFrame | None = None
    for batch in batches:
        dg.ingest_batch(batch)
        if auto_compact and dg.should_compact():
            dg.compact()
        g = dg.graph()
        # memoized single-job stats (shared with should_compact above)
        n_edges_hint = dg.base_count + dg.buffer_stats()[0]
        use_bcast = n_edges_hint >= bcast_min_edges
        if use_bcast:
            # data-derived partition count for this batch's edge cache
            # (guide §2) — the ingested-edge counter is already
            # maintained, so no extra job; conf cap binds at scale
            p = adaptive_partitions(spark, n_edges_hint)
            # edges dst-partitioned + cached once per batch, contributions
            # broadcast — zero |E|-row shuffles per superstep under the
            # vertex row cap (algos/pagerank.py), shuffle fallback above
            edges = g.edges.select("src", "dst").repartition(p, "dst").cache()
            # populate NOW: the degree agg and the vertex derivation read
            # edges in parallel subtrees of one job — an unpopulated cache
            # would execute the DynamicGraph merge lineage once per consumer
            edges.count()
        else:
            edges = g.edges.select("src", "dst").localCheckpoint(eager=True)
        out_deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").cast("double").alias("outdeg")
        )
        v = (
            PropertyGraph(edges).vertices.select("id")
            .join(out_deg, "id", "left")
            .select("id", F.coalesce("outdeg", F.lit(0.0)).alias("outdeg"))
        )
        if ranks is None:
            v = v.withColumn("rank", F.lit(1.0))
        else:  # warm start: carry previous ranks, new vertices start at 1
            v = v.join(ranks, "id", "left").select(
                "id", "outdeg", F.coalesce("rank", F.lit(1.0)).alias("rank")
            )
        v = jan.checkpoint(v.repartition(p, "id") if use_bcast else v)
        bcast = use_bcast and v.count() <= BCAST_MAX_VERTS
        for step in range(supersteps_per_batch):
            contrib = v.select(
                F.col("id").alias("src"),
                F.try_divide(F.col("rank"), F.col("outdeg")).alias("m"),
            )
            if bcast:
                contrib = F.broadcast(contrib)
            msgs = (
                edges.join(contrib, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("m").alias("s"))
            )
            nv = v.join(msgs, "id", "left").select(
                "id",
                "outdeg",
                (F.lit(RESET) + F.lit(DAMPING) * F.coalesce("s", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            # broadcast mode NEEDS an eager cut per superstep (the
            # contrib broadcast re-executes the full uncut lineage —
            # algos/pagerank.py). The small-graph join mode chains
            # supersteps LAZILY like _pagerank_shuffle's fixed-iteration
            # path: duplicated v-subtrees share shuffle map stages, so
            # the batch's supersteps collapse into the ONE ranks-
            # checkpoint job below (was one eager job per superstep —
            # pure per-job overhead at micro-batch scale). The chain is
            # CUT every 3 supersteps: v appears twice per step (contrib
            # + the outer join), so an uncut chain doubles the logical
            # plan per step — 2^k subtrees stalls the PLANNER for large
            # k (observed: supersteps_per_batch=30 never finished
            # analysis). A cut every 3 bounds planning at 8 v-subtrees
            # while keeping the common 3-superstep batch a single job.
            if bcast or (step + 1) % 3 == 0 and step + 1 < supersteps_per_batch:
                v = jan.checkpoint(nv)
            else:
                v = nv
        ranks = v.select("id", "rank").localCheckpoint(eager=True)
        if use_bcast:
            edges.unpersist()
    return ranks


def streaming_pagerank_sql(
    stage_edges_sqls: list[str],
    supersteps_per_batch: int = 3,
    ndigits: int = 4,
) -> str:
    """DuckDB oracle for ``run_streaming_pagerank``: per batch stage s the
    visible edge set is ``stage_edges_sqls[s]`` (the caller encodes the
    cumulative base ∪ batches union, deduped); each stage runs
    ``supersteps_per_batch`` power-iteration steps warm-started from the
    previous stage's ranks (new vertices start at 1.0)."""
    ctes = []
    n = len(stage_edges_sqls)
    for s, esql in enumerate(stage_edges_sqls, start=1):
        ctes += [
            f"e{s} AS MATERIALIZED ({esql})",
            f"v{s} AS MATERIALIZED (SELECT DISTINCT src AS id FROM e{s} "
            f"UNION SELECT dst FROM e{s})",
            f"od{s} AS MATERIALIZED (SELECT src AS id, "
            f"CAST(count(*) AS DOUBLE) AS od FROM e{s} GROUP BY 1)",
        ]
        if s == 1:
            ctes.append(f"r1_0 AS MATERIALIZED (SELECT id, 1.0 AS rank FROM v1)")
        else:
            ctes.append(
                f"""r{s}_0 AS MATERIALIZED (
                  SELECT v.id, coalesce(p.rank, 1.0) AS rank
                  FROM v{s} v
                  LEFT JOIN r{s - 1}_{supersteps_per_batch} p ON p.id = v.id
                )"""
            )
        for i in range(1, supersteps_per_batch + 1):
            ctes.append(
                f"""r{s}_{i} AS MATERIALIZED (
                  SELECT v.id, 0.15 + 0.85 * coalesce(m.s, 0.0) AS rank
                  FROM v{s} v LEFT JOIN (
                    SELECT e.dst AS id, sum(r.rank / o.od) AS s
                    FROM e{s} e
                    JOIN r{s}_{i - 1} r ON r.id = e.src
                    JOIN od{s} o ON o.id = e.src
                    GROUP BY e.dst
                  ) m ON m.id = v.id
                )"""
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, round(rank, {ndigits}) AS rank "
        f"FROM r{n}_{supersteps_per_batch}"
    )
