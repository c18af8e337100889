"""Triangle counting (G8) — oriented adjacency join-intersection.

Reference: ``example_apps/trianglecounting.cpp:288`` (pivot-batch sorted
adjacency intersection, binary search ``:104-122``), with a degree-ordered
relabel prerequisite (S11, ``src/preprocessing/util/orderbydegree.hpp``)
so high-degree vertices appear late and intersections stay small.

Spark-first: a triangle (a<b<c) is one row of
    E(a,b) ⋈ E(b,c) ⋈ E(a,c)
on edges oriented low→high. The reference's pivot batching + intersection
is exactly a sort-merge/hash join — Catalyst picks the physical strategy
and AQE splits skewed build sides.

Orientation: GraphChi orients by degree rank (halves the worst-case work
on power-law graphs); the relational plan's cost is driven by the number
of wedges. ``orient="degree"`` reproduces that optimization — each
undirected edge points from the (degree, id)-smaller endpoint to the
larger, bounding per-source fanout by O(sqrt(E)) — while ``orient="id"``
keeps plain id order (deterministic, oracle-friendly; identical counts).

Scale note: two shuffle joins on (src)/(src,dst); the wedge table
E⋈E is the intermediate — at 100 TB pre-bucket the oriented edge table
by src so the wedge join co-locates, and let AQE skew-split hub sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph
from graphchi_cpp_spark.operators.dedup import _materialize_postings


def _oriented_edges(graph: PropertyGraph, orient: str) -> DataFrame:
    """Undirected edge set oriented small→large endpoint.

    Canonicalization is least/greatest + ONE distinct over |E| rows —
    the former symmetrize-then-distinct shuffled 2|E| rows to produce
    the same canonical set (each undirected edge appeared as both
    orientations before dedup), and undirected degrees come from
    exploding the canonical edge's two endpoints instead of counting
    the symmetric table (identical counts, half the aggregate input)."""
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    canon = e.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    if orient == "id":
        # single downstream consumer (triangles() materializes) — lazy
        return canon
    if orient == "degree":
        # eager materialization, not cache: the degree calc and the
        # orientation consume canon in PARALLEL stages of one job — an
        # unpopulated cache gets computed twice (measured 13s -> ~28s
        # with lazy cache on the r7 shape). Default localCheckpoint;
        # with SPARK_GRAFT_MATERIALIZE=disk the table goes to scratch
        # parquet instead of block-manager blocks (see operators.dedup).
        canon = _materialize_postings(canon, "tri_canon")
        # degree-rank relabel (S11): orient each canonical edge by
        # (degree, id) lexicographic — one row per undirected edge
        deg = (
            canon.select(F.explode(F.array("src", "dst")).alias("id"))
            .groupBy("id")
            .agg(F.count("*").alias("d"))
        )
        u = canon.join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "sd"), "src")
        u = u.join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dd"), "dst")
        keep = (F.col("sd") < F.col("dd")) | (
            (F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst"))
        )
        fwd = u.filter(keep).select("src", "dst")
        rev = u.filter(~keep).select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        return fwd.unionByName(rev)
    raise ValueError(f"unknown orient {orient!r}")


BROADCAST_EDGE_LIMIT = 5_000_000


def triangles(
    graph: PropertyGraph, orient: str = "id", oriented: DataFrame | None = None
) -> DataFrame:
    """All triangles as rows (a, b, c) with a<b<c in orientation order.

    Join strategy: checkpointed inputs lose size stats, so Catalyst would
    pick sort-merge joins; when the oriented edge set fits comfortably in
    memory we hint broadcast — the whole enumeration then runs as one
    shuffle-free codegen stage (the relational analog of GraphChi's
    pivot-batch in-memory adjacency, ``trianglecounting.cpp:91``). Above
    the limit: shuffle joins on b / (a,c), AQE skew-splitting hubs.

    ``oriented``: an already-MATERIALIZED oriented edge table to reuse
    (``triangle_count``'s join fallback passes its own — rebuilding the
    orientation from scratch here held a third |E|-row block table live
    and re-ran the degree joins, the heap-OOM observed at 100M edges).
    """
    if oriented is None:
        oriented = _materialize_postings(
            _oriented_edges(graph, orient), "tri_oriented"
        )
    n = oriented.count()
    small = n <= BROADCAST_EDGE_LIMIT
    if small:
        # Re-materialize GLOBALLY SORTED by (src, dst): the broadcast
        # hash relations for e2/e3 are built in ascending key order and
        # the wedge stream probes them in (near-)ascending order, which
        # turns the second join's ~|wedges| random probes into
        # sequential memory walks. Measured on the sf0.1 cosupply graph
        # (complete K1000, 166M wedges): 14s vs 24-40s for the identical
        # plan over an unsorted layout — plan shape unchanged, only the
        # physical row order. One ≤5M-row range exchange over blocks.
        e = _materialize_postings(
            oriented.orderBy("src", "dst"), "tri_oriented_sorted"
        )
    else:
        # Above the broadcast limit the joins are sort-merge: each join
        # re-sorts by its own key, so a global (src, dst) sort + second
        # |E|-row materialization bought nothing and doubled the block
        # footprint at exactly the scale where memory is tightest.
        e = oriented
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    if small:
        e2, e3 = F.broadcast(e2), F.broadcast(e3)
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


import os as _os

# Dense-mode guard: the adjacency-bitmap plan materializes ≤ (vmax+1)
# vertex bitmaps of ceil((vmax+1)/64) words — roughly vmax²/8 bytes,
# broadcast to every executor. 64 MB default cap ≈ vmax ≤ ~23k.
DENSE_BITMAP_MAX_BYTES = int(
    _os.environ.get("SPARK_GRAFT_TRI_DENSE_MAX_BYTES", 64 * 1024 * 1024)
)


def triangle_count(graph: PropertyGraph, orient: str = "degree"):
    """Global triangle count (scalar DataFrame with column n_triangles).

    Dense small-id graphs take the adjacency-BITMAP plan: per source, a
    fixed-width bitset over out-neighbors (built with one explode + a
    bit_or aggregation), broadcast; the count is then
    Σ_{(a,b)∈E} popcount(bits(a) AND bits(b)) — a per-edge zip_with of
    ~vmax/64 words instead of enumerating every wedge through a second
    hash join. On the sf0.1 co-supply graph (K1000, 166M wedges) this
    replaces ~13s of hash probes with ~8M word-AND+popcounts (the
    GraphChi in-memory adjacency intersection, vectorized as bitsets).
    Identical count by construction: common oriented out-neighbors of
    (a, b) are exactly the triangles with base (a, b). Graphs whose max
    vertex id would need more than ``SPARK_GRAFT_TRI_DENSE_MAX_BYTES``
    of bitmaps (sparse or large id spaces) keep the join plan.
    """
    e = _materialize_postings(_oriented_edges(graph, orient), "tri_cnt_oriented")
    bounds = e.agg(
        F.max(F.greatest("src", "dst")).alias("m"),
        F.min(F.least("src", "dst")).alias("lo"),
    ).collect()[0]
    vmax = int(bounds["m"]) if bounds["m"] is not None else -1
    vmin = int(bounds["lo"]) if bounds["lo"] is not None else 0
    nwords = (vmax + 64) // 64 if vmax >= 0 else 0
    if (
        vmax < 0
        or vmin < 0  # bit positions need non-negative ids
        or (vmax + 1) * nwords * 8 > DENSE_BITMAP_MAX_BYTES
    ):
        # sparse / huge-id fallback: the enumeration join plan, REUSING
        # the oriented table materialized above (it was rebuilt from
        # graph.edges before — degree joins re-run + a third |E|-row
        # block table held live; heap-OOM at 100M edges on 16g)
        return triangles(graph, orient, oriented=e).agg(
            F.count("*").alias("n_triangles")
        )
    words = e.select(
        "src",
        F.shiftright(F.col("dst"), 6).alias("w"),
        # F.shiftleft only takes a literal shift — the SQL form accepts
        # an expression for the per-row bit position
        F.expr("shiftleft(cast(1 as bigint), cast(dst & 63 as int))").alias("b"),
    ).groupBy("src", "w").agg(F.bit_or("b").alias("v"))
    bits = words.groupBy("src").agg(
        F.map_from_entries(F.collect_list(F.struct("w", "v"))).alias("m")
    ).select(
        "src",
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(nwords - 1).cast("long")),
            lambda w: F.coalesce(F.col("m")[w], F.lit(0).cast("long")),
        ).alias("bits"),
    )
    ba = F.broadcast(bits.select(F.col("src").alias("a"), F.col("bits").alias("ba")))
    bb = F.broadcast(bits.select(F.col("src").alias("b"), F.col("bits").alias("bb")))
    common = F.aggregate(
        F.zip_with("ba", "bb", lambda x, y: F.bit_count(x.bitwiseAND(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(ba, "a")
        .join(bb, "b")
        # coalesce: when no oriented edge's dst has out-neighbors (e.g. a
        # star graph) the bb join drops every row and sum() yields NULL —
        # the join-plan fallback returns 0 for the same graph
        .agg(
            F.coalesce(F.sum(common), F.lit(0))
            .cast("long")
            .alias("n_triangles")
        )
    )


def triangles_per_vertex(graph: PropertyGraph, orient: str = "id") -> DataFrame:
    """(id, triangles) — each triangle credited to all three corners,
    matching the reference's per-vertex counts written to the vertex file."""
    t = triangles(graph, orient)
    ids = t.select(F.explode(F.array("a", "b", "c")).alias("id"))
    return ids.groupBy("id").agg(F.count("*").alias("triangles"))


def triangles_per_vertex_sql(oriented_edges_sql: str) -> str:
    """DuckDB oracle for orient='id' per-vertex counts.

    ``oriented_edges_sql`` must yield (src, dst) with src < dst.
    """
    return f"""
        WITH e AS ({oriented_edges_sql}),
        tri AS (
            SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
            FROM e e1
            JOIN e e2 ON e2.src = e1.dst
            JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        ),
        corners AS (
            SELECT a AS id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT id, count(*) AS triangles FROM corners GROUP BY id
    """
