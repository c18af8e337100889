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
    """Undirected edge set oriented small→large endpoint."""
    e = graph.edges.select("src", "dst")
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # eager materialization, not cache: the degree calc and the
        # orientation consume und in PARALLEL stages of one job — an
        # unpopulated cache gets computed twice, and the downstream 3-way
        # self-join re-reads it three more times (measured 13s -> ~28s
        # with lazy cache). Default localCheckpoint; with
        # SPARK_GRAFT_MATERIALIZE=disk the 2|E|-row table goes to scratch
        # parquet instead of block-manager blocks — at 300M input edges
        # the und+oriented checkpoints (~900M block-manager rows) plus
        # live shuffle buffers exceed even an 80g single-JVM heap, while
        # a multi-executor cluster spreads the same blocks.
    )
    und = _materialize_postings(und, "tri_und")
    canon = und.filter(F.col("src") < F.col("dst"))
    if orient == "id":
        return canon
    if orient == "degree":
        # degree-rank relabel (S11): orient each canonical edge by
        # (degree, id) lexicographic — one row per undirected edge
        deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
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


def triangles(graph: PropertyGraph, orient: str = "id") -> DataFrame:
    """All triangles as rows (a, b, c) with a<b<c in orientation order.

    Join strategy: checkpointed inputs lose size stats, so Catalyst would
    pick sort-merge joins; when the oriented edge set fits comfortably in
    memory we hint broadcast — the whole enumeration then runs as one
    shuffle-free codegen stage (the relational analog of GraphChi's
    pivot-batch in-memory adjacency, ``trianglecounting.cpp:91``). Above
    the limit: shuffle joins on b / (a,c), AQE skew-splitting hubs.
    """
    e = _materialize_postings(_oriented_edges(graph, orient), "tri_oriented")
    small = e.count() <= BROADCAST_EDGE_LIMIT
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    if small:
        e2, e3 = F.broadcast(e2), F.broadcast(e3)
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def triangle_count(graph: PropertyGraph, orient: str = "degree"):
    """Global triangle count (scalar DataFrame with column n_triangles)."""
    return triangles(graph, orient).agg(F.count("*").alias("n_triangles"))


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
