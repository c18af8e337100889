"""Property graph held as vertex/edge DataFrames.

Reference data model (SURVEY.md §1): GraphChi stores a directed graph as P
dst-interval shards of in-edges sorted by src (``src/preprocessing/
sharder.hpp:938-1046``), a flat vertex-value file (``src/engine/auxdata/
vertex_data.hpp``) and a degree table (``src/engine/auxdata/
degree_data.hpp:45-51``). Here the graph is two DataFrames:

- ``edges``:    (src: long, dst: long, [value columns...])
- ``vertices``: (id: long,  [value columns...])

Partitioning replaces sharding: ``partition_by_dst()`` hash-partitions the
edge table on dst so every per-superstep ``groupBy(dst)`` message
aggregation reuses the same exchange (Catalyst recognizes the existing
hash partitioning and elides the shuffle), the relational analog of
GraphChi's "all in-edges of an interval live in one shard".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SRC = "src"
DST = "dst"
ID = "id"


class PropertyGraph:
    """A directed property graph over Spark DataFrames.

    GraphChi requires dense uint32 vertex ids (``src/preprocessing/
    sharder.hpp:445``); we accept arbitrary long ids and provide
    :meth:`densify_ids` for algorithms (or sinks) that want dense ranges.
    """

    def __init__(self, edges: DataFrame, vertices: DataFrame | None = None):
        if SRC not in edges.columns or DST not in edges.columns:
            raise ValueError(f"edges must have '{SRC}' and '{DST}' columns")
        self.edges = edges
        self._vertices = vertices

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    @classmethod
    def from_edges(
        cls, edges: DataFrame, drop_self_loops: bool = True, dedupe: bool = False
    ) -> "PropertyGraph":
        """Build a graph from an edge DataFrame.

        The reference's edge-list parser drops self-edges
        (``src/preprocessing/conversions.hpp:260``); duplicate handling is
        optional there (S10, ``src/preprocessing/sharder.hpp:77-80``).
        """
        if drop_self_loops:
            edges = edges.filter(F.col(SRC) != F.col(DST))
        if dedupe:
            edges = edges.dropDuplicates([SRC, DST])
        return cls(edges)

    @property
    def vertices(self) -> DataFrame:
        """Vertex id set: explicit table if given, else derived src ∪ dst.

        Scale note: the derived form is a distinct over 2|E| rows — one
        shuffle, executed once and cached by callers that loop.
        """
        if self._vertices is not None:
            return self._vertices
        e = self.edges
        return (
            e.select(F.col(SRC).alias(ID))
            .unionByName(e.select(F.col(DST).alias(ID)))
            .distinct()
        )

    def with_vertices(self, vertices: DataFrame) -> "PropertyGraph":
        return PropertyGraph(self.edges, vertices)

    # ------------------------------------------------------------------ #
    # degrees (reference: degree_data.hpp; written by sharder :996-1046)
    # ------------------------------------------------------------------ #
    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col(SRC).alias(ID)).agg(
            F.count("*").alias("out_degree")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col(DST).alias(ID)).agg(
            F.count("*").alias("in_degree")
        )

    def degrees(self) -> DataFrame:
        """(id, in_degree, out_degree, degree) — full outer of the two counts."""
        ind, outd = self.in_degrees(), self.out_degrees()
        return (
            ind.join(outd, ID, "full_outer")
            .select(
                ID,
                F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
                F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            )
            .withColumn("degree", F.col("in_degree") + F.col("out_degree"))
        )

    # ------------------------------------------------------------------ #
    # transforms
    # ------------------------------------------------------------------ #
    def symmetrize(self) -> "PropertyGraph":
        """Undirected view: edges ∪ reversed edges, deduped.

        Min-label algorithms (WCC G3, LPA G6) need messages to flow both
        ways; the reference achieves this by writing labels on both in-
        and out-edges (``example_apps/connectedcomponents.cpp:79-121``).
        """
        e = self.edges.select(SRC, DST)
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        return PropertyGraph(e.unionByName(rev).distinct(), self._vertices)

    def reverse(self) -> "PropertyGraph":
        """Reverse all edges (SCC backward phase)."""
        others = [c for c in self.edges.columns if c not in (SRC, DST)]
        return PropertyGraph(
            self.edges.select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST), *others
            ),
            self._vertices,
        )

    def densify_ids(self) -> tuple["PropertyGraph", DataFrame]:
        """Relabel vertices to dense 0..V-1 ids (S14).

        Reference analog: the consecutive-id parsers
        (``toolkits/parsers/consecutive_matrix_market.cpp``, ``ips2ids.cpp``)
        build string→dense-int maps. Spark-first: a global
        ``row_number() over (order by id)`` produces the mapping; the two
        relabel joins broadcast the mapping when small, shuffle-join
        otherwise. Returns (new_graph, mapping(id, dense_id)).

        Scale note: a single global window is a serial bottleneck at
        100 TB — for that regime use ``zipWithIndex``-free alternative:
        sort + monotonically allocated ranges. Here V is always ≪ E and
        the mapping fits comfortably in one stage.
        """
        from pyspark.sql import Window

        mapping = self.vertices.select(ID).withColumn(
            "dense_id",
            F.row_number().over(Window.orderBy(ID)).cast("long") - 1,
        )
        e = (
            self.edges.join(mapping.withColumnRenamed(ID, SRC), SRC)
            .withColumnRenamed("dense_id", "_src_d")
            .join(mapping.withColumnRenamed(ID, DST), DST)
            .withColumnRenamed("dense_id", "_dst_d")
        )
        others = [c for c in self.edges.columns if c not in (SRC, DST)]
        new_edges = e.select(
            F.col("_src_d").alias(SRC), F.col("_dst_d").alias(DST), *others
        )
        return PropertyGraph(new_edges), mapping

    def partition_by_dst(self, num_partitions: int | None = None) -> "PropertyGraph":
        """Hash-partition edges by dst — the sharding analog (S9).

        Pre-partitioning + cache means every superstep's groupBy(dst)
        reuses this exchange instead of reshuffling 100 TB per iteration.
        """
        e = (
            self.edges.repartition(num_partitions, DST)
            if num_partitions
            else self.edges.repartition(DST)
        )
        return PropertyGraph(e, self._vertices)

    def cache(self) -> "PropertyGraph":
        self.edges.cache()
        if self._vertices is not None:
            self._vertices.cache()
        return self


def chain_graph(spark, n: int) -> DataFrame:
    """Path graph 0→1→…→n−1 (reference ``graphgenerators.cpp`` 'chain')."""
    return spark.range(n - 1).select(
        F.col("id").alias(SRC), (F.col("id") + 1).alias(DST)
    )


def grid_graph(spark, n: int, cross: bool = False) -> DataFrame:
    """n×n grid, vertex id = y·n + x, edges right and down; ``cross``
    adds the diagonal (reference 'grid' / 'crossgrid'). Pure range
    expressions — no driver-side loops, scales to any n."""
    v = spark.range(n * n).select(
        F.col("id"), (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    right = v.filter(F.col("x") < n - 1).select(
        F.col("id").alias(SRC), (F.col("id") + 1).alias(DST)
    )
    down = v.filter(F.col("y") < n - 1).select(
        F.col("id").alias(SRC), (F.col("id") + n).alias(DST)
    )
    out = right.unionByName(down)
    if cross:
        diag = v.filter((F.col("x") < n - 1) & (F.col("y") < n - 1)).select(
            F.col("id").alias(SRC), (F.col("id") + n + 1).alias(DST)
        )
        out = out.unionByName(diag)
    return out


def erdos_renyi(spark, n: int, avg_degree: float, seed: int = 42) -> DataFrame:
    """Erdős–Rényi-ish random digraph (reference ``src/util/erdosrenyi.cpp:14-60``).

    G(n, p) sampled edge-by-edge is O(n²); at scale we instead draw
    round(avg_degree) targets per vertex with rand(seed) — same degree
    expectation, fully parallel, no crossJoin.
    """
    k = max(1, int(round(avg_degree)))
    return (
        spark.range(n)
        .select(
            F.col("id").alias(SRC),
            F.explode(
                F.array(*[(F.floor(F.rand(seed + i) * n)).cast("long") for i in range(k)])
            ).alias(DST),
        )
        .filter(F.col(SRC) != F.col(DST))
        .dropDuplicates([SRC, DST])
    )
