"""K-core decomposition (G9) — iterative peeling.

Reference: ``toolkits/graph_analytics/kcores.cpp:86`` — iteration k keeps
a vertex active iff its degree among active vertices exceeds k; a vertex's
core number is the k at which it is peeled.

Spark recipe: maintain (active vertices, remaining edges); for k = 1..,
repeatedly peel active vertices with remaining-degree <= k (a fixpoint per
k — removing a vertex drags neighbors' degrees down, possibly below the
threshold), recording core(v) = k at peel time. Vertices stranded with
zero remaining degree are peeled at the current k as well (their last
supporting neighbor was a k-peel).

Scale note: each peel step is one groupBy-degree + anti-joins, all
map-side-combinable; the edge table shrinks monotonically and is
re-checkpointed every round so lineage stays flat. For 100 TB graphs the
better algorithm is the h-index fixpoint (Montresor et al.) — one pregel
loop, no per-k inner loop; peeling is kept because it exactly matches the
reference's per-k semantics and the per-k loop count is bounded by the
degeneracy (small even for huge real graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph


def kcores(graph: PropertyGraph, max_k: int = 1_000_000) -> DataFrame:
    """Returns (id, core) for every vertex; isolated vertices → core 0."""
    spark = graph.edges.sparkSession
    e = graph.symmetrize().edges.select("src", "dst").localCheckpoint(eager=True)
    all_vertices = graph.vertices.select("id").localCheckpoint(eager=True)

    # vertices that start with no edges at all → core 0
    active = (
        all_vertices.join(
            e.select(F.col("src").alias("id")).distinct(), "id", "left_semi"
        )
        .localCheckpoint(eager=True)
    )
    peeled_parts: list[DataFrame] = []

    k = 0
    while k < max_k and active.limit(1).count() > 0:
        # jump k straight to the smallest remaining degree: on dense
        # graphs (e.g. a near-complete graph, min degree ~n) stepping
        # k by 1 would run hundreds of empty peel levels; the peel order
        # and core numbers are identical because no vertex has degree
        # between k and the minimum (standard degeneracy-order shortcut)
        mind = (
            e.groupBy("src").agg(F.count("*").alias("d")).agg(F.min("d")).collect()
        )[0][0]
        k = max(k + 1, int(mind) if mind is not None else k + 1)
        if k > max_k:
            break
        while True:
            deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
            doomed = (
                active.join(deg, "id", "left")
                .filter(F.coalesce("d", F.lit(0)) <= k)
                .select("id")
                .localCheckpoint(eager=True)
            )
            if doomed.limit(1).count() == 0:
                break
            peeled_parts.append(doomed.withColumn("core", F.lit(k)))
            active = active.join(doomed, "id", "left_anti").localCheckpoint(eager=True)
            e = (
                e.join(doomed.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(doomed.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )

    if peeled_parts:
        peeled = peeled_parts[0]
        for p in peeled_parts[1:]:
            peeled = peeled.unionByName(p)
    else:
        peeled = spark.createDataFrame([], "id long, core int")

    return all_vertices.join(peeled, "id", "left").select(
        "id", F.coalesce("core", F.lit(0)).cast("int").alias("core")
    )
