"""Evaluation harness (M14 + RMSE engines).

Reference:
- ``toolkits/collaborative_filtering/metric_eval.cpp:117`` — AP@K / MAP@K
  over ranked recommendation lists vs held-out truth pairs.
- ``toolkits/collaborative_filtering/rmse_engine.hpp:44,112`` — validation
  RMSE computed by a second engine pass per iteration; ``rmse.hpp``.

AP@K semantics (matching the reference / standard definition):
    AP@K(u) = (Σ_{j=1..K} rel(j) · precision@j) / min(K, |truth(u)|)
MAP@K = mean over users with nonempty truth.

All window + groupBy relational — SQL-expressible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rmse(predictions: DataFrame, label_col: str = "rating", pred_col: str = "prediction") -> DataFrame:
    """One-row (rmse) over a predictions DataFrame."""
    return predictions.agg(
        F.sqrt(F.avg(F.pow(F.col(label_col) - F.col(pred_col), 2))).alias("rmse")
    )


def average_precision_at_k(
    recs: DataFrame, truth: DataFrame, k: int
) -> DataFrame:
    """(user, ap) — AP@K per user.

    ``recs``: (user, item, rank) with rank 1-based; ``truth``: (user, item).
    Users present in recs but with no truth rows are dropped (reference
    skips them in the mean).
    """
    r = recs.filter(F.col("rank") <= k).alias("r")
    t = truth.select("user", "item").distinct().alias("t")
    marked = r.join(
        t, (F.col("r.user") == F.col("t.user")) & (F.col("r.item") == F.col("t.item")), "left"
    ).select(
        F.col("r.user").alias("user"),
        F.col("r.rank").alias("rank"),
        F.col("t.item").isNotNull().cast("int").alias("rel"),
    )
    w = Window.partitionBy("user").orderBy("rank")
    prec = marked.withColumn(
        "cum_rel", F.sum("rel").over(w)
    ).withColumn("prec_at_j", F.col("cum_rel") / F.col("rank"))
    truth_sizes = t.groupBy(F.col("user").alias("user")).agg(
        F.count("*").alias("n_truth")
    )
    ap = (
        prec.groupBy("user")
        .agg(F.sum(F.col("rel") * F.col("prec_at_j")).alias("ap_num"))
        .join(truth_sizes, "user")
        .select(
            "user",
            (F.col("ap_num") / F.least(F.lit(k), F.col("n_truth"))).alias("ap"),
        )
    )
    return ap


def mean_average_precision(recs: DataFrame, truth: DataFrame, k: int) -> DataFrame:
    """One-row (map) — MAP@K."""
    return average_precision_at_k(recs, truth, k).agg(
        F.avg("ap").alias("map")
    )


def ap_at_k_sql(recs_sql: str, truth_sql: str, k: int) -> str:
    """DuckDB oracle for average_precision_at_k."""
    return f"""
        WITH recs AS ({recs_sql}),
        truth AS (SELECT DISTINCT "user", item FROM ({truth_sql})),
        marked AS (
            SELECT r."user", r.rank,
                   CASE WHEN t.item IS NOT NULL THEN 1 ELSE 0 END AS rel
            FROM recs r
            LEFT JOIN truth t ON t."user" = r."user" AND t.item = r.item
            WHERE r.rank <= {k}
        ),
        prec AS (
            SELECT "user", rank, rel,
                   sum(rel) OVER (PARTITION BY "user" ORDER BY rank)
                   * 1.0 / rank AS prec_at_j
            FROM marked
        ),
        ts AS (SELECT "user", count(*) AS n_truth FROM truth GROUP BY "user")
        SELECT p."user",
               sum(p.rel * p.prec_at_j) / least({k}, any_value(ts.n_truth)) AS ap
        FROM prec p JOIN ts ON ts."user" = p."user"
        GROUP BY p."user"
    """
