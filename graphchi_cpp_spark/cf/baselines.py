"""Baseline predictors (M13) — global / user / item means and biases.

Reference: ``toolkits/collaborative_filtering/baseline.cpp:117`` — computes
global mean, per-user mean, per-item mean predictors and their training
RMSE (the reference's ``--algorithm=global_mean|user_mean|item_mean``).

Bias model: r̂(u,i) = μ + bu + bi with
    μ  = global mean rating
    bu = mean(r(u,·) − μ)
    bi = mean(r(·,i) − μ − bu)
computed in two groupBy passes (exactly the classic Koren baseline without
regularization). All JVM-side aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def global_mean(ratings: DataFrame) -> float:
    return ratings.agg(F.avg("rating").alias("mu")).collect()[0]["mu"]


def baseline_predict(ratings: DataFrame, method: str = "bias") -> DataFrame:
    """(user, item, rating, prediction) on the training pairs.

    methods: 'global_mean' | 'user_mean' | 'item_mean' | 'bias'.
    """
    mu = F.lit(global_mean(ratings))
    if method == "global_mean":
        return ratings.select("user", "item", "rating", mu.alias("prediction"))
    if method == "user_mean":
        um = ratings.groupBy("user").agg(F.avg("rating").alias("prediction"))
        return ratings.join(um, "user").select("user", "item", "rating", "prediction")
    if method == "item_mean":
        im = ratings.groupBy("item").agg(F.avg("rating").alias("prediction"))
        return ratings.join(im, "item").select("user", "item", "rating", "prediction")
    if method == "bias":
        bu = ratings.groupBy("user").agg(F.avg(F.col("rating") - mu).alias("bu"))
        with_bu = ratings.join(bu, "user")
        bi = with_bu.groupBy("item").agg(
            F.avg(F.col("rating") - mu - F.col("bu")).alias("bi")
        )
        return (
            with_bu.join(bi, "item")
            .select(
                "user",
                "item",
                "rating",
                (mu + F.col("bu") + F.col("bi")).alias("prediction"),
            )
        )
    raise ValueError(f"unknown method {method!r}")


def baseline_rmse(ratings: DataFrame, method: str = "bias") -> DataFrame:
    """One-row DataFrame (method, rmse) — the reference prints training
    RMSE per predictor (``baseline.cpp`` output contract)."""
    pred = baseline_predict(ratings, method)
    return pred.agg(
        F.lit(method).alias("method"),
        F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"), 2))).alias("rmse"),
    )


def baseline_predict_sql(ratings_sql: str, method: str = "bias") -> str:
    """DuckDB oracle mirroring baseline_predict."""
    if method == "global_mean":
        return f"""
            WITH r AS ({ratings_sql})
            SELECT "user", item, rating,
                   (SELECT avg(rating) FROM r) AS prediction
            FROM r
        """
    if method == "user_mean":
        return f"""
            WITH r AS ({ratings_sql}),
            um AS (SELECT "user", avg(rating) AS prediction FROM r GROUP BY "user")
            SELECT r."user", item, rating, prediction FROM r JOIN um USING ("user")
        """
    if method == "item_mean":
        return f"""
            WITH r AS ({ratings_sql}),
            im AS (SELECT item, avg(rating) AS prediction FROM r GROUP BY item)
            SELECT "user", r.item, rating, prediction FROM r JOIN im USING (item)
        """
    return f"""
        WITH r AS ({ratings_sql}),
        g AS (SELECT avg(rating) AS mu FROM r),
        bu AS (
            SELECT "user", avg(rating - mu) AS bu FROM r, g GROUP BY "user"
        ),
        rb AS (SELECT r.*, bu.bu FROM r JOIN bu USING ("user")),
        bi AS (
            SELECT item, avg(rating - mu - bu) AS bi FROM rb, g GROUP BY item
        )
        SELECT rb."user", rb.item, rb.rating,
               (SELECT mu FROM g) + rb.bu + bi.bi AS prediction
        FROM rb JOIN bi USING (item)
    """
