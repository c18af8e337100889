"""pyspark.ml ALS backend (M1 alternative path).

The native implementation (``cf.als``) reproduces the reference's exact
alternating-Cholesky semantics with deterministic init; this wrapper
exposes Spark MLlib's blocked ALS (``pyspark.ml.recommendation.ALS``) for
deployments that prefer the library implementation (implicit feedback,
nonneg constraints, built-in recommendForAllUsers). Guarded import: the
module stays usable in minimal containers without pyspark.ml native deps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def als_ml(
    ratings: DataFrame,
    d: int = 5,
    iterations: int = 10,
    reg: float = 0.065,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (user_factors(user, factors), item_factors(item, factors),
    predictions(user, item, rating, prediction))."""
    try:
        from pyspark.ml.recommendation import ALS as MLALS
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "pyspark.ml is unavailable in this environment; use cf.als.als"
        ) from e

    model = (
        MLALS(
            rank=d,
            maxIter=iterations,
            regParam=reg,
            userCol="user",
            itemCol="item",
            ratingCol="rating",
            seed=seed,
            coldStartStrategy="drop",
        )
    ).fit(ratings)
    uf = model.userFactors.select(
        F.col("id").cast("long").alias("user"),
        F.col("features").cast("array<double>").alias("factors"),
    )
    itf = model.itemFactors.select(
        F.col("id").cast("long").alias("item"),
        F.col("features").cast("array<double>").alias("factors"),
    )
    preds = model.transform(ratings).select(
        "user", "item", "rating", F.col("prediction").cast("double")
    )
    return uf, itf, preds
