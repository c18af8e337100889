"""NMF — Lee-Seung multiplicative updates (M4).

Reference: ``toolkits/collaborative_filtering/nmf.cpp:128`` — alternating
multiplicative updates keeping factors nonnegative:

    W ← W ⊙ (A Hᵀ) ⊘ (W H Hᵀ)
    H ← H ⊙ (Wᵀ A) ⊘ (W Wᵀ H)

Sparse-A structure: A Hᵀ is a ratings⋈H join-aggregate (shuffle bounded
by nnz); H Hᵀ / W Wᵀ are K×K Gram matrices collected to the driver
(K small — same division of labor as the reference's in-memory latent
factor arrays). Deterministic hash-based init in (0, 1].
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.cf.als import _init_factors, predict

EPS = 1e-9


def _gram(factors: DataFrame, d: int) -> np.ndarray:
    """Kxd Gram matrix Σ f fᵀ collected driver-side."""
    exprs = [
        F.sum(F.col("factors")[i] * F.col("factors")[j]).alias(f"g_{i}_{j}")
        for i in range(d)
        for j in range(d)
    ]
    row = factors.agg(*exprs).collect()[0]
    return np.array([[row[f"g_{i}_{j}"] for j in range(d)] for i in range(d)])


def _update_side(
    ratings: DataFrame,
    this: DataFrame,
    other: DataFrame,
    this_col: str,
    other_col: str,
    d: int,
) -> DataFrame:
    """One multiplicative update: this ← this ⊙ (A·other) ⊘ (this·Gram(other))."""
    gram = _gram(other, d)
    num = (
        ratings.join(
            other.select(F.col(other_col), F.col("factors").alias("_of")), other_col
        )
        .groupBy(this_col)
        .agg(
            *[
                F.sum(F.col("rating") * F.col("_of")[i]).alias(f"n{i}")
                for i in range(d)
            ]
        )
    )
    joined = this.join(num, this_col, "left")
    new_factors = []
    for i in range(d):
        denom = None
        for j in range(d):
            term = F.col("factors")[j] * float(gram[j, i])
            denom = term if denom is None else denom + term
        new_factors.append(
            (
                F.col("factors")[i]
                * F.coalesce(F.col(f"n{i}"), F.lit(0.0))
                / (denom + F.lit(EPS))
            ).alias(f"f{i}")
        )
    return joined.select(
        F.col(this_col), *new_factors
    ).select(this_col, F.array(*[f"f{i}" for i in range(d)]).alias("factors"))


def nmf(
    ratings: DataFrame, d: int = 5, iterations: int = 5
) -> tuple[DataFrame, DataFrame, list[dict]]:
    """Returns (W(user,factors), H(item,factors), history[{iter, train_rmse}]).
    Factors stay nonnegative by construction (init > 0, multiplicative)."""
    r = ratings.select("user", "item", F.col("rating").cast("double")).cache()
    # init in (0,1]: reuse ALS hash init shifted away from zero
    W = _init_factors(r.select("user").distinct(), "user", d).select(
        "user", F.transform("factors", lambda x: x + 0.1).alias("factors")
    ).localCheckpoint(eager=True)
    H = _init_factors(r.select("item").distinct(), "item", d).select(
        "item", F.transform("factors", lambda x: x + 0.1).alias("factors")
    ).localCheckpoint(eager=True)

    history = []
    for it in range(iterations):
        W = _update_side(r, W, H, "user", "item", d).localCheckpoint(eager=True)
        H = _update_side(r, H, W, "item", "user", d).localCheckpoint(eager=True)
        rmse = (
            predict(r, W.withColumnRenamed("user", "user"), H)
            .agg(F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"), 2))))
            .collect()[0][0]
        )
        history.append({"iter": it, "train_rmse": float(rmse)})
    return W, H, history
