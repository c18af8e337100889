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


def nmf_sql(ratings_sql: str, d: int = 4, iterations: int = 3, ndigits: int = 4) -> str:
    """DuckDB oracle: the Lee-Seung updates unrolled in long form
    (id, k, val) — W⊙(A·H)/(W·Gram(H)) is three grouped joins per side.
    Init replicates ``cf.als._init_factors`` (+0.1 shift) exactly, so the
    whole trajectory is deterministic on both engines; the per-iteration
    train RMSE (rounded) is the compared output."""
    eps = EPS
    ctes = [
        f"r AS MATERIALIZED ({ratings_sql})",
        f"ks AS (SELECT unnest(range({d})) AS k)",
        """w0 AS MATERIALIZED (
          SELECT "user" AS id, k,
                 (("user" * (2654435761 + 97 * k) + 12289 * k) % 100003)
                   / 1000030.0 + 0.1 AS val
          FROM (SELECT DISTINCT "user" FROM r) CROSS JOIN ks
        )""",
        """h0 AS MATERIALIZED (
          SELECT item AS id, k,
                 ((item * (2654435761 + 97 * k) + 12289 * k) % 100003)
                   / 1000030.0 + 0.1 AS val
          FROM (SELECT DISTINCT item FROM r) CROSS JOIN ks
        )""",
    ]
    rmse_selects = []
    for i in range(1, iterations + 1):
        wp, hp = f"w{i - 1}", f"h{i - 1}"
        ctes.append(
            f"""w{i} AS MATERIALIZED (
              SELECT w.id, w.k,
                     w.val * coalesce(n.nv, 0.0) / (dn.denom + {eps}) AS val
              FROM {wp} w
              JOIN (
                SELECT w2.id, g.k, sum(w2.val * g.g) AS denom
                FROM {wp} w2
                JOIN (
                  SELECT a.k AS j, b.k AS k, sum(a.val * b.val) AS g
                  FROM {hp} a JOIN {hp} b ON a.id = b.id GROUP BY 1, 2
                ) g ON g.j = w2.k
                GROUP BY w2.id, g.k
              ) dn ON dn.id = w.id AND dn.k = w.k
              LEFT JOIN (
                SELECT r."user" AS id, h.k, sum(r.rating * h.val) AS nv
                FROM r JOIN {hp} h ON h.id = r.item GROUP BY 1, 2
              ) n ON n.id = w.id AND n.k = w.k
            )"""
        )
        ctes.append(
            f"""h{i} AS MATERIALIZED (
              SELECT h.id, h.k,
                     h.val * coalesce(n.nv, 0.0) / (dn.denom + {eps}) AS val
              FROM {hp} h
              JOIN (
                SELECT h2.id, g.k, sum(h2.val * g.g) AS denom
                FROM {hp} h2
                JOIN (
                  SELECT a.k AS j, b.k AS k, sum(a.val * b.val) AS g
                  FROM w{i} a JOIN w{i} b ON a.id = b.id GROUP BY 1, 2
                ) g ON g.j = h2.k
                GROUP BY h2.id, g.k
              ) dn ON dn.id = h.id AND dn.k = h.k
              LEFT JOIN (
                SELECT r.item AS id, w.k, sum(r.rating * w.val) AS nv
                FROM r JOIN w{i} w ON w.id = r."user" GROUP BY 1, 2
              ) n ON n.id = h.id AND n.k = h.k
            )"""
        )
        ctes.append(
            f"""rmse{i} AS MATERIALIZED (
              SELECT sqrt(avg(pow(rating - pred, 2))) AS v FROM (
                SELECT r.rating, sum(w.val * h.val) AS pred
                FROM r
                JOIN w{i} w ON w.id = r."user"
                JOIN h{i} h ON h.id = r.item AND h.k = w.k
                GROUP BY r."user", r.item, r.rating
              )
            )"""
        )
        rmse_selects.append(
            f"SELECT CAST({i - 1} AS INT) AS iter, "
            f"round(v, {ndigits}) AS train_rmse FROM rmse{i}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rmse_selects)


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
