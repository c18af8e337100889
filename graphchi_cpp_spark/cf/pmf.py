"""Bayesian PMF (M6) — Gibbs-sampled matrix factorization.

Reference: ``toolkits/collaborative_filtering/pmf.cpp:309`` — BPMF
(Salakhutdinov & Mnih 2008): per sweep, sample Gaussian-Wishart
hyperpriors for each side from the current factor moments (``sample_U`` /
``sample_V``, ``pmf.cpp:218,251``), then per vertex draw from the
conditional Gaussian posterior Λ* = Λ + α·XᵀX, and accumulate the
RUNNING AVERAGE of predictions (``avgprd``) whose RMSE is the reported
metric — individual Gibbs samples wobble, the average descends.

Engine split (same as cf/als.py): hyperprior sampling is driver-side
numpy over d-vector/d×d factor MOMENTS computed by Spark aggregates (the
K×K driver-state pattern the survey sanctions for Lanczos — no factor
table is ever collected); the per-entity conditional solve+draw runs in
hash-block ``applyInPandas``; prediction averaging and RMSE stay in
Spark expressions.

Determinism: every draw uses ``numpy.random.default_rng`` seeded from
(entity id, sweep, side) integers — double runs are bit-identical, no
global RNG state (the reference seeds libc rand; we strengthen the
contract the same way the random-walks operator does).

Noise precision α is fixed at 2.0 (the BPMF paper's choice; the
reference optionally Wishart-samples it — documented simplification).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from graphchi_cpp_spark.cf.als import _init_factors, solve_blocks

ALPHA = 2.0


def _wishart(rng: np.random.Generator, nu: float, W: np.ndarray) -> np.ndarray:
    """Bartlett-decomposition Wishart draw (numpy has no wishart)."""
    d = W.shape[0]
    L = np.linalg.cholesky(W)
    A = np.zeros((d, d))
    for i in range(d):
        A[i, i] = np.sqrt(rng.chisquare(nu - i))
        for j in range(i):
            A[i, j] = rng.standard_normal()
    LA = L @ A
    return LA @ LA.T


def _factor_moments(side_f: DataFrame, d: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, E[xxᵀ]) via ONE Spark aggregate — d + d² scalars."""
    aggs = [F.count("*").alias("n")]
    aggs += [F.avg(F.col("factors")[i]).alias(f"m{i}") for i in range(d)]
    aggs += [
        F.avg(F.col("factors")[i] * F.col("factors")[j]).alias(f"s{i}_{j}")
        for i in range(d)
        for j in range(d)
    ]
    row = side_f.agg(*aggs).collect()[0]
    n = row["n"]
    mean = np.array([row[f"m{i}"] for i in range(d)])
    exx = np.array([[row[f"s{i}_{j}"] for j in range(d)] for i in range(d)])
    return n, mean, exx


def _sample_hyper(
    n: int,
    xbar: np.ndarray,
    exx: np.ndarray,
    rng: np.random.Generator,
    beta0: float = 2.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Gaussian-Wishart posterior draw (mu, Λ) from factor moments."""
    d = len(xbar)
    S = exx - np.outer(xbar, xbar)  # biased covariance, matches np.cov bias=True
    nu0, W0_inv = d, np.eye(d)
    beta_star = beta0 + n
    nu_star = nu0 + n
    Winv = W0_inv + n * S + (beta0 * n / beta_star) * np.outer(xbar, xbar)
    Lam = _wishart(rng, nu_star, np.linalg.inv(Winv))
    mu_mean = (n * xbar) / beta_star  # prior mean mu0 = 0
    cov = np.linalg.inv(beta_star * Lam)
    mu = mu_mean + np.linalg.cholesky(cov) @ rng.standard_normal(d)
    return mu, Lam


def pmf(
    ratings: DataFrame,
    d: int = 5,
    iterations: int = 6,
    burn_in: int = 2,
    alpha: float = ALPHA,
    mode: str = "sample",
) -> tuple[DataFrame, DataFrame, list[dict]]:
    """Returns (user_factors, item_factors, history) where history rows
    carry {iter, train_rmse} of the post-burn-in averaged predictions
    (pre-burn-in: RMSE of the current sample).

    ``mode``: 'sample' (default) is the reference's Gibbs sampler;
    'mean' replaces every draw with its posterior mean — hyperpriors
    take the Gaussian-Wishart posterior mean (μ* , ν*·W*) and each
    entity takes the conditional-Gaussian mean instead of a Cholesky
    draw. That is iterated conditional modes over the same BPMF
    posterior: fully deterministic, independent of block partitioning,
    and (at d=1) closed-form enough that a SQL engine can replay the
    whole trajectory — ``pmf_mean_sql`` is that DuckDB oracle."""
    if mode not in ("sample", "mean"):
        raise ValueError(mode)
    r = ratings.select("user", "item", F.col("rating").cast("double")).cache()
    user_f = _init_factors(r.select("user").distinct(), "user", d).localCheckpoint(
        eager=True
    )
    item_f = _init_factors(r.select("item").distinct(), "item", d).localCheckpoint(
        eager=True
    )

    def gibbs_side(side_f, fixed_f, group_col, other_col, sweep, side_id):
        n, xbar, exx = _factor_moments(side_f, d)
        if mode == "mean":
            beta0 = 2.0
            S = exx - np.outer(xbar, xbar)
            beta_star, nu_star = beta0 + n, d + n
            Winv = np.eye(d) + n * S + (beta0 * n / beta_star) * np.outer(
                xbar, xbar
            )
            lam_h = nu_star * np.linalg.inv(Winv)  # E[Wishart(ν*, W*)]
            mu_h = (n * xbar) / beta_star
        else:
            hyper_rng = np.random.default_rng(1_000_003 * sweep + side_id + 1)
            mu_h, lam_h = _sample_hyper(n, xbar, exx, hyper_rng)
        lam_mu = lam_h @ mu_h

        schema = StructType(
            [
                StructField(group_col, LongType()),
                StructField("factors", ArrayType(DoubleType())),
            ]
        )

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            keys, out = [], []
            for key, grp in pdf.groupby(group_col, sort=True):
                A = np.vstack(grp["_f"].to_numpy())
                b = grp["rating"].to_numpy()
                lam_star = lam_h + alpha * (A.T @ A)
                cov = np.linalg.inv(lam_star)
                mean = cov @ (alpha * (A.T @ b) + lam_mu)
                if mode == "mean":
                    x = mean
                else:
                    rng = np.random.default_rng(
                        (int(key) * 2654435761 + sweep * 97 + side_id) & 0x7FFFFFFF
                    )
                    x = mean + np.linalg.cholesky(cov) @ rng.standard_normal(d)
                keys.append(key)
                out.append([float(v) for v in x])
            return pd.DataFrame({group_col: keys, "factors": out})

        joined = (
            r.join(
                fixed_f.select(F.col(other_col), F.col("factors").alias("_f")),
                other_col,
            )
            .select(
                group_col,
                "rating",
                "_f",
                F.pmod(F.col(group_col), F.lit(solve_blocks(r))).alias("_blk"),
            )
        )
        return (
            joined.groupBy("_blk")
            .applyInPandas(run, schema)
            .localCheckpoint(eager=True)
        )

    avg = None  # (user, item, rating, cum): running sum of predictions
    n_avg = 0
    history: list[dict] = []
    for it in range(iterations):
        user_f = gibbs_side(user_f, item_f, "user", "item", it, 0)
        item_f = gibbs_side(item_f, user_f, "item", "user", it, 1)
        pred = (
            r.join(user_f.select("user", F.col("factors").alias("_uf")), "user")
            .join(item_f.select("item", F.col("factors").alias("_if")), "item")
            .select(
                "user",
                "item",
                "rating",
                F.aggregate(
                    F.zip_with("_uf", "_if", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("p"),
            )
        )
        if it >= burn_in:
            if avg is None:
                avg = pred.select("user", "item", "rating", F.col("p").alias("cum"))
            else:
                avg = (
                    avg.join(pred.select("user", "item", "p"), ["user", "item"])
                    .select(
                        "user", "item", "rating",
                        (F.col("cum") + F.col("p")).alias("cum"),
                    )
                )
            avg = avg.localCheckpoint(eager=True)
            n_avg += 1
            scored = avg.select(
                "rating", (F.col("cum") / F.lit(float(n_avg))).alias("prediction")
            )
        else:
            scored = pred.select("rating", F.col("p").alias("prediction"))
        rmse = scored.agg(
            F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"), 2)))
        ).collect()[0][0]
        history.append({"iter": it, "train_rmse": float(rmse)})
    return user_f, item_f, history


def pmf_mean_sql(
    ratings_sql: str,
    iterations: int = 3,
    alpha: float = ALPHA,
    ndigits: int = 4,
) -> str:
    """DuckDB oracle replaying ``pmf(d=1, burn_in=0, mode='mean')`` on
    the full ratings table — iteration-chained CTEs, one pair of
    half-sweeps per iteration (the NMF unrolled-CTE pattern).

    d=1 closed forms of the mean-mode math: moments (n, x̄, E[x²]) are
    plain aggregates; the Gaussian-Wishart posterior mean collapses to
    λ = (1+n)/(1 + n·S + (2n/β*)·x̄²) with β* = 2+n and μ = n·x̄/β*;
    each entity's conditional mean is (α·Σ f·r + λμ)/(λ + α·Σ f²).
    History row t reports the RMSE of the running-average prediction
    over sweeps 0..t (burn_in = 0)."""
    j0 = 2654435761  # _init_factors hash, component j=0
    ctes = [
        f"""r AS MATERIALIZED (
          SELECT "user", item, CAST(rating AS DOUBLE) AS rating
          FROM ({ratings_sql}))""",
        f"""uf0 AS MATERIALIZED (
          SELECT id, CAST((id * {j0}) % 100003 AS DOUBLE) / 1000030.0 AS f
          FROM (SELECT DISTINCT "user" AS id FROM r))""",
        f"""vf0 AS MATERIALIZED (
          SELECT id, CAST((id * {j0}) % 100003 AS DOUBLE) / 1000030.0 AS f
          FROM (SELECT DISTINCT item AS id FROM r))""",
    ]

    def hyper(src: str, out: str) -> str:
        # λ = ν*/Winv, μ = n·x̄/β*  (β0=2, ν0=d=1, W0=I)
        return f"""{out} AS (
          SELECT (1.0 + n) /
                   (1.0 + n * (ex - xb * xb) + (2.0 * n / (2.0 + n)) * xb * xb)
                 AS lam,
                 n * xb / (2.0 + n) AS mu
          FROM (SELECT CAST(count(*) AS DOUBLE) AS n, avg(f) AS xb,
                       avg(f * f) AS ex FROM {src}))"""

    for t in range(iterations):
        ctes.append(hyper(f"uf{t}", f"uh{t}"))
        ctes.append(
            f"""uf{t + 1} AS MATERIALIZED (
          SELECT r."user" AS id,
                 ({alpha} * sum(v.f * r.rating) + max(h.lam * h.mu))
                   / (max(h.lam) + {alpha} * sum(v.f * v.f)) AS f
          FROM r JOIN vf{t} v ON v.id = r.item CROSS JOIN uh{t} h
          GROUP BY r."user")"""
        )
        ctes.append(hyper(f"vf{t}", f"vh{t}"))
        ctes.append(
            f"""vf{t + 1} AS MATERIALIZED (
          SELECT r.item AS id,
                 ({alpha} * sum(u.f * r.rating) + max(h.lam * h.mu))
                   / (max(h.lam) + {alpha} * sum(u.f * u.f)) AS f
          FROM r JOIN uf{t + 1} u ON u.id = r."user" CROSS JOIN vh{t} h
          GROUP BY r.item)"""
        )
        ctes.append(
            f"""p{t} AS MATERIALIZED (
          SELECT r."user", r.item, r.rating, u.f * v.f AS p
          FROM r JOIN uf{t + 1} u ON u.id = r."user"
                 JOIN vf{t + 1} v ON v.id = r.item)"""
        )
    joins = " ".join(
        f'JOIN p{t} ON p{t}."user" = p0."user" AND p{t}.item = p0.item'
        for t in range(1, iterations)
    )
    pred_cols = ", ".join(f"p{t}.p AS p{t}" for t in range(iterations))
    ctes.append(
        f"""preds AS MATERIALIZED (
          SELECT p0."user", p0.item, p0.rating, {pred_cols}
          FROM p0 {joins})"""
    )
    selects = []
    for t in range(iterations):
        avg_expr = "(" + " + ".join(f"p{s}" for s in range(t + 1)) + f") / {t + 1}.0"
        selects.append(
            f"SELECT CAST({t} AS INT) AS iter, "
            f"round(sqrt(avg(pow(rating - ({avg_expr}), 2))), {ndigits}) "
            f"AS train_rmse FROM preds"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
