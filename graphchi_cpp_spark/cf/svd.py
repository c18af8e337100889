"""SVD via Golub-Kahan-Lanczos bidiagonalization (M5).

Reference: ``toolkits/collaborative_filtering/svd.cpp:94-140`` (restarted
Lanczos; one-sided variant ``svd_onesided.cpp``) — the per-iteration work
is the distributed matvec A·v / Aᵀ·u over the ratings bipartite graph;
the K×K bidiagonal eigenproblem is solved on the driver (K small), which
is exactly the reference's structure (vertices hold vector entries,
scalars αβ on the driver).

Spark mapping of the matvec (the only heavy op):
    (A·v)[u]  = Σ_i r(u,i)·v[i]  →  ratings ⋈ v(item) → groupBy(user).sum
    (Aᵀ·u)[i] = Σ_u r(u,i)·u[u]  →  ratings ⋈ u(user) → groupBy(item).sum
Full reorthogonalization against stored basis vectors (DataFrame joins +
dot-product aggregates) keeps numerical sanity for small K.

Scale: each Lanczos step = 2 shuffle-bounded matvecs + O(K) dot products;
basis vectors are O(M+N) rows each — cache/checkpoint per step.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot_df(a: DataFrame, b: DataFrame, key: str) -> float:
    j = a.join(b.withColumnRenamed("x", "y"), key)
    row = j.agg(F.sum(F.col("x") * F.col("y")).alias("d")).collect()[0]
    return float(row["d"] or 0.0)


def _scale(v: DataFrame, s: float) -> DataFrame:
    return v.select(v.columns[0], (F.col("x") * s).alias("x"))


def _axpy(v: DataFrame, w: DataFrame, alpha: float, key: str) -> DataFrame:
    """v - alpha*w elementwise (outer join, missing = 0)."""
    return (
        v.join(w.withColumnRenamed("x", "y"), key, "full_outer")
        .select(
            key,
            (F.coalesce("x", F.lit(0.0)) - alpha * F.coalesce("y", F.lit(0.0))).alias(
                "x"
            ),
        )
    )


def lanczos_svd(
    ratings: DataFrame, k: int = 3, max_iter: int | None = None
) -> tuple[np.ndarray, DataFrame, DataFrame]:
    """Top-k singular values of the ratings matrix.

    Returns (singular_values desc, U(user, factors), V(item, factors)).
    Deterministic: the start vector is all-ones normalized.
    """
    steps = max_iter or (k + 3)
    r = ratings.select("user", "item", F.col("rating").cast("double")).cache()
    items = r.select("item").distinct()

    # v0 = normalized ones over items
    n_items = items.count()
    v = items.select("item", F.lit(1.0 / np.sqrt(n_items)).alias("x")).localCheckpoint(
        eager=True
    )

    Vs: list[DataFrame] = [v]
    Us: list[DataFrame] = []
    alphas: list[float] = []
    betas: list[float] = []

    for j in range(steps):
        # u = A v  (minus beta * previous u)
        Av = (
            r.join(v.select(F.col("item"), "x"), "item")
            .groupBy("user")
            .agg(F.sum(F.col("rating") * F.col("x")).alias("x"))
        )
        if Us:
            Av = _axpy(Av, Us[-1], betas[-1], "user")
        # full reorthogonalization against U basis
        for ub in Us:
            c = _dot_df(Av, ub, "user")
            Av = _axpy(Av, ub, c, "user")
        Av = Av.localCheckpoint(eager=True)
        alpha = float(np.sqrt(max(_dot_df(Av, Av, "user"), 0.0)))
        if alpha < 1e-12:
            break
        u = _scale(Av, 1.0 / alpha).localCheckpoint(eager=True)
        alphas.append(alpha)
        Us.append(u)

        # w = Aᵀ u - alpha * v
        Atu = (
            r.join(u.select(F.col("user"), "x"), "user")
            .groupBy("item")
            .agg(F.sum(F.col("rating") * F.col("x")).alias("x"))
        )
        Atu = _axpy(Atu, v, alpha, "item")
        for vb in Vs:
            c = _dot_df(Atu, vb, "item")
            Atu = _axpy(Atu, vb, c, "item")
        Atu = Atu.localCheckpoint(eager=True)
        beta = float(np.sqrt(max(_dot_df(Atu, Atu, "item"), 0.0)))
        if beta < 1e-12:
            betas.append(0.0)
            break
        v = _scale(Atu, 1.0 / beta).localCheckpoint(eager=True)
        betas.append(beta)
        Vs.append(v)

    # driver-side bidiagonal SVD (tiny)
    m = len(alphas)
    B = np.zeros((m, m))
    for i in range(m):
        B[i, i] = alphas[i]
        if i + 1 < m:
            B[i, i + 1] = betas[i]
    ub, s, vbt = np.linalg.svd(B)
    s = s[:k]

    # assemble factor DataFrames: U_k = [u_0..u_{m-1}] @ ub[:, :k]
    def combine(basis: list[DataFrame], weights: np.ndarray, key: str) -> DataFrame:
        out = None
        for i, bdf in enumerate(basis):
            part = bdf.select(
                key, *[(F.col("x") * float(weights[i, j])).alias(f"f{j}") for j in range(k)]
            )
            if out is None:
                out = part
            else:
                out = (
                    out.join(part.select(key, *[F.col(f"f{j}").alias(f"g{j}") for j in range(k)]), key, "full_outer")
                    .select(
                        key,
                        *[
                            (
                                F.coalesce(f"f{j}", F.lit(0.0))
                                + F.coalesce(f"g{j}", F.lit(0.0))
                            ).alias(f"f{j}")
                            for j in range(k)
                        ],
                    )
                )
        return out.select(key, F.array(*[f"f{j}" for j in range(k)]).alias("factors"))

    U = combine(Us, ub[:, :k], "user")
    V = combine(Vs[:m], vbt.T[:, :k], "item")
    return s, U, V
