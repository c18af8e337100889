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

Full reorthogonalization is BATCHED: the basis lives in one wide
DataFrame (key, b0..b_{j-1}), so all j dot products against the basis are
ONE aggregate and the deflation w −= Σ c_i·b_i is ONE select — two jobs
per half-step regardless of step count (the r1 review flagged the
previous one-job-per-dot O(K²) pattern).

Scale: each Lanczos step = 2 shuffle-bounded matvecs + 2 aggregates;
the basis DataFrame is O((M+N)·K) — checkpointed per step.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _matvec(r: DataFrame, vec: DataFrame, join_key: str, group_key: str) -> DataFrame:
    return (
        r.join(vec.select(F.col(join_key), "x"), join_key)
        .groupBy(group_key)
        .agg(F.sum(F.col("rating") * F.col("x")).alias("x"))
    )


def _orthogonalize(
    w: DataFrame, basis: DataFrame | None, nb: int, key: str
) -> tuple[DataFrame, float, list[float]]:
    """Deflate ``w`` against the ``nb`` basis columns of ``basis`` and
    return (deflated vector, norm, basis dots). One aggregate computes
    every basis dot AND (after deflation, a second aggregate) the norm."""
    cs: list[float] = []
    if basis is not None and nb > 0:
        j = w.join(basis, key, "full_outer").select(
            key,
            F.coalesce("x", F.lit(0.0)).alias("x"),
            *[F.coalesce(f"b{i}", F.lit(0.0)).alias(f"b{i}") for i in range(nb)],
        )
        j = j.localCheckpoint(eager=True)
        dots = j.agg(
            *[F.sum(F.col("x") * F.col(f"b{i}")).alias(f"c{i}") for i in range(nb)]
        ).collect()[0]
        cs = [float(dots[f"c{i}"] or 0.0) for i in range(nb)]
        deflate = F.col("x")
        for i, c in enumerate(cs):
            deflate = deflate - F.lit(c) * F.col(f"b{i}")
        w = j.select(key, deflate.alias("x"))
    w = w.localCheckpoint(eager=True)
    norm2 = w.agg(F.sum(F.col("x") * F.col("x")).alias("n")).collect()[0]["n"]
    return w, float(np.sqrt(max(norm2 or 0.0, 0.0))), cs


def _append_basis(
    basis: DataFrame | None, vec: DataFrame, nb: int, key: str
) -> DataFrame:
    col = vec.select(key, F.col("x").alias(f"b{nb}"))
    if basis is None:
        return col.localCheckpoint(eager=True)
    return (
        basis.join(col, key, "full_outer")
        .select(
            key,
            *[F.coalesce(f"b{i}", F.lit(0.0)).alias(f"b{i}") for i in range(nb)],
            F.coalesce(f"b{nb}", F.lit(0.0)).alias(f"b{nb}"),
        )
        .localCheckpoint(eager=True)
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
    v = items.select(
        "item", F.lit(1.0 / np.sqrt(n_items)).alias("x")
    ).localCheckpoint(eager=True)

    U_basis: DataFrame | None = None
    V_basis: DataFrame | None = _append_basis(None, v, 0, "item")
    last_u: DataFrame | None = None
    alphas: list[float] = []
    betas: list[float] = []

    for j in range(steps):
        # u = A v  (minus beta * previous u), then orthogonalize vs U
        Av = _matvec(r, v, "item", "user")
        if last_u is not None:
            Av = (
                Av.join(last_u.select("user", F.col("x").alias("y")), "user",
                        "full_outer")
                .select(
                    "user",
                    (
                        F.coalesce("x", F.lit(0.0))
                        - betas[-1] * F.coalesce("y", F.lit(0.0))
                    ).alias("x"),
                )
            )
        u, alpha, _ = _orthogonalize(Av, U_basis, len(alphas), "user")
        if alpha < 1e-12:
            break
        u = u.select("user", (F.col("x") / alpha).alias("x")).localCheckpoint(
            eager=True
        )
        U_basis = _append_basis(U_basis, u, len(alphas), "user")
        alphas.append(alpha)
        last_u = u

        # w = Aᵀ u − alpha·v, orthogonalize vs V
        Atu = _matvec(r, u, "user", "item")
        Atu = (
            Atu.join(v.select("item", F.col("x").alias("y")), "item", "full_outer")
            .select(
                "item",
                (
                    F.coalesce("x", F.lit(0.0)) - alpha * F.coalesce("y", F.lit(0.0))
                ).alias("x"),
            )
        )
        w, beta, _ = _orthogonalize(Atu, V_basis, len(betas) + 1, "item")
        if beta < 1e-12:
            betas.append(0.0)
            break
        v = w.select("item", (F.col("x") / beta).alias("x")).localCheckpoint(
            eager=True
        )
        V_basis = _append_basis(V_basis, v, len(betas) + 1, "item")
        betas.append(beta)

    # driver-side bidiagonal SVD (tiny)
    m = len(alphas)
    B = np.zeros((m, m))
    for i in range(m):
        B[i, i] = alphas[i]
        if i + 1 < m:
            B[i, i + 1] = betas[i]
    ub, s, vbt = np.linalg.svd(B)
    s = s[:k]

    def combine(basis: DataFrame, weights: np.ndarray, key: str) -> DataFrame:
        # factors[j] = Σ_i b_i · weights[i, j] — a single select over the
        # wide basis frame
        cols = []
        for col_j in range(k):
            expr = None
            for i in range(m):
                term = F.col(f"b{i}") * float(weights[i, col_j])
                expr = term if expr is None else expr + term
            cols.append(expr.alias(f"f{col_j}"))
        return basis.select(key, *cols).select(
            key, F.array(*[f"f{j}" for j in range(k)]).alias("factors")
        )

    U = combine(U_basis, ub[:, :k], "user")
    V = combine(V_basis, vbt.T[:, :k], "item")
    return s, U, V


def lanczos_svd_onesided(
    ratings: DataFrame, k: int = 3, max_iter: int | None = None
) -> tuple[np.ndarray, DataFrame, DataFrame]:
    """One-sided Lanczos (``svd_onesided.cpp``): iterate on the Gram
    matrix AᵀA keeping only the item-side basis — half the basis memory
    of the bidiagonal form. Per step: w = Aᵀ(A·v) (two matvecs), α = v·w,
    full reorthogonalization, β = ‖w‖. Singular values are the square
    roots of the tridiagonal eigenvalues; U is recovered as A·v_i/σ_i.
    """
    steps = max_iter or (k + 3)
    r = ratings.select("user", "item", F.col("rating").cast("double")).cache()
    items = r.select("item").distinct()
    n_items = items.count()
    v = items.select(
        "item", F.lit(1.0 / np.sqrt(n_items)).alias("x")
    ).localCheckpoint(eager=True)

    V_basis = _append_basis(None, v, 0, "item")
    alphas: list[float] = []
    betas: list[float] = []
    for j in range(steps):
        Av = _matvec(r, v, "item", "user")
        w = _matvec(r, Av, "user", "item")  # AᵀA·v
        w, beta, cs = _orthogonalize(w, V_basis, len(alphas) + 1, "item")
        alphas.append(cs[-1])  # α_j = v_j · (AᵀA v_j)
        if beta < 1e-10:
            break
        v = w.select("item", (F.col("x") / beta).alias("x")).localCheckpoint(
            eager=True
        )
        V_basis = _append_basis(V_basis, v, len(betas) + 1, "item")
        betas.append(beta)

    m = len(alphas)
    T = np.diag(alphas)
    for i in range(min(m - 1, len(betas))):
        T[i, i + 1] = T[i + 1, i] = betas[i]
    evals, evecs = np.linalg.eigh(T)
    order = np.argsort(-evals)[:k]
    s = np.sqrt(np.clip(evals[order], 0.0, None))
    W = evecs[:, order]  # m × k combination weights

    cols = []
    for col_j in range(k):
        expr = None
        for i in range(m):
            term = F.col(f"b{i}") * float(W[i, col_j])
            expr = term if expr is None else expr + term
        cols.append(expr.alias(f"f{col_j}"))
    V = V_basis.select("item", *cols).select(
        "item", F.array(*[f"f{j}" for j in range(k)]).alias("factors")
    ).localCheckpoint(eager=True)

    # U_i = A·v_i / σ_i, all k columns in one join-aggregate
    U = (
        r.join(V, "item")
        .groupBy("user")
        .agg(
            *[
                F.sum(F.col("rating") * F.col("factors")[i]).alias(f"f{i}")
                for i in range(k)
            ]
        )
        .select(
            "user",
            F.array(
                *[
                    F.try_divide(F.col(f"f{i}"), F.lit(float(s[i])))
                    for i in range(k)
                ]
            ).alias("factors"),
        )
    )
    return s, U, V
