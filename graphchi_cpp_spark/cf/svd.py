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

    # driver-side bidiagonal SVD (tiny). The projection U_mᵀ A V_nv is
    # m×nv with nv = |V basis| ∈ {m, m+1}: when the u side exhausts first
    # (rank termination, α_{m+1}=0) the final β still links v_{m+1} and
    # must be kept — squaring the matrix silently drops it and skews the
    # trailing σ (measured 0.3577 → 0.0971 on a rank-3 fixture).
    m = len(alphas)
    nv = len(V_basis.columns) - 1
    B = np.zeros((m, nv))
    for i in range(m):
        B[i, i] = alphas[i]
        if i < len(betas) and i + 1 < nv:
            B[i, i + 1] = betas[i]
    ub, s, vbt = np.linalg.svd(B)
    s = s[:k]

    def combine(basis: DataFrame, weights: np.ndarray, key: str) -> DataFrame:
        # factors[j] = Σ_i b_i · weights[i, j] — a single select over the
        # wide basis frame
        cols = []
        for col_j in range(k):
            expr = None
            for i in range(weights.shape[0]):
                term = F.col(f"b{i}") * float(weights[i, col_j])
                expr = term if expr is None else expr + term
            cols.append(expr.alias(f"f{col_j}"))
        return basis.select(key, *cols).select(
            key, F.array(*[f"f{j}" for j in range(k)]).alias("factors")
        )

    U = combine(U_basis, ub[:, :k], "user")
    V = combine(V_basis, vbt.T[:, :k], "item")
    return s, U, V


# --------------------------------------------------------------------- #
# Oracle-checkable fixture: a deterministic rank-d matrix over the
# ratings id universe. Lanczos is EXACT on a rank-d input (the Krylov
# space spans the range after d steps, and we fully reorthogonalize), so
# running the real operator on this fixture yields the fixture's true
# singular values — which have a closed form: σ² are the eigenvalues of
# the 3×3 product (BᵀB)(CᵀC), solvable in ANSI SQL via the trigonometric
# cubic formula. This flips the M5 check from rows-only to value-hashed
# without weakening the operator under test (same code path end to end).
# --------------------------------------------------------------------- #
_FIX_SCALES = (4.0, 2.0, 1.0)


def _hash_comp(col: str, j: int):
    """Same deterministic hash component as ``als._init_factors``."""
    return (
        F.pmod(
            F.col(col) * F.lit(2654435761 + 97 * j) + F.lit(12289 * j),
            F.lit(100003),
        )
        / F.lit(1000030.0)
    ).cast("double")


def lowrank_fixture(
    ratings: DataFrame,
    scales: tuple = _FIX_SCALES,
    user_mod: int = 5,
    item_mod: int = 5,
) -> DataFrame:
    """Dense rank-len(scales) matrix A = B·Cᵀ over a modulus-sampled
    subset of the ratings' user/item ids; B[u,j] = scales[j]·hash(u,j),
    C[i,j] = hash(i,j). Column scales separate the singular values."""
    users = ratings.select("user").distinct().filter(F.col("user") % user_mod == 0)
    items = ratings.select("item").distinct().filter(F.col("item") % item_mod == 0)
    expr = None
    for j, s in enumerate(scales):
        t = F.lit(float(s)) * _hash_comp("user", j) * _hash_comp("item", j)
        expr = t if expr is None else expr + t
    return users.crossJoin(items).select("user", "item", expr.alias("rating"))


def _hash_comp_sql(idc: str, j: int) -> str:
    return f"((({idc} * {2654435761 + 97 * j} + {12289 * j}) % 100003) / 1000030.0)"


def lowrank_sigma_sql(
    ratings_sql: str,
    scales: tuple = _FIX_SCALES,
    user_mod: int = 5,
    item_mod: int = 5,
    ndigits: int = 4,
) -> str:
    """Closed-form singular values of ``lowrank_fixture``: σ² = eigen-
    values of M = (BᵀB)(CᵀC) (3×3). Characteristic cubic solved with the
    trigonometric method (three real roots — M is similar to an SPD
    matrix): t³+pt+q roots are 2√(−p/3)·cos(⅓·acos(3q/(2p)·√(−3/p)) −
    2πk/3), λ = t − a/3. Output (rank, sigma) like the Spark query."""
    d = len(scales)
    assert d == 3, "closed-form oracle is for the rank-3 fixture"
    b_cols = ", ".join(
        f"{float(scales[j])} * {_hash_comp_sql('id', j)} AS b{j}" for j in range(d)
    )
    c_cols = ", ".join(f"{_hash_comp_sql('id', j)} AS c{j}" for j in range(d))
    gb = ", ".join(
        f"sum(b{i} * b{j}) AS gb{i}{j}" for i in range(d) for j in range(i, d)
    )
    gc = ", ".join(
        f"sum(c{i} * c{j}) AS gc{i}{j}" for i in range(d) for j in range(i, d)
    )

    def g(p: str, i: int, j: int) -> str:  # symmetric Gram accessor
        return f"{p}{min(i, j)}{max(i, j)}"

    m_entries = ", ".join(
        " + ".join(f"{g('gb', i, k)} * {g('gc', k, j)}" for k in range(d))
        + f" AS m{i}{j}"
        for i in range(d)
        for j in range(d)
    )
    return f"""
        WITH r0 AS MATERIALIZED ({ratings_sql}),
        bu AS MATERIALIZED (
          SELECT id, {b_cols}
          FROM (SELECT DISTINCT "user" AS id FROM r0 WHERE "user" % {user_mod} = 0)
        ),
        ci AS MATERIALIZED (
          SELECT id, {c_cols}
          FROM (SELECT DISTINCT item AS id FROM r0 WHERE item % {item_mod} = 0)
        ),
        gb AS (SELECT {gb} FROM bu),
        gc AS (SELECT {gc} FROM ci),
        m AS (SELECT {m_entries} FROM gb, gc),
        coef AS (
          SELECT m00 + m11 + m22 AS c2,
                 (m00*m11 - m01*m10) + (m00*m22 - m02*m20)
                   + (m11*m22 - m12*m21) AS c1,
                 m00*(m11*m22 - m12*m21) - m01*(m10*m22 - m12*m20)
                   + m02*(m10*m21 - m11*m20) AS c0
          FROM m
        ),
        cub AS (SELECT -c2 AS a, c1 AS b, -c0 AS c FROM coef),
        tri AS (
          SELECT a,
                 b - a*a/3.0 AS p,
                 2.0*a*a*a/27.0 - a*b/3.0 + c AS q
          FROM cub
        ),
        lam AS (
          SELECT 2.0*sqrt(-p/3.0) * cos(
                   acos(greatest(-1.0, least(1.0,
                     (3.0*q)/(2.0*p) * sqrt(-3.0/p)))) / 3.0
                   - 2.0*pi()*k/3.0
                 ) - a/3.0 AS lam
          FROM tri, (VALUES (0), (1), (2)) AS t(k)
        )
        SELECT CAST(row_number() OVER (ORDER BY lam DESC) - 1 AS INT) AS rank,
               round(sqrt(lam), {ndigits}) AS sigma
        FROM lam ORDER BY rank
    """


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
