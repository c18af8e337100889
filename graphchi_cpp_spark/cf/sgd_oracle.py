"""Unrolled-CTE DuckDB oracles for the sequential SGD variants (M3).

The block-SGD solvers in ``cf/sgd.py`` are inherently sequential inside
a block (every update reads the previous one), so their trajectories on
real data cannot be replayed with set-level SQL. These oracles verify
the exact same kernel on a 6-rating fixture instead: the 2 smallest
users × 3 smallest items of the ratings table (ids and hash-derived
rating values computed identically by both engines), ``num_blocks=1``
so the whole pass is one deterministic chain, and every one of the
6·iterations SGD steps unrolled into its own CTE — DuckDB genuinely
recomputes each gradient step, update order and all, from the base
tables. Reference semantics verified: ``biassgd2.cpp:131`` (logistic
loss gradient), ``timesvdpp.cpp:261-313`` (time-evolving SVD++ update
rules, including the documented old/new read order of q/x/z/pu/pt).

Step order matches ``run_block``'s ``sort_values(["user", "item"])``:
rows (user_a, item_b) in lexicographic (a, b) order, so step
t = epoch·6 + a·3 + b. Epoch boundaries are identity merges (single
block), and epoch e uses gamma·step_dec^e exactly like the solver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _hinit(idc: str, j: int) -> str:
    """SQL for ``als._init_factors`` component j of entity ``idc``."""
    return (
        f"(CAST(({idc} * {2654435761 + 97 * j} + {12289 * j}) % 100003"
        f" AS DOUBLE) / 1000030.0)"
    )


def sgd_fixture(
    spark: SparkSession, ratings: DataFrame, with_ts: bool = False
) -> DataFrame:
    """The 2-user × 3-item fixture: smallest ids from the ratings table,
    rating = 1 + (user·3 + item·7) mod 4, ts = row position mod 2."""
    us = [r[0] for r in ratings.select("user").distinct().orderBy("user").limit(2).collect()]
    its = [r[0] for r in ratings.select("item").distinct().orderBy("item").limit(3).collect()]
    rows = []
    for a, u in enumerate(us):
        for b, i in enumerate(its):
            row = (int(u), int(i), 1.0 + float((int(u) * 3 + int(i) * 7) % 4))
            if with_ts:
                row += ((a * 3 + b) % 2,)
            rows.append(row)
    schema = "user long, item long, rating double"
    if with_ts:
        schema += ", ts long"
    return spark.createDataFrame(rows, schema)


def _fixture_ctes(ratings_sql: str) -> list[str]:
    """CTEs pivoting the 2 smallest users / 3 smallest items into one
    row of id columns u0, u1, i0, i1, i2."""
    return [
        f"""ids AS MATERIALIZED (
          SELECT
            (SELECT id FROM (SELECT DISTINCT "user" AS id FROM ({ratings_sql}))
             ORDER BY id LIMIT 1 OFFSET 0) AS u0,
            (SELECT id FROM (SELECT DISTINCT "user" AS id FROM ({ratings_sql}))
             ORDER BY id LIMIT 1 OFFSET 1) AS u1,
            (SELECT id FROM (SELECT DISTINCT item AS id FROM ({ratings_sql}))
             ORDER BY id LIMIT 1 OFFSET 0) AS i0,
            (SELECT id FROM (SELECT DISTINCT item AS id FROM ({ratings_sql}))
             ORDER BY id LIMIT 1 OFFSET 1) AS i1,
            (SELECT id FROM (SELECT DISTINCT item AS id FROM ({ratings_sql}))
             ORDER BY id LIMIT 1 OFFSET 2) AS i2)"""
    ]


def _rating_cols() -> dict[str, str]:
    return {
        f"r{a}{b}": f"1.0 + CAST((u{a} * 3 + i{b} * 7) % 4 AS DOUBLE)"
        for a in range(2)
        for b in range(3)
    }


def sgd_variant_fixture_sql(
    ratings_sql: str,
    variant: str = "biassgd",
    loss: str = "square",
    d: int = 2,
    iterations: int = 2,
    gamma: float = 0.05,
    lam: float = 0.065,
    step_dec: float = 1.0,
    ndigits: int = 4,
) -> str:
    """Oracle for ``sgd(fixture, d, iterations, gamma, variant=...,
    loss=..., num_blocks=1)`` — every SGD step unrolled. Covers the
    non-time variants: 'sgd' (no bias, pred = u·v), 'biassgd' (μ + dot
    + biases; losses square/abs/logistic per ``biassgd2.cpp:131``), and
    'svdpp' (bias + the epoch-start implicit Σq/√n folded into the
    user's effective latent for pred and the item gradient — never into
    the reported RMSE, matching ``_rmse_of``)."""
    use_bias = variant in ("biassgd", "svdpp")
    use_implicit = variant == "svdpp"
    state = [f"u{a}f{j}" for a in range(2) for j in range(d)]
    state += [f"v{b}f{j}" for b in range(3) for j in range(d)]
    if use_bias:
        state += [f"u{a}bu" for a in range(2)]
        state += [f"v{b}bi" for b in range(3)]
    consts = list(_rating_cols())
    if use_bias:
        consts.append("mu")
    if loss == "logistic":
        consts += ["lo", "span"]

    init: dict[str, str] = {}
    for a in range(2):
        for j in range(d):
            init[f"u{a}f{j}"] = _hinit(f"u{a}", j)
        if use_bias:
            init[f"u{a}bu"] = "0.0"
    for b in range(3):
        for j in range(d):
            init[f"v{b}f{j}"] = _hinit(f"i{b}", j)
        if use_bias:
            init[f"v{b}bi"] = "0.0"
    init.update(_rating_cols())

    ctes = _fixture_ctes(ratings_sql)
    ctes.append(
        "s0pre AS (SELECT "
        + ", ".join(f"{e} AS {c}" for c, e in init.items())
        + " FROM ids)"
    )
    rs = [f"r{a}{b}" for a in range(2) for b in range(3)]
    derived = []
    if use_bias:
        derived.append("(" + " + ".join(rs) + ") / 6.0 AS mu")
    if loss == "logistic":
        lo = f"least({', '.join(rs)})"
        hi = f"greatest({', '.join(rs)})"
        derived.append(f"{lo} AS lo")
        derived.append(f"greatest({hi} - {lo}, 1e-12) AS span")
    ctes.append(
        "s0 AS (SELECT *"
        + ("".join(", " + x for x in derived))
        + " FROM s0pre)"
    )

    # implicit per user (epoch-start; identical for both fixture users
    # since each rates all three items): imp_j = Σ_b v{b}f{j} / √3
    def imp(j: int) -> str:
        return f"imp{j}"

    def pred(a: int, b: int, with_imp: bool) -> str:
        terms = []
        for j in range(d):
            uterm = f"(u{a}f{j} + {imp(j)})" if with_imp else f"u{a}f{j}"
            terms.append(f"{uterm} * v{b}f{j}")
        dot = " + ".join(terms)
        if use_bias:
            return f"(mu + {dot} + u{a}bu + v{b}bi)"
        return f"({dot})"

    cur = "s0"
    step = 0
    rmse_rows = []
    for e in range(iterations):
        g = gamma * (step_dec ** e)
        consts_e = list(consts)
        if use_implicit:
            imps = ", ".join(
                f"(v0f{j} + v1f{j} + v2f{j}) / sqrt(3.0) AS imp{j}"
                for j in range(d)
            )
            ctes.append(f"e{e} AS (SELECT *, {imps} FROM {cur})")
            cur = f"e{e}"
            consts_e += [f"imp{j}" for j in range(d)]
        for a in range(2):
            for b in range(3):
                step += 1
                pa, pb, nxt = f"p{step}a", f"p{step}b", f"t{step}"
                ctes.append(
                    f"{pa} AS (SELECT *, "
                    f"{pred(a, b, use_implicit)} AS pr FROM {cur})"
                )
                if loss == "square":
                    ge = f"r{a}{b} - pr"
                elif loss == "abs":
                    ge = f"sign(r{a}{b} - pr)"
                else:  # logistic
                    sig = "(1.0 / (1.0 + exp(-pr)))"
                    ge = (
                        f"((r{a}{b} - lo) / span - {sig})"
                        f" * {sig} * (1.0 - {sig})"
                    )
                ctes.append(f"{pb} AS (SELECT *, {ge} AS ge FROM {pa})")
                upd = {}
                for j in range(d):
                    upd[f"u{a}f{j}"] = (
                        f"u{a}f{j} + {g} * (ge * v{b}f{j} - {lam} * u{a}f{j})"
                    )
                    gu_eff = (
                        f"(u{a}f{j} + {imp(j)})" if use_implicit else f"u{a}f{j}"
                    )
                    upd[f"v{b}f{j}"] = (
                        f"v{b}f{j} + {g} * (ge * {gu_eff} - {lam} * v{b}f{j})"
                    )
                if use_bias:
                    upd[f"u{a}bu"] = f"u{a}bu + {g} * (ge - {lam} * u{a}bu)"
                    upd[f"v{b}bi"] = f"v{b}bi + {g} * (ge - {lam} * v{b}bi)"
                # the epoch's last step drops the imp columns
                keep = consts if (a, b) == (1, 2) else consts_e
                cols = ", ".join(
                    f"{upd[c]} AS {c}" if c in upd else c for c in state + keep
                )
                ctes.append(f"{nxt} AS (SELECT {cols} FROM {pb})")
                cur = nxt
        if loss == "logistic":
            final = (
                lambda a, b: f"(lo + span / "
                f"(1.0 + exp(-{pred(a, b, False)})))"
            )
        else:
            final = lambda a, b: pred(a, b, False)  # noqa: E731
        sq = " + ".join(
            f"pow(r{a}{b} - {final(a, b)}, 2)"
            for a in range(2)
            for b in range(3)
        )
        rmse_rows.append(
            f"SELECT CAST({e} AS INT) AS iter, "
            f"round(sqrt(({sq}) / 6.0), {ndigits}) AS train_rmse FROM {cur}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rmse_rows)


def biassgd2_logistic_fixture_sql(
    ratings_sql: str,
    d: int = 2,
    iterations: int = 2,
    gamma: float = 0.05,
    lam: float = 0.065,
    step_dec: float = 1.0,
    ndigits: int = 4,
) -> str:
    return sgd_variant_fixture_sql(
        ratings_sql, "biassgd", "logistic", d, iterations, gamma, lam,
        step_dec, ndigits,
    )


def _fm_unrolled_sql(
    ratings_sql: str,
    row_feats,  # {(a, b): tuple of tags, any length}
    id_exprs: dict[str, str],  # tag -> SQL expr for its global feature id
    d: int,
    iterations: int,
    gamma,  # scalar, or a per-position rate list (sparse_gensgd)
    lam: float,
    step_dec: float,
    ndigits: int,
    sparsity: int | None = None,
) -> str:
    """Shared FM unroller (``cf/fm.py`` kernel, num_blocks=1): per row
    s = Σ_f v_f, pred = w0 + Σ w_f + ½(‖s‖² − Σ‖v_f‖²), PREQUENTIAL
    sse += e² before the row's update, w0 updated first, then each
    feature from pre-row values. The reported RMSE is the epoch's
    accumulated sse — threaded through the steps as an `sse` column.
    ``gamma`` may be a per-position rate list and ``sparsity`` a
    top-s hard-threshold applied to every factor vector after each
    sweep (the sparse_fm behaviors)."""
    rates = list(gamma) if isinstance(gamma, (list, tuple)) else [gamma]
    tags = list(id_exprs)
    state = [f"{t}v{j}" for t in tags for j in range(d)]
    state += [f"{t}w" for t in tags] + ["w0", "sse"]
    consts = list(_rating_cols())

    init: dict[str, str] = {}
    for t, ide in id_exprs.items():
        for j in range(d):
            init[f"{t}v{j}"] = f"0.1 * {_hinit(ide, j)}"
        init[f"{t}w"] = "0.0"
    init.update(_rating_cols())

    ctes = _fixture_ctes(ratings_sql)
    ctes.append(
        "s0pre AS (SELECT "
        + ", ".join(f"{e} AS {c}" for c, e in init.items())
        + " FROM ids)"
    )
    rs = [f"r{a}{b}" for a in range(2) for b in range(3)]
    ctes.append(
        f"s0 AS (SELECT *, ({' + '.join(rs)}) / 6.0 AS w0, 0.0 AS sse"
        " FROM s0pre)"
    )

    def emit(cur: str, nxt: str, upd: dict[str, str]) -> None:
        cols = ", ".join(
            f"{upd[c]} AS {c}" if c in upd else c for c in state + consts
        )
        ctes.append(f"{nxt} AS (SELECT {cols} FROM {cur})")

    cur = "s0"
    step = 0
    rmse_rows = []
    for e in range(iterations):
        dec = step_dec ** e
        emit(cur, f"z{e}", {"sse": "0.0"})
        cur = f"z{e}"
        for a in range(2):
            for b in range(3):
                step += 1
                feats = row_feats[(a, b)]
                s_j = [
                    "(" + " + ".join(f"{t}v{j}" for t in feats) + ")"
                    for j in range(d)
                ]
                lin = " + ".join(f"{t}w" for t in feats)
                snorm = " + ".join(f"{s} * {s}" for s in s_j)
                sqn = " + ".join(
                    f"{t}v{j} * {t}v{j}" for t in feats for j in range(d)
                )
                pred = f"(w0 + {lin} + 0.5 * (({snorm}) - ({sqn})))"
                pa, pb, nxt = f"p{step}a", f"p{step}b", f"t{step}"
                ctes.append(f"{pa} AS (SELECT *, {pred} AS pr FROM {cur})")
                ctes.append(
                    f"{pb} AS (SELECT *, r{a}{b} - pr AS ge FROM {pa})"
                )
                g0 = rates[0] * dec
                upd = {
                    "w0": f"w0 + {g0} * (ge - {lam} * w0)",
                    "sse": "sse + ge * ge",
                }
                for k, t in enumerate(feats):
                    g = rates[min(k, len(rates) - 1)] * dec
                    for j in range(d):
                        upd[f"{t}v{j}"] = (
                            f"{t}v{j} + {g} * (ge * ({s_j[j]} - {t}v{j})"
                            f" - {lam} * {t}v{j})"
                        )
                    upd[f"{t}w"] = f"{t}w + {g} * (ge - {lam} * {t}w)"
                emit(pb, nxt, upd)
                cur = nxt
        rmse_rows.append(
            f"SELECT CAST({e} AS INT) AS iter, "
            f"round(sqrt(sse / 6.0), {ndigits}) AS train_rmse FROM {cur}"
        )
        if sparsity is not None and sparsity < d:
            # sweep-end hard threshold: zero every component whose rank
            # by |value| (stable: ties keep the lower index) is >= s
            upd = {}
            for t in tags:
                for j in range(d):
                    beats = " + ".join(
                        f"(CASE WHEN abs({t}v{k}) > abs({t}v{j})"
                        f" OR (abs({t}v{k}) = abs({t}v{j}) AND {k} < {j})"
                        f" THEN 1 ELSE 0 END)"
                        for k in range(d)
                    )
                    upd[f"{t}v{j}"] = (
                        f"CASE WHEN ({beats}) < {sparsity}"
                        f" THEN {t}v{j} ELSE 0.0 END"
                    )
            emit(cur, f"pr{e}", upd)
            cur = f"pr{e}"
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rmse_rows)


def libfm_fixture_sql(
    ratings_sql: str,
    d: int = 2,
    iterations: int = 3,
    gamma: float = 0.01,
    lam: float = 0.01,
    step_dec: float = 0.9,
    ndigits: int = 4,
) -> str:
    """Oracle for ``fm(fixture_with_tbin, feature_cols=['user', 'item',
    'tbin'], d, iterations, num_blocks=1)`` — tbin is positional
    (row mod 2) and fm's column offsets are symbolic in the fixture ids:
    user → id, item → u1+1+item, tbin → u1+1+i2+1+bin."""
    id_exprs = {}
    for a in range(2):
        id_exprs[f"u{a}"] = f"u{a}"
    for b in range(3):
        id_exprs[f"i{b}"] = f"(u1 + 1 + i{b})"
    for c in range(2):
        id_exprs[f"t{c}"] = f"(u1 + 1 + i2 + 1 + {c})"
    row_feats = {
        (a, b): (f"u{a}", f"i{b}", f"t{(a * 3 + b) % 2}")
        for a in range(2)
        for b in range(3)
    }
    return _fm_unrolled_sql(
        ratings_sql, row_feats, id_exprs, d, iterations, gamma, lam,
        step_dec, ndigits,
    )


def sparse_fm_fixture(spark: SparkSession, ratings: DataFrame) -> DataFrame:
    """sparse-input fixture: the 6 base rows with VARIABLE-LENGTH global
    feature-id lists — [user, item'] for every row, plus an extra
    feature (two distinct ids) on 4 of the 6 rows. item' = u1+1+item,
    extra c = u1+1+i2+1+c (disjoint id ranges, like fm's offsets)."""
    us = [int(r[0]) for r in ratings.select("user").distinct().orderBy("user").limit(2).collect()]
    its = [int(r[0]) for r in ratings.select("item").distinct().orderBy("item").limit(3).collect()]
    off_i = us[1] + 1
    off_x = us[1] + 1 + its[2] + 1
    rows = []
    for a, u in enumerate(us):
        for b, i in enumerate(its):
            t = a * 3 + b
            feats = [u, off_i + i]
            if t % 3 != 2:
                feats.append(off_x + (t % 2))
            rows.append((1.0 + float((u * 3 + i * 7) % 4), feats))
    return spark.createDataFrame(rows, "rating double, features array<long>")


def sparse_gensgd_fixture_sql(
    ratings_sql: str,
    d: int = 2,
    iterations: int = 2,
    rates: tuple = (0.01, 0.01, 0.01),
    lam: float = 0.01,
    sparsity: int = 1,
    step_dec: float = 0.9,
    ndigits: int = 4,
) -> str:
    """Oracle for ``sparse_fm(sparse_fm_fixture(...), d, iterations,
    rates, lam, sparsity, num_blocks=1)`` — variable-length rows,
    per-position rates, sweep-end top-s hard threshold, all unrolled."""
    id_exprs = {}
    for a in range(2):
        id_exprs[f"u{a}"] = f"u{a}"
    for b in range(3):
        id_exprs[f"i{b}"] = f"(u1 + 1 + i{b})"
    for c in range(2):
        id_exprs[f"x{c}"] = f"(u1 + 1 + i2 + 1 + {c})"
    row_feats = {}
    for a in range(2):
        for b in range(3):
            t = a * 3 + b
            feats = [f"u{a}", f"i{b}"]
            if t % 3 != 2:
                feats.append(f"x{t % 2}")
            row_feats[(a, b)] = tuple(feats)
    return _fm_unrolled_sql(
        ratings_sql, row_feats, id_exprs, d, iterations, list(rates), lam,
        step_dec, ndigits, sparsity=sparsity,
    )


def gensgd_fixture_sql(
    ratings_sql: str,
    d: int = 2,
    iterations: int = 2,
    gamma: float = 0.01,
    lam: float = 0.01,
    step_dec: float = 0.9,
    ndigits: int = 4,
) -> str:
    """Oracle for featurize→fm on the fixture (the gensgd pipeline): the
    2 users, 3 items and a positional side feature (seg = user rank)
    dictionary-encode to STATIC global feature ids — users {0,1}, items
    {2,3,4}, seg {5,6} after featurize, re-offset by fm's max-value rule
    to {0,1} / {4,5,6} / {12,13}."""
    id_exprs = {}
    for a in range(2):
        id_exprs[f"u{a}"] = str(a)
    for b in range(3):
        id_exprs[f"i{b}"] = str(4 + b)
    for a in range(2):
        id_exprs[f"g{a}"] = str(12 + a)
    row_feats = {
        (a, b): (f"u{a}", f"i{b}", f"g{a}")
        for a in range(2)
        for b in range(3)
    }
    return _fm_unrolled_sql(
        ratings_sql, row_feats, id_exprs, d, iterations, gamma, lam,
        step_dec, ndigits,
    )


def timesvdpp_fixture_sql(
    ratings_sql: str,
    iterations: int = 2,
    gamma: float = 0.02,
    lam: float = 0.065,
    step_dec: float = 1.0,
    ndigits: int = 4,
) -> str:
    """Oracle for ``sgd(fixture_with_ts, d=1, iterations, gamma,
    variant='timesvdpp', time_col='ts', num_blocks=1)``. d=1 keeps every
    latent a scalar column. State per user: p, bu, x, pu; per item:
    q, bi; per time bin c∈{0,1} (ts = position mod 2): bt, z, pt.
    Mirrors the solver's read-old/read-new order exactly: q/p/x/z/pu
    read epoch-current old values, pt reads the freshly-updated pu; the
    per-user implicit Σq/√n is snapshotted at epoch start; the reported
    RMSE omits the implicit term (matching ``_rmse_of``)."""
    state = []
    for a in range(2):
        state += [f"p{a}", f"bu{a}", f"x{a}", f"pu{a}"]
    for b in range(3):
        state += [f"q{b}", f"bi{b}"]
    for c in range(2):
        state += [f"bt{c}", f"z{c}", f"pt{c}"]
    consts = list(_rating_cols()) + ["mu"]

    init: dict[str, str] = {}
    for a in range(2):
        init[f"p{a}"] = _hinit(f"u{a}", 0)
        init[f"bu{a}"] = "0.0"
        # x/pu: _init_factors(user, 2d) scaled by 0.1 → components j=0,1
        init[f"x{a}"] = f"0.1 * {_hinit(f'u{a}', 0)}"
        init[f"pu{a}"] = f"0.1 * {_hinit(f'u{a}', 1)}"
    for b in range(3):
        init[f"q{b}"] = _hinit(f"i{b}", 0)
        init[f"bi{b}"] = "0.0"
    for c in range(2):
        init[f"bt{c}"] = "0.0"
        init[f"z{c}"] = f"0.1 * {_hinit(str(c), 0)}"
        init[f"pt{c}"] = f"0.1 * {_hinit(str(c), 1)}"
    init.update(_rating_cols())

    ctes = _fixture_ctes(ratings_sql)
    ctes.append(
        "s0pre AS (SELECT "
        + ", ".join(f"{e} AS {c}" for c, e in init.items())
        + " FROM ids)"
    )
    rs = [f"r{a}{b}" for a in range(2) for b in range(3)]
    ctes.append(
        f"s0 AS (SELECT *, ({' + '.join(rs)}) / 6.0 AS mu FROM s0pre)"
    )

    def ts(a: int, b: int) -> int:
        return (a * 3 + b) % 2

    cur = "s0"
    step = 0
    rmse_rows = []
    for e in range(iterations):
        g = gamma * (step_dec ** e)
        # epoch-start implicit per user: all users rate items 0..2
        imp = "((q0 + q1 + q2) / sqrt(3.0))"
        epoch_cte = f"e{e}"
        ctes.append(f"{epoch_cte} AS (SELECT *, {imp} AS imp FROM {cur})")
        cur = epoch_cte
        consts_e = consts + ["imp"]
        for a in range(2):
            for b in range(3):
                step += 1
                c = ts(a, b)
                pa, pb, pc, nxt = (
                    f"p{step}a", f"p{step}b", f"p{step}c", f"t{step}"
                )
                pred = (
                    f"(mu + bu{a} + bi{b} + bt{c}"
                    f" + (p{a} + imp) * q{b} + x{a} * z{c}"
                    f" + pu{a} * pt{c} * q{b})"
                )
                ctes.append(f"{pa} AS (SELECT *, {pred} AS pr FROM {cur})")
                ctes.append(
                    f"{pb} AS (SELECT *, r{a}{b} - pr AS ge FROM {pa})"
                )
                # pu update precomputed: pt reads the NEW pu
                ctes.append(
                    f"{pc} AS (SELECT *, pu{a} + {g} * (ge * q{b} * pt{c}"
                    f" - {lam} * pu{a}) AS pun FROM {pb})"
                )
                uv = f"((p{a} + imp) + pu{a} * pt{c})"
                upd = {
                    f"q{b}": f"q{b} + {g} * (ge * {uv} - {lam} * q{b})",
                    f"p{a}": f"p{a} + {g} * (ge * q{b} - {lam} * p{a})",
                    f"x{a}": f"x{a} + {g} * (ge * z{c} - {lam} * x{a})",
                    f"z{c}": f"z{c} + {g} * (ge * x{a} - {lam} * z{c})",
                    f"pu{a}": "pun",
                    f"pt{c}": f"pt{c} + {g} * (ge * q{b} * pun - {lam} * pt{c})",
                    f"bt{c}": f"bt{c} + {g} * (ge - {lam} * bt{c})",
                    f"bu{a}": f"bu{a} + {g} * (ge - {lam} * bu{a})",
                    f"bi{b}": f"bi{b} + {g} * (ge - {lam} * bi{b})",
                }
                # last step of the epoch drops imp (recomputed next epoch)
                keep = consts if (a, b) == (1, 2) else consts_e
                cols = ", ".join(
                    f"{upd[cn]} AS {cn}" if cn in upd else cn
                    for cn in state + keep
                )
                ctes.append(f"{nxt} AS (SELECT {cols} FROM {pc})")
                cur = nxt
        # reported RMSE: no implicit term (mirrors _rmse_of)
        sq = " + ".join(
            f"pow(r{a}{b} - (mu + p{a} * q{b} + bu{a} + bi{b}"
            f" + bt{ts(a, b)} + x{a} * z{ts(a, b)}"
            f" + pu{a} * pt{ts(a, b)} * q{b}), 2)"
            for a in range(2)
            for b in range(3)
        )
        rmse_rows.append(
            f"SELECT CAST({e} AS INT) AS iter, "
            f"round(sqrt(({sq}) / 6.0), {ndigits}) AS train_rmse FROM {cur}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rmse_rows)
