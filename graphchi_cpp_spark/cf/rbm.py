"""RBM collaborative filtering (M7) — conditional RBM over rating bins,
contrastive divergence CD-1.

Reference: ``toolkits/collaborative_filtering/rbm.cpp:237`` — per item a
bin bias vector bi[bins] (initialized to the log empirical rating
distribution, ``rbm.cpp:254-264``) and a weight matrix w[bins×D]; per
user, hidden activations h = σ(Σ_rated w[r_ui]) with a Bernoulli sample
h0; a reconstruction v1 is drawn from softmax(bi + h0·w), hidden h1
re-sampled from v1, and the CD-1 update per rating

    w[v0] += α·(h0 − β·w[v0]);   w[v1] −= α·(h1 + β·w[v1])

RMSE uses the rating expectation under softmax(bi + h·w)
(``rbm_predict``, ``rbm.cpp:125``), clamped to [minval, maxval].

Block-epoch BSP mapping (cf/sgd.py deviation note applies): users are
exact per block, item states are update-count-averaged across blocks.
Determinism: ``default_rng`` seeded per (user, iteration) replaces the
reference's ``drand48`` (which it seeds with time(NULL) — we strengthen
the determinism contract instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.cf.sgd import _OUT_SCHEMA, auto_num_blocks


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def rbm(
    ratings: DataFrame,
    d: int = 8,
    iterations: int = 3,
    alpha: float = 0.1,
    beta: float = 0.001,
    bins: int = 6,
    scaling: float = 1.0,
    num_blocks: int | None = None,
    target_block_rows: int = 50_000,
) -> tuple[DataFrame, DataFrame, list[dict]]:
    """Returns (user_hidden, item_state, history{iter, train_rmse}).
    ``item_state.factors`` = [bi(bins) ++ w(bins·d)] flattened; user rows
    carry the final hidden activation probabilities h."""
    if num_blocks is None:
        num_blocks = auto_num_blocks(ratings, target_block_rows)

    r = ratings.select(
        "user",
        "item",
        F.col("rating").cast("double"),
        F.least(
            F.floor(F.col("rating") / F.lit(scaling)).cast("int"), F.lit(bins - 1)
        ).alias("bin"),
        F.pmod(F.col("user"), F.lit(num_blocks)).alias("block"),
    ).cache()
    mm = r.agg(F.min("rating").alias("lo"), F.max("rating").alias("hi")).collect()[0]
    minval, maxval = float(mm["lo"]), float(mm["hi"])

    # item init: bi[r] = log(1e-9 + empirical bin share); w = hash-based
    # small weights (the reference's setRand2(., 0.001) with our
    # deterministic-seed strengthening)
    bi0 = (
        r.groupBy("item", "bin").agg(F.count("*").alias("c"))
        .groupBy("item")
        .agg(
            F.map_from_arrays(F.collect_list("bin"), F.collect_list("c")).alias("m"),
            F.sum("c").alias("n"),
        )
        .select(
            "item",
            F.array(
                *[
                    F.log(
                        F.lit(1e-9)
                        + F.coalesce(F.col("m")[b], F.lit(0)) / F.col("n")
                    )
                    for b in range(bins)
                ]
            ).alias("bi"),
        )
    )
    w0 = [
        (
            F.pmod(
                F.col("item") * F.lit(2654435761 + 13 * j) + F.lit(977 * j),
                F.lit(100003),
            )
            / F.lit(100003.0)
            * 0.001
        ).cast("double")
        for j in range(bins * d)
    ]
    item_f = bi0.select(
        "item", F.concat(F.col("bi"), F.array(*w0)).alias("factors")
    ).localCheckpoint(eager=True)

    history: list[dict] = []
    user_f = None
    for it in range(iterations):

        def run_block(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["user", "item"]).reset_index(drop=True)
            items: dict[int, np.ndarray] = {}
            item_upd: dict[int, int] = {}
            out_users = []
            sse, cnt = 0.0, 0
            for uid, grp in pdf.groupby("user", sort=True):
                rng = np.random.default_rng(
                    (int(uid) * 2654435761 + it * 97 + 7) & 0x7FFFFFFF
                )
                iids = grp["item"].to_numpy()
                rbins = grp["bin"].to_numpy()
                rvals = grp["rating"].to_numpy()
                st = []
                for t, iid in enumerate(iids):
                    s = items.get(iid)
                    if s is None:
                        s = items[iid] = np.array(grp["_s"].iloc[t], dtype=float)
                    st.append(s)
                # positive phase: h from observed bins
                hsum = np.zeros(d)
                for t in range(len(iids)):
                    w = st[t][bins:].reshape(bins, d)
                    hsum += w[rbins[t]]
                h = _sigmoid(hsum)
                h0 = (rng.random(d) < h).astype(float)
                # reconstruction: sample v1 per rating from softmax(bi + h0·w)
                v1 = np.empty(len(iids), dtype=int)
                for t in range(len(iids)):
                    bi = st[t][:bins]
                    w = st[t][bins:].reshape(bins, d)
                    zz = np.exp(bi + w @ h0)
                    v1[t] = int(rng.choice(bins, p=zz / zz.sum()))
                # negative phase hidden
                h1sum = np.zeros(d)
                for t in range(len(iids)):
                    w = st[t][bins:].reshape(bins, d)
                    h1sum += w[v1[t]]
                h1 = (rng.random(d) < _sigmoid(h1sum)).astype(float)
                # CD-1 update + rmse with the expectation under h
                for t in range(len(iids)):
                    bi = st[t][:bins]
                    w = st[t][bins:].reshape(bins, d)
                    zz = np.exp(bi + w @ h)
                    pred = float((zz * np.arange(bins)).sum() / zz.sum()) * scaling
                    pred = min(max(pred, minval), maxval)
                    sse += (pred - rvals[t]) ** 2
                    cnt += 1
                    v0 = rbins[t]
                    w[v0] += alpha * (h0 - beta * w[v0])
                    w[v1[t]] -= alpha * (h1 + beta * w[v1[t]])
                    st[t][bins:] = w.reshape(-1)
                    item_upd[iids[t]] = item_upd.get(iids[t], 0) + 1
                out_users.append(("user", uid, [float(x) for x in h], 1))
            out = out_users
            out += [
                ("item", k, [float(x) for x in v], item_upd.get(k, 1))
                for k, v in items.items()
            ]
            out.append(("rmse", -1, [sse, float(cnt)], 1))
            return pd.DataFrame(out, columns=["kind", "id", "factors", "n_upd"])

        joined = r.join(
            item_f.select("item", F.col("factors").alias("_s")), "item"
        ).select("block", "user", "item", "rating", "bin", "_s")
        updated = (
            joined.groupBy("block")
            .applyInPandas(run_block, _OUT_SCHEMA)
            .localCheckpoint(eager=True)
        )
        user_f = updated.filter(F.col("kind") == "user").select(
            F.col("id").alias("user"), "factors"
        )
        item_f = (
            updated.filter(F.col("kind") == "item")
            .select("id", "factors", "n_upd")
            .select(
                F.col("id").alias("item"),
                "n_upd",
                F.posexplode("factors").alias("pos", "x"),
            )
            .groupBy("item", "pos")
            .agg((F.sum(F.col("x") * F.col("n_upd")) / F.sum("n_upd")).alias("x"))
            .groupBy("item")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "x"))),
                    lambda s: s["x"],
                ).alias("factors")
            )
            .localCheckpoint(eager=True)
        )
        agg = (
            updated.filter(F.col("kind") == "rmse")
            .agg(
                F.sum(F.col("factors")[0]).alias("sse"),
                F.sum(F.col("factors")[1]).alias("n"),
            )
            .collect()[0]
        )
        history.append(
            {"iter": it, "train_rmse": float(np.sqrt(agg["sse"] / max(agg["n"], 1.0)))}
        )
    return user_f, item_f, history


def rbm_iter0_sql(
    ratings_sql: str,
    d: int = 6,
    bins: int = 6,
    scaling: float = 1.0,
    ndigits: int = 4,
) -> str:
    """DuckDB oracle for ``rbm(...)``'s iteration-0 RMSE under singleton
    user blocks (``num_blocks`` > max user id): with one user per block,
    no in-place item write is ever visible to another user, so every
    prediction of the first epoch is a closed form of the init —
    h_j(u) = σ(Σ_t w0[item_t, bin_t·d+j]), z_b(u,i) = exp(bi0[i,b] +
    Σ_j w0[i, b·d+j]·h_j), pred = clamp(Σ_b b·z_b/Σ z_b · scaling).
    bi0 is the log empirical bin share, w0 the deterministic hash init
    (both mirrored here symbolically). The RNG draws (h0/v1/h1) only
    feed the CD-1 update, never the epoch's own predictions."""

    def w0(item_expr: str, k_expr: str) -> str:
        # hash-init weight component k of an item, matching the Spark init
        return (
            f"(CAST(({item_expr} * (2654435761 + 13 * ({k_expr}))"
            f" + 977 * ({k_expr})) % 100003 AS DOUBLE) / 100003.0 * 0.001)"
        )

    h_cols = ", ".join(
        "1.0 / (1.0 + exp(-sum(" + w0("item", f"bin * {d} + {j}") + f"))) AS h{j}"
        for j in range(d)
    )
    bi_cols = ", ".join(
        f"ln(1e-9 + sum(CASE WHEN bin = {b} THEN 1 ELSE 0 END)"
        f" / CAST(count(*) AS DOUBLE)) AS bi{b}"
        for b in range(bins)
    )
    z_exprs = [
        f"exp(bi.bi{b} + "
        + " + ".join(w0("r.item", str(b * d + j)) + f" * h.h{j}" for j in range(d))
        + f") AS z{b}"
        for b in range(bins)
    ]
    z_num = " + ".join(f"{b} * z{b}" for b in range(bins))
    z_den = " + ".join(f"z{b}" for b in range(bins))
    return f"""
        WITH r AS MATERIALIZED (
          SELECT "user", item, CAST(rating AS DOUBLE) AS rating,
                 least(CAST(floor(rating / {scaling}) AS INT), {bins - 1}) AS bin
          FROM ({ratings_sql})
        ),
        mm AS (SELECT min(rating) AS lo, max(rating) AS hi FROM r),
        h AS MATERIALIZED (
          SELECT "user", {h_cols} FROM r GROUP BY "user"
        ),
        bi AS MATERIALIZED (
          SELECT item, {bi_cols} FROM r GROUP BY item
        ),
        z AS (
          SELECT r.rating, {", ".join(z_exprs)}
          FROM r JOIN h ON h."user" = r."user" JOIN bi ON bi.item = r.item
        ),
        pred AS (
          SELECT rating,
                 greatest(mm.lo, least(mm.hi,
                   ({z_num}) / ({z_den}) * {scaling})) AS p
          FROM z, mm
        )
        SELECT CAST(0 AS INT) AS iter,
               round(sqrt(avg(pow(rating - p, 2))), {ndigits}) AS train_rmse
        FROM pred
    """
