"""SGD-family matrix factorization (M3): sgd, biasSGD (+biassgd2 losses),
SVD++, timeSVD++.

Reference updates (per observed rating, learning rate γ, reg λ):
- sgd     (``toolkits/collaborative_filtering/sgd.cpp:121``):
    e = r − uᵀv;  u += γ(e·v − λu);  v += γ(e·u − λv)
- biassgd (``biassgd.cpp:126``): adds μ + b_u + b_i bias terms
- biassgd2 (``biassgd2.cpp:131``): biasSGD under selectable loss —
    square (gradient e), abs (gradient sign(e)), logistic (ratings
    scaled to [0,1], prediction squashed by a sigmoid, gradient
    (r₀₁−σ)·σ·(1−σ)); RMSE is always reported in the original scale.
- svdpp   (``svdpp.cpp:160``): user vector augmented with implicit
    feedback Σ_{j∈N(u)} y_j / sqrt|N(u)|
- timesvdpp (``timesvdpp.cpp:150-171, :261-340``): the full time-evolving
    model — pred = μ + b_u + b_i + b_t + p_eff·q + x_u·z_t + (pu_u∘pt_t)·q,
    where x_u/pu_u are extra user vectors and z_t/pt_t live on the time
    bin; every block updates them with the reference's gradient rules.
    Layout: user [p(d), bu, 1, x(d), pu(d)], item [q(d), 1, bi],
    time bin [bt, z(d), pt(d)]. (The reference's separate p/ptemp pair
    is folded to one vector like svdpp's y→q fold — documented.)

**Documented semantic deviation (SURVEY §2.5 M3):** the reference runs
asynchronous Hogwild-style updates over shared memory. A BSP engine
cannot reproduce per-update interleaving; we run *block-partitioned
epochs with parameter averaging*: ratings are hash-partitioned by user
block, each block runs a deterministic sequential SGD pass over its
rows (sorted), user factors are exact (each user lives in one block),
item factors are averaged across blocks weighted by update count. Same
convergence regime, different trajectories — tests assert RMSE descent,
not per-iteration equality (the reference's own tests do the same:
``unittest.sh`` checks converging RMSE).

Scale: one applyInPandas pass per epoch, shuffle bounded by |ratings| +
|factors|; block count trades parallelism vs averaging noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from graphchi_cpp_spark.cf.als import _init_factors

_OUT_SCHEMA = StructType(
    [
        StructField("kind", StringType()),  # 'user' | 'item'
        StructField("id", LongType()),
        StructField("factors", ArrayType(DoubleType())),
        StructField("n_upd", LongType()),
    ]
)


def auto_num_blocks(
    ratings: DataFrame, target_block_rows: int, floor: int = 8, cap: int = 4096
) -> int:
    """Shared block-count rule for the block-SGD family (sgd/fm/climf/rbm).

    Data-sized (~``target_block_rows`` rows/block) with a parallelism
    floor so small inputs still use every core — but the parallelism
    floor is itself bounded by the data-sized count: on a 1000-executor
    cluster with a small dataset, ``defaultParallelism`` alone would
    mint thousands of near-empty blocks whose per-block applyInPandas
    overhead dominates. Net: floor ≤ blocks ≤ cap, and parallelism only
    raises the count up to what the rows can fill."""
    n = ratings.count()
    par = ratings.sparkSession.sparkContext.defaultParallelism
    data_sized = -(-n // target_block_rows)
    # par may raise the block count above data_sized, but never past one
    # block per ~1000 rows — that's where near-empty-block overhead starts
    par_bounded = min(par, -(-n // 1000)) if n else floor
    return max(floor, min(cap, max(data_sized, par_bounded)))


def sgd(
    ratings: DataFrame,
    d: int = 5,
    iterations: int = 5,
    gamma: float = 0.01,
    lam: float = 0.065,
    num_blocks: int | None = None,
    variant: str = "sgd",
    target_block_rows: int = 50_000,
    loss: str = "square",
    time_col: str | None = None,
    step_dec: float = 1.0,
    validation: DataFrame | None = None,
    halt_on_rmse_increase: bool = False,
) -> tuple[DataFrame, DataFrame, list[dict]]:
    """Returns (user_factors, item_factors, history). variant ∈
    {'sgd','biassgd','svdpp'} (biases folded into factor slots d and d+1
    with companion 1-entries, the standard trick; svdpp additionally
    augments the user vector with implicit feedback Σ_{j∈N(u)} y_j /
    sqrt|N(u)| maintained per-user inside the block pass —
    ``svdpp.cpp:160``).

    ``num_blocks=None`` scales with the data: ~``target_block_rows``
    ratings per block (floor 8 so small inputs still parallelize, cap
    4096). More blocks = more parallelism but noisier item-factor
    averaging — the documented BSP trade against Hogwild.

    ``loss`` ∈ {'square','abs','logistic'} (biassgd2 family — requires a
    bias variant); ``time_col`` holds discrete time bins for timesvdpp.
    """
    if variant not in ("sgd", "biassgd", "svdpp", "timesvdpp"):
        raise ValueError(variant)
    use_bias = variant in ("biassgd", "svdpp", "timesvdpp")
    use_implicit = variant in ("svdpp", "timesvdpp")
    use_time = variant == "timesvdpp"
    if loss not in ("square", "abs", "logistic"):
        raise ValueError(loss)
    if loss != "square" and not use_bias:
        raise ValueError("abs/logistic losses are biassgd2 variants — "
                         "use variant='biassgd'")
    if use_time and time_col is None:
        raise ValueError("timesvdpp needs time_col")

    if num_blocks is None:
        num_blocks = auto_num_blocks(ratings, target_block_rows)

    tcols = (
        [F.col(time_col).cast("long").alias("tbin")]
        if use_time
        else [F.lit(0).cast("long").alias("tbin")]
    )
    r = ratings.select(
        "user", "item", F.col("rating").cast("double"), *tcols,
        F.pmod(F.col("user"), F.lit(num_blocks)).alias("block"),
    ).cache()
    mu = float(r.agg(F.avg("rating")).collect()[0][0]) if use_bias else 0.0
    if loss == "logistic":
        mm = r.agg(F.min("rating").alias("lo"), F.max("rating").alias("hi")).collect()[0]
        r_lo, r_span = float(mm["lo"]), max(float(mm["hi"]) - float(mm["lo"]), 1e-12)
    else:
        r_lo, r_span = 0.0, 1.0

    user_f = _init_factors(r.select("user").distinct(), "user", d)
    item_f = _init_factors(r.select("item").distinct(), "item", d)
    if use_bias:
        pad = lambda col, a, b: F.concat(col, F.array(F.lit(a), F.lit(b)))  # noqa: E731
        user_f = user_f.select("user", pad(F.col("factors"), 0.0, 1.0).alias("factors"))
        item_f = item_f.select("item", pad(F.col("factors"), 1.0, 0.0).alias("factors"))
    if use_time:
        # x/pu start small (reference inits 0.001·rand/D) and nonzero —
        # a zero·zero product term is a saddle the gradient never leaves
        ux = _init_factors(r.select("user").distinct(), "user", 2 * d)
        user_f = user_f.join(
            ux.select(
                "user",
                F.transform("factors", lambda c: c * F.lit(0.1)).alias("_ext"),
            ),
            "user",
        ).select("user", F.concat("factors", "_ext").alias("factors"))
    user_f = user_f.localCheckpoint(eager=True)
    item_f = item_f.localCheckpoint(eager=True)
    if use_time:
        # time-bin state [bt, z(d), pt(d)]
        tzp = _init_factors(r.select("tbin").distinct(), "tbin", 2 * d)
        tb_f = tzp.select(
            "tbin",
            F.concat(
                F.array(F.lit(0.0)),
                F.transform("factors", lambda c: c * F.lit(0.1)),
            ).alias("b"),
        ).localCheckpoint(eager=True)
    else:
        tb_f = (
            r.select("tbin").distinct().select("tbin", F.lit(0.0).alias("b"))
            .localCheckpoint(eager=True)
        )

    history: list[dict] = []
    for it in range(iterations):
        # step decay (reference --*_step_dec): essential for the abs loss,
        # whose sign gradient bounces around the optimum at constant step
        gamma_it = gamma * (step_dec ** it)
        joined = (
            r.join(user_f.select("user", F.col("factors").alias("_uf")), "user")
            .join(item_f.select("item", F.col("factors").alias("_if")), "item")
            .join(tb_f.select("tbin", F.col("b").alias("_tb")), "tbin")
            .select(
                "block", "user", "item", "rating", "tbin", "_tb", "_uf", "_if"
            )
        )

        def run_block(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["user", "item"]).reset_index(drop=True)
            users: dict[int, np.ndarray] = {}
            items: dict[int, np.ndarray] = {}
            item_upd: dict[int, int] = {}
            implicit: dict[int, np.ndarray] = {}
            if use_implicit:
                # Σ y_j / sqrt|N(u)| per user from this block's history;
                # y_j approximated by the item's latent part (svdpp's y
                # vectors folded onto q — the one-vector simplification)
                for uid, grp in pdf.groupby("user"):
                    vecs = np.vstack(grp["_if"].to_numpy())[:, :d]
                    implicit[uid] = vecs.sum(axis=0) / np.sqrt(len(grp))
            # column arrays + index loop: the pass is inherently sequential
            # (each update reads the previous one), but numpy column access
            # beats itertuples' namedtuple construction several-fold
            uids = pdf["user"].to_numpy()
            iids = pdf["item"].to_numpy()
            rts = pdf["rating"].to_numpy()
            tbins = pdf["tbin"].to_numpy()
            tb0 = pdf["_tb"].to_numpy()
            ufs = pdf["_uf"].to_numpy()
            ifs = pdf["_if"].to_numpy()
            times: dict[int, np.ndarray] = {}
            t_upd: dict[int, int] = {}
            for i in range(len(uids)):
                uid, iid = uids[i], iids[i]
                u = users.get(uid)
                if u is None:
                    u = users[uid] = np.array(ufs[i], dtype=float)
                v = items.get(iid)
                if v is None:
                    v = items[iid] = np.array(ifs[i], dtype=float)
                if use_time:
                    # pred = μ + bu + bi + bt + p_eff·q + x·z + (pu∘pt)·q
                    tb = tbins[i]
                    tvec = times.get(tb)
                    if tvec is None:
                        tvec = times[tb] = np.array(tb0[i], dtype=float)
                    p_eff = u[:d] + implicit[uid] if use_implicit else u[:d]
                    x, pu = u[d + 2 : 2 * d + 2], u[2 * d + 2 :]
                    z, pt = tvec[1 : d + 1], tvec[d + 1 :]
                    pred = (
                        mu + u[d] + v[d + 1] + tvec[0]
                        + p_eff @ v[:d] + x @ z + (pu * pt) @ v[:d]
                    )
                elif use_implicit:
                    u_eff = u.copy()
                    u_eff[:d] = u_eff[:d] + implicit[uid]
                    pred = mu + u_eff @ v
                else:
                    pred = mu + u @ v if use_bias else u @ v
                # gradient error under the selected loss (biassgd2 family)
                if loss == "square":
                    ge = rts[i] - pred
                elif loss == "abs":
                    ge = np.sign(rts[i] - pred)
                else:  # logistic on [0,1]-scaled ratings
                    p = 1.0 / (1.0 + np.exp(-pred))
                    ge = ((rts[i] - r_lo) / r_span - p) * p * (1.0 - p)
                if use_bias:
                    gu, gv = u[:d], v[:d]
                    bu, bi = u[d], v[d + 1]
                    gu_eff = gu + implicit[uid] if use_implicit else gu
                    if use_time:
                        # reference gradient rules (timesvdpp.cpp:299-313):
                        # q sees userValue = p_eff + pu∘pt; p/pu/pt/x/z see
                        # the OLD q / each other's old values
                        old_q = gv.copy()
                        user_value = gu_eff + pu * pt
                        gv_new = gv + gamma_it * (ge * user_value - lam * gv)
                        gu_new = gu + gamma_it * (ge * old_q - lam * gu)
                        # x/z swap reads each other's OLD values; pt reads
                        # the freshly-updated pu (x, pu, z, pt are views,
                        # so copy what must stay old — timesvdpp.cpp:308-312)
                        old_x = x.copy()
                        u[d + 2 : 2 * d + 2] = x + gamma_it * (ge * z - lam * x)
                        tvec[1 : d + 1] = z + gamma_it * (ge * old_x - lam * z)
                        u[2 * d + 2 :] = pu + gamma_it * (
                            ge * old_q * pt - lam * pu
                        )
                        tvec[d + 1 :] = pt + gamma_it * (
                            ge * old_q * pu - lam * pt
                        )
                        tvec[0] += gamma_it * (ge - lam * tvec[0])
                        t_upd[tb] = t_upd.get(tb, 0) + 1
                    else:
                        gu_new = gu + gamma_it * (ge * gv - lam * gu)
                        gv_new = gv + gamma_it * (ge * gu_eff - lam * gv)
                    bu += gamma_it * (ge - lam * bu)
                    bi += gamma_it * (ge - lam * bi)
                    u[:d], v[:d] = gu_new, gv_new
                    u[d], v[d + 1] = bu, bi
                else:
                    u_new = u + gamma_it * (ge * v - lam * u)
                    v_new = v + gamma_it * (ge * u - lam * v)
                    u[:], v[:] = u_new, v_new
                item_upd[iid] = item_upd.get(iid, 0) + 1
            out = [("user", k, list(map(float, vec)), 1) for k, vec in users.items()]
            out += [
                ("item", k, list(map(float, vec)), item_upd[k])
                for k, vec in items.items()
            ]
            out += [
                ("tbias", k, list(map(float, vec)), t_upd.get(k, 1))
                for k, vec in times.items()
            ]
            return pd.DataFrame(out, columns=["kind", "id", "factors", "n_upd"])

        updated = joined.groupBy("block").applyInPandas(run_block, _OUT_SCHEMA)
        updated = updated.localCheckpoint(eager=True)
        user_f = (
            updated.filter(F.col("kind") == "user")
            .select(F.col("id").alias("user"), "factors")
            .localCheckpoint(eager=True)
        )
        # items: update-count-weighted average across blocks
        item_rows = updated.filter(F.col("kind") == "item").select(
            F.col("id").alias("item"), "factors", "n_upd"
        )
        item_f = (
            item_rows.select(
                "item", "n_upd", F.posexplode("factors").alias("pos", "x")
            )
            .groupBy("item", "pos")
            .agg(
                (F.sum(F.col("x") * F.col("n_upd")) / F.sum("n_upd")).alias("x")
            )
            .groupBy("item")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "x"))),
                    lambda s: s["x"],
                ).alias("factors")
            )
            .localCheckpoint(eager=True)
        )
        if use_time:
            # time-bin vectors: same update-count-weighted average as items
            tb_f = (
                updated.filter(F.col("kind") == "tbias")
                .select(
                    F.col("id").alias("tbin"), "n_upd",
                    F.posexplode("factors").alias("pos", "x"),
                )
                .groupBy("tbin", "pos")
                .agg(
                    (F.sum(F.col("x") * F.col("n_upd")) / F.sum("n_upd")).alias("x")
                )
                .groupBy("tbin")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "x"))),
                        lambda s: s["x"],
                    ).alias("b")
                )
                .localCheckpoint(eager=True)
            )
        def _dot_slices(a, astart, b, bstart, n):
            # 1-indexed slice dot product, all JVM-side
            return F.aggregate(
                F.zip_with(
                    F.slice(a, astart, n), F.slice(b, bstart, n),
                    lambda xx, yy: xx * yy,
                ),
                F.lit(0.0),
                lambda acc, xx: acc + xx,
            )

        def _rmse_of(dataset: DataFrame) -> float:
            j = (
                dataset.join(
                    user_f.select("user", F.col("factors").alias("_uf")), "user"
                )
                .join(item_f.select("item", F.col("factors").alias("_if")), "item")
            )
            if use_time:
                # explicit slice arithmetic — u and v have different
                # lengths here, so the whole-array zip dot doesn't apply
                j = j.join(tb_f.select("tbin", F.col("b").alias("_tb")),
                           "tbin", "left")
                tf = F.coalesce(
                    F.col("_tb"), F.array_repeat(F.lit(0.0), 2 * d + 1)
                )
                u, v = F.col("_uf"), F.col("_if")
                pred = (
                    F.lit(mu)
                    + _dot_slices(u, 1, v, 1, d)              # p·q
                    + u[d] + v[d + 1] + tf[0]                 # bu + bi + bt
                    + _dot_slices(u, d + 3, tf, 2, d)         # x·z
                    + F.aggregate(                            # (pu∘pt)·q
                        F.zip_with(
                            F.zip_with(
                                F.slice(u, 2 * d + 3, d),
                                F.slice(tf, d + 2, d),
                                lambda xx, yy: xx * yy,
                            ),
                            F.slice(v, 1, d),
                            lambda xx, yy: xx * yy,
                        ),
                        F.lit(0.0),
                        lambda acc, xx: acc + xx,
                    )
                )
                preds = j.select("rating", "tbin", pred.alias("prediction"))
            else:
                preds = j.select(
                    "rating",
                    "tbin",
                    F.aggregate(
                        F.zip_with("_uf", "_if", lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("prediction"),
                )
                if use_bias:
                    preds = preds.withColumn(
                        "prediction", F.col("prediction") + mu
                    )
            if loss == "logistic":
                # report RMSE in the original rating scale
                preds = preds.withColumn(
                    "prediction",
                    F.lit(r_lo)
                    + F.lit(r_span) / (F.lit(1.0) + F.exp(-F.col("prediction"))),
                )
            v = preds.agg(
                F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"), 2)))
            ).collect()[0][0]
            # diverged runs overflow to NaN/null — report inf so the
            # early-stop comparison still fires
            if v is None or (isinstance(v, float) and np.isnan(v)):
                return float("inf")
            return float(v)

        row = {"iter": it, "train_rmse": _rmse_of(r.select("user", "item", "rating", "tbin"))}
        if validation is not None:
            # reference rmse_engine: score the held-out set with current
            # factors (pairs with unseen users/items are skipped)
            vset = validation.select(
                "user", "item", F.col("rating").cast("double"), *tcols
            )
            row["validation_rmse"] = _rmse_of(vset)
            diverged = not np.isfinite(row["validation_rmse"])
            increased = history and row["validation_rmse"] > history[-1].get(
                "validation_rmse", float("inf")
            )
            if halt_on_rmse_increase and (diverged or increased):
                history.append(row)
                break
        history.append(row)
    return user_f, item_f, history
