"""CLiMF (M9) — collaborative less-is-more filtering: learns latent
factors that maximize a smoothed reciprocal-rank lower bound over each
user's RELEVANT items (Shi et al., RecSys 2012).

Reference: ``toolkits/collaborative_filtering/climf.cpp:93`` — per user
with ≥2 relevant items, gradients over item pairs:

    dV_j = g(−f_j)·1 − λV_j + Σ_{k≠j} dg(f_j−f_k)·
           (1/(1−g(f_k−f_j)) − 1/(1−g(f_j−f_k)))·U
    dU  = −λU + Σ_j [ g(−f_j)·V_j + Σ_{k≠j} (V_j−V_k)·dg(f_k−f_j)/(1−g(f_k−f_j)) ]

with g = sigmoid, f_j = U·V_j; per-iteration step decay
(``sgd_step_dec``); the reported metric is the smoothed-MRR training
objective (MAXIMIZED — ascending history, unlike the RMSE families).

Same block-epoch BSP deviation as cf/sgd.py: users are exact (one block
owns a user), item vectors update in place within a block's sequential
pass (the reference's admittedly non-thread-safe in-place writes) and are
update-count-averaged across blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.cf.als import _init_factors
from graphchi_cpp_spark.cf.sgd import _OUT_SCHEMA, auto_num_blocks


def _sig(x: float) -> float:
    return 1.0 / (1.0 + np.exp(-x))


def climf(
    ratings: DataFrame,
    d: int = 5,
    iterations: int = 5,
    gamma: float = 0.01,
    lam: float = 0.001,
    relevance_threshold: float = 4.0,
    num_blocks: int | None = None,
    target_block_rows: int = 50_000,
    step_dec: float = 0.9,
) -> tuple[DataFrame, DataFrame, list[dict]]:
    """Returns (user_factors, item_factors, history) with history rows
    {iter, objective} — the smoothed-MRR lower bound, ascending."""
    if num_blocks is None:
        num_blocks = auto_num_blocks(ratings, target_block_rows)

    rel = (
        ratings.filter(F.col("rating") >= relevance_threshold)
        .select(
            "user", "item",
            F.pmod(F.col("user"), F.lit(num_blocks)).alias("block"),
        )
        .cache()
    )
    user_f = _init_factors(rel.select("user").distinct(), "user", d).localCheckpoint(
        eager=True
    )
    item_f = _init_factors(rel.select("item").distinct(), "item", d).localCheckpoint(
        eager=True
    )

    history: list[dict] = []
    for it in range(iterations):
        gamma_it = gamma * (step_dec ** it)

        def run_block(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["user", "item"]).reset_index(drop=True)
            items: dict[int, np.ndarray] = {}
            item_upd: dict[int, int] = {}
            out_users: dict[int, np.ndarray] = {}
            objective = 0.0
            for uid, grp in pdf.groupby("user", sort=True):
                U = np.array(grp["_uf"].iloc[0], dtype=float)
                iids = grp["item"].to_numpy()
                V = []
                for t, iid in enumerate(iids):
                    v = items.get(iid)
                    if v is None:
                        v = items[iid] = np.array(grp["_if"].iloc[t], dtype=float)
                    V.append(v)
                ni = len(iids)
                f = [float(U @ V[j]) for j in range(ni)]
                # objective scores from EPOCH-START factors (grp columns,
                # untouched by this block's in-place item writes): the
                # reported objective at iteration t is then a pure
                # function of the factors entering epoch t — block- and
                # order-independent, and closed-form at t=0
                # (``climf_objective_sql``). Gradients keep the
                # reference's in-place reads (f above).
                f0 = [
                    float(U @ np.asarray(grp["_if"].iloc[j], dtype=float))
                    for j in range(ni)
                ]
                if ni >= 2:
                    # pre-update norm, like the reference's objective init
                    obj = -0.5 * lam * float(U @ U)
                    dU = -lam * U
                    for j in range(ni):
                        dVj = _sig(-f[j]) * np.ones(d) - lam * V[j]
                        for k in range(ni):
                            if k != j:
                                gjk = _sig(f[j] - f[k])
                                dVj += (
                                    gjk * (1.0 - gjk)
                                    * (
                                        1.0 / (1.0 - _sig(f[k] - f[j]))
                                        - 1.0 / (1.0 - gjk)
                                    )
                                    * U
                                )
                        V[j] += gamma_it * dVj  # in place, visible downstream
                        item_upd[iids[j]] = item_upd.get(iids[j], 0) + 1
                        dU += _sig(-f[j]) * V[j]
                        for k in range(ni):
                            if k != j:
                                gkj = _sig(f[k] - f[j])
                                dU += (V[j] - V[k]) * (gkj * (1.0 - gkj)) / (
                                    1.0 - gkj
                                )
                    U = U + gamma_it * dU
                    # smoothed-MRR objective with the epoch-start scores
                    for j in range(ni):
                        obj += np.log(_sig(f0[j]))
                        for k in range(ni):
                            obj += np.log(1.0 - _sig(f0[k] - f0[j]))
                    objective += obj
                out_users[uid] = U
            out = [
                ("user", k, [float(x) for x in v], 1) for k, v in out_users.items()
            ]
            out += [
                ("item", k, [float(x) for x in v], item_upd.get(k, 1))
                for k, v in items.items()
            ]
            # objective rides along as a pseudo-row (kind='obj')
            out.append(("obj", -1, [float(objective)], 1))
            return pd.DataFrame(out, columns=["kind", "id", "factors", "n_upd"])

        joined = (
            rel.join(user_f.select("user", F.col("factors").alias("_uf")), "user")
            .join(item_f.select("item", F.col("factors").alias("_if")), "item")
            .select("block", "user", "item", "_uf", "_if")
        )
        updated = (
            joined.groupBy("block")
            .applyInPandas(run_block, _OUT_SCHEMA)
            .localCheckpoint(eager=True)
        )
        user_f = (
            updated.filter(F.col("kind") == "user")
            .select(F.col("id").alias("user"), "factors")
            .localCheckpoint(eager=True)
        )
        item_f = (
            updated.filter(F.col("kind") == "item")
            .select(F.col("id").alias("item"), "factors", "n_upd")
            .select("item", "n_upd", F.posexplode("factors").alias("pos", "x"))
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
        objective = (
            updated.filter(F.col("kind") == "obj")
            .agg(F.sum(F.col("factors")[0]))
            .collect()[0][0]
        )
        history.append({"iter": it, "objective": float(objective or 0.0)})
    return user_f, item_f, history


def climf_objective_sql(
    ratings_sql: str,
    d: int = 4,
    lam: float = 0.001,
    relevance_threshold: float = 4.0,
    ndigits: int = 4,
) -> str:
    """DuckDB oracle for ``climf(...)``'s iteration-0 objective row: the
    smoothed-MRR lower bound at the deterministic hash init is a closed
    form — Σ over users with ≥2 relevant items of
    −½λ‖U‖² + Σ_j ln σ(f_j) + Σ_{j,k} ln(1−σ(f_k−f_j)), f = U·V with
    the ``_init_factors`` hash components."""
    u_comps = ", ".join(
        f"((id * {2654435761 + 97 * j} + {12289 * j}) % 100003) / 1000030.0"
        f" AS c{j}"
        for j in range(d)
    )
    dot = " + ".join(f"u.c{j} * v.c{j}" for j in range(d))
    unorm = " + ".join(f"c{j} * c{j}" for j in range(d))
    return f"""
        WITH rel AS MATERIALIZED (
          SELECT "user", item FROM ({ratings_sql})
          WHERE rating >= {relevance_threshold}
        ),
        big AS MATERIALIZED (
          SELECT "user" FROM rel GROUP BY "user" HAVING count(*) >= 2
        ),
        uf AS (
          SELECT id, {u_comps}
          FROM (SELECT DISTINCT "user" AS id FROM rel)
        ),
        vf AS (
          SELECT id, {u_comps}
          FROM (SELECT DISTINCT item AS id FROM rel)
        ),
        scored AS MATERIALIZED (
          SELECT rel."user", rel.item, {dot} AS f
          FROM rel JOIN big USING ("user")
          JOIN uf u ON u.id = rel."user"
          JOIN vf v ON v.id = rel.item
        ),
        point AS (
          SELECT "user", sum(ln(1.0 / (1.0 + exp(-f)))) AS ps
          FROM scored GROUP BY "user"
        ),
        pair AS (
          SELECT a."user",
                 sum(ln(1.0 - 1.0 / (1.0 + exp(-(b.f - a.f))))) AS qs
          FROM scored a JOIN scored b ON a."user" = b."user"
          GROUP BY a."user"
        ),
        reg AS (
          SELECT u.id AS "user", -0.5 * {lam} * ({unorm}) AS rg
          FROM uf u JOIN big ON big."user" = u.id
        )
        SELECT CAST(0 AS INT) AS iter,
               round(sum(ps + qs + rg), {ndigits}) AS objective
        FROM point JOIN pair USING ("user") JOIN reg USING ("user")
    """


def smoothed_mrr(
    user_f: DataFrame, item_f: DataFrame, relevant: DataFrame
) -> DataFrame:
    """(user, smoothed_mrr) — the reference's per-user reported metric
    (``mrr_engine.hpp:46``): Σ_j ln σ(f_j) + Σ_{j,k} ln(1−σ(f_k−f_j))
    over the user's relevant items, in Spark expressions (no UDF)."""
    scored = (
        relevant.select("user", "item")
        .join(user_f.select("user", F.col("factors").alias("_uf")), "user")
        .join(item_f.select("item", F.col("factors").alias("_if")), "item")
        .select(
            "user",
            "item",
            F.aggregate(
                F.zip_with("_uf", "_if", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("f"),
        )
    )
    a = scored.select("user", F.col("f").alias("fj"))
    b = scored.select("user", F.col("f").alias("fk"))
    pair_term = (
        a.join(b, "user")
        .select(
            "user",
            F.log(
                F.lit(1.0) - F.lit(1.0) / (F.lit(1.0) + F.exp(F.col("fj") - F.col("fk")))
            ).alias("t"),
        )
        .groupBy("user")
        .agg(F.sum("t").alias("pair_sum"))
    )
    point_term = scored.groupBy("user").agg(
        F.sum(F.log(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("f"))))).alias("point_sum")
    )
    return point_term.join(pair_term, "user").select(
        "user", (F.col("point_sum") + F.col("pair_sum")).alias("smoothed_mrr")
    )
