"""AdPredictor (T1) — Bayesian online CTR learning (Graepel et al. 2010).

Reference: ``toolkits/classification/adpredictor.cpp:24-28,158,220`` —
message passing on the feature↔impression bipartite graph: each feature
carries a Gaussian weight N(μ, σ²); per impression the label's truncated-
Gaussian message updates every participating feature.

**Documented BSP deviation** (same family as M3): the reference streams
impressions sequentially, updating weights in place. Here each sweep
computes all impression messages against the CURRENT weights and applies
the per-feature AVERAGE update (damped EP / parallel message passing) —
same fixed-point family, different trajectory; tests assert calibration
(separation of positive/negative predictions), not per-step equality.

Everything is JVM-side expressions: Φ and the truncated-Gaussian
correction v(t)=φ(t)/Φ(t) are built from an Abramowitz-Stegun erf
approximation (|err| < 1.5e-7) — no Python in the loop.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

BETA = 1.0  # prior noise, reference default


def _erf(x: Column) -> Column:
    """Abramowitz-Stegun 7.1.26 polynomial erf, extended to negatives."""
    a1, a2, a3, a4, a5 = (
        0.254829592,
        -0.284496736,
        1.421413741,
        -1.453152027,
        1.061405429,
    )
    p = 0.3275911
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(p) * ax)
    poly = (
        F.lit(a1) * t
        + F.lit(a2) * F.pow(t, 2)
        + F.lit(a3) * F.pow(t, 3)
        + F.lit(a4) * F.pow(t, 4)
        + F.lit(a5) * F.pow(t, 5)
    )
    e = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.when(x >= 0, e).otherwise(-e)


def _phi_cdf(x: Column) -> Column:
    return F.lit(0.5) * (F.lit(1.0) + _erf(x / F.lit(math.sqrt(2.0))))


def _phi_pdf(x: Column) -> Column:
    return F.exp(-x * x / F.lit(2.0)) / F.lit(math.sqrt(2.0 * math.pi))


def event_impressions(events: DataFrame) -> DataFrame:
    """Deterministic impressions from the events table: label = purchase,
    features = [user bucket, hour-of-day, value bucket] (disjoint id
    ranges)."""
    from graphchi_cpp_spark.streaming.windows import ts_us_sql

    hour_us = 3_600_000_000
    return events.select(
        F.col("event_id").alias("impression_id"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
        F.array(
            F.pmod(F.col("user_id"), F.lit(50)),
            F.lit(50) + F.pmod(F.expr(f"{ts_us_sql(events)} div {hour_us}"), F.lit(24)),
            F.lit(100)
            + F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)),
        ).alias("features"),
    )


def adpredictor(
    impressions: DataFrame,
    sweeps: int = 3,
    beta: float = BETA,
    damping: float = 1.0,
) -> DataFrame:
    """Train; returns feature weights (feature, mu, sigma2).

    ``impressions``: (impression_id, label∈{0,1}, features array<long>).
    """
    fi = (
        impressions.select(
            "impression_id",
            (F.col("label") * 2 - 1).cast("double").alias("y"),
            F.explode("features").alias("feature"),
        )
        .localCheckpoint(eager=True)
    )
    weights = (
        fi.select("feature")
        .distinct()
        .select("feature", F.lit(0.0).alias("mu"), F.lit(1.0).alias("sigma2"))
        .localCheckpoint(eager=True)
    )

    for _ in range(sweeps):
        j = fi.join(F.broadcast(weights), "feature")
        totals = j.groupBy("impression_id", "y").agg(
            F.sum("mu").alias("S_mu"),
            (F.sum("sigma2") + F.lit(beta * beta)).alias("S_var"),
        )
        t = (F.col("y") * F.col("S_mu")) / F.sqrt(F.col("S_var"))
        totals = totals.select(
            "impression_id",
            "y",
            "S_mu",
            "S_var",
            (_phi_pdf(t) / F.greatest(_phi_cdf(t), F.lit(1e-12))).alias("v"),
        ).withColumn(
            "w", F.col("v") * (F.col("v") + (F.col("y") * F.col("S_mu")) / F.sqrt("S_var"))
        ).drop("S_mu")
        upd = (
            fi.join(F.broadcast(weights), "feature")
            .join(totals, ["impression_id", "y"])
            .select(
                "feature",
                (
                    F.col("y") * (F.col("sigma2") / F.sqrt("S_var")) * F.col("v")
                ).alias("dmu"),
                (
                    F.lit(1.0)
                    - (F.col("sigma2") / F.col("S_var")) * F.col("w")
                ).alias("vfac"),
            )
            .groupBy("feature")
            .agg(F.avg("dmu").alias("dmu"), F.avg("vfac").alias("vfac"))
        )
        weights = (
            weights.join(upd, "feature", "left")
            .select(
                "feature",
                (F.col("mu") + F.lit(damping) * F.coalesce("dmu", F.lit(0.0))).alias(
                    "mu"
                ),
                (
                    F.col("sigma2")
                    * F.greatest(F.coalesce("vfac", F.lit(1.0)), F.lit(1e-6))
                ).alias("sigma2"),
            )
            .localCheckpoint(eager=True)
        )
    return weights


EVENT_IMPRESSIONS_SQL = """
    SELECT event_id AS impression_id,
           CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END
                AS DOUBLE) AS y,
           unnest([
             user_id % 50,
             50 + (epoch_us(ts) // 3600000000) % 24,
             100 + least(CAST(floor("value" / 50) AS BIGINT), 9)
           ]) AS feature
    FROM events
"""


def adpredictor_sql(
    fi_sql: str = EVENT_IMPRESSIONS_SQL,
    sweeps: int = 3,
    beta: float = BETA,
    ndigits: int = 4,
) -> str:
    """DuckDB oracle: the parallel-EP sweeps unrolled, with the SAME
    Abramowitz-Stegun erf polynomial as the Spark side (not DuckDB's
    built-in erf — the approximation error 1.5e-7 could shift the 4th
    rounded digit). ``fi_sql`` yields (impression_id, y∈{-1,1}, feature)
    long-form impressions."""
    b2 = beta * beta
    ctes = [
        f"fi AS MATERIALIZED ({fi_sql})",
        "w0 AS MATERIALIZED (SELECT DISTINCT feature, 0.0 AS mu, "
        "1.0 AS sigma2 FROM fi)",
    ]
    for s in range(1, sweeps + 1):
        p = f"w{s - 1}"
        # lateral column aliases: each expression may reference the ones
        # before it, mirroring the Spark expression chain step by step
        ctes.append(
            f"""tot{s} AS MATERIALIZED (
              SELECT f.impression_id, f.y,
                     sum(w.mu) AS s_mu, sum(w.sigma2) + {b2} AS s_var
              FROM fi f JOIN {p} w ON w.feature = f.feature
              GROUP BY f.impression_id, f.y
            )"""
        )
        ctes.append(
            f"""aug{s} AS MATERIALIZED (
              SELECT impression_id, y, s_var,
                     y * s_mu / sqrt(s_var) AS t_val,
                     t_val / sqrt(2.0) AS x,
                     abs(x) AS ax,
                     1.0 / (1.0 + 0.3275911 * ax) AS tt,
                     0.254829592 * tt - 0.284496736 * pow(tt, 2)
                       + 1.421413741 * pow(tt, 3) - 1.453152027 * pow(tt, 4)
                       + 1.061405429 * pow(tt, 5) AS poly,
                     1.0 - poly * exp(-ax * ax) AS erf_abs,
                     CASE WHEN x >= 0 THEN erf_abs ELSE -erf_abs END AS erf_x,
                     0.5 * (1.0 + erf_x) AS cdf,
                     exp(-t_val * t_val / 2.0) / sqrt(2.0 * pi()) AS pdf,
                     pdf / greatest(cdf, 1e-12) AS v,
                     v * (v + t_val) AS w_corr
              FROM tot{s}
            )"""
        )
        ctes.append(
            f"""upd{s} AS MATERIALIZED (
              SELECT f.feature,
                     avg(f.y * (w.sigma2 / sqrt(a.s_var)) * a.v) AS dmu,
                     avg(1.0 - (w.sigma2 / a.s_var) * a.w_corr) AS vfac
              FROM fi f
              JOIN {p} w ON w.feature = f.feature
              JOIN aug{s} a
                ON a.impression_id = f.impression_id AND a.y = f.y
              GROUP BY f.feature
            )"""
        )
        ctes.append(
            f"""w{s} AS MATERIALIZED (
              SELECT w.feature,
                     w.mu + coalesce(u.dmu, 0.0) AS mu,
                     w.sigma2 * greatest(coalesce(u.vfac, 1.0), 0.000001)
                       AS sigma2
              FROM {p} w LEFT JOIN upd{s} u ON u.feature = w.feature
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT feature, round(mu, {ndigits}) AS mu,
               round(sigma2, {ndigits}) AS sigma2
        FROM w{sweeps}"""
    )


def predict_ctr(impressions: DataFrame, weights: DataFrame, beta: float = BETA) -> DataFrame:
    """(impression_id, label, p) — Φ(Σμ / sqrt(β² + Σσ²))."""
    fi = impressions.select(
        "impression_id", "label", F.explode("features").alias("feature")
    )
    totals = (
        fi.join(F.broadcast(weights), "feature")
        .groupBy("impression_id", "label")
        .agg(F.sum("mu").alias("S_mu"), (F.sum("sigma2") + beta * beta).alias("S_var"))
    )
    return totals.select(
        "impression_id",
        "label",
        _phi_cdf(F.col("S_mu") / F.sqrt("S_var")).alias("p"),
    )
