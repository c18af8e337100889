"""Factorization machines (M8) — libFM / gensgd-style SGD over arbitrary
feature columns.

References: ``toolkits/collaborative_filtering/libfm.cpp:176`` (FM with
user/item/time/last-item fields), ``gensgd.cpp:761`` (generalized SGD
over arbitrary feature columns parsed from the input — the "fields"
idea). The FM model over binary feature indicators x:

    ŷ = w0 + Σ_f w_f + Σ_{f<f'} ⟨v_f, v_f'⟩
       = w0 + Σ w_f + ½(‖s‖² − Σ‖v_f‖²),  s = Σ_f v_f

Per-rating SGD (e = r − ŷ): w0 += γ(e − λw0); w_f += γ(e − λw_f);
v_f += γ(e·(s − v_f) − λv_f).

Spark mapping mirrors gensgd's arbitrary-column design: callers pass any
list of feature columns; each column's values are offset into one global
feature-id space (driver computes per-column offsets from max values —
one tiny agg). Training uses the cf/sgd.py block-epoch pattern: the
first feature column partitions blocks, cross-block features (items,
time bins, …) are update-count-averaged. Deterministic hash init.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.cf.als import _init_factors
from graphchi_cpp_spark.cf.sgd import auto_num_blocks
from graphchi_cpp_spark.cf.sgd import _OUT_SCHEMA


def featurize(
    df: DataFrame,
    categorical: list[str],
    buckets: dict[str, float] | None = None,
    side_tables: list[tuple[DataFrame, str, str]] | None = None,
    window_limit: int = 10_000_000,
) -> tuple[DataFrame, DataFrame]:
    """gensgd's input-parsing DSL (``gensgd.cpp:28``, ``:84-105``,
    ``:383-460``) re-expressed relationally — the reference builds
    string→dense-id dictionaries per column (``string2nodeid``), marks
    numeric columns as ``real_features``, and joins per-entity feature
    files; here:

    - ``categorical``: arbitrary string/numeric columns, dictionary-
      encoded into disjoint contiguous feature-id ranges (vocab =
      ``row_number() over (order by value)`` per column — deterministic
      and identical to SQL ``dense_rank`` over the distinct values).
    - ``buckets``: continuous columns discretized by width
      (``real_features`` analog: {col: width} → floor(col/width) bins,
      then dictionary-encoded like any categorical).
    - ``side_tables``: (table, df_key, table_key) triples — the
      ``--user_file``/``--item_file`` per-entity feature files; every
      non-key column of the (pre-projected) table joins in as an extra
      categorical feature. Inner join: rows without side features are
      dropped, matching the reference's hard assert on unknown ids.

    Returns (featurized df: original columns + ``_feat_0.._feat_{k-1}``
    global feature ids, vocab mapping (column, value, feature_id)).

    Scale: vocabs are per-column DISTINCT aggregates (map-side
    combinable); the encode joins broadcast (vocab ≪ data). Vocab ids
    come from a global ``row_number`` window while the vocab fits one
    executor (``window_limit``); above that, a distributed sort +
    ``zipWithIndex`` assigns the identical value-ordered contiguous
    codes without the single-partition bottleneck.
    """
    from pyspark.sql import Window

    buckets = buckets or {}
    work = df
    extra_cols: list[str] = []
    for tbl, lkey, rkey in side_tables or []:
        # bucket-source columns join in but are encoded by their bin,
        # not as raw categoricals
        cols = [c for c in tbl.columns if c != rkey and c not in buckets]
        work = work.join(F.broadcast(tbl.withColumnRenamed(rkey, lkey)), lkey)
        extra_cols += cols

    specs = [(c, F.col(c)) for c in list(categorical) + extra_cols]
    specs += [
        (c, F.floor(F.col(c) / F.lit(float(w))).cast("long"))
        for c, w in buckets.items()
    ]

    # materialize the side-joined table once: every vocab below runs its
    # own DISTINCT scan over it (and the final encode reads it again) —
    # lazily, each of those re-executed the side-table joins
    work = work.localCheckpoint(eager=True)

    # Build ALL vocabs in one pass per value TYPE instead of one full
    # work-scan + window job per column: explode the columns of a type
    # group into (column-index, value) rows, distinct once, then assign
    # the per-column value-ordered contiguous codes with ONE window
    # partitioned by column index. Per-column ordering (and therefore
    # every code) is identical to the per-column row_number; only the
    # number of passes over `work` changes (k scans -> one per type
    # group). Grouping by exact Spark type is what lets the values share
    # an array without a semantics-changing cast.
    probe_fields = work.select(
        *[expr.alias(f"_p_{i}") for i, (_n, expr) in enumerate(specs)]
    ).schema.fields  # analysis only, no job
    groups: dict[str, list[int]] = {}
    for i, fld in enumerate(probe_fields):
        groups.setdefault(fld.dataType.simpleString(), []).append(i)

    vocabs: list[DataFrame | None] = [None] * len(specs)
    sizes: list[int] = [0] * len(specs)
    for idxs in groups.values():
        combined = (
            work.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("ci"),
                                specs[i][1].alias("val"),
                            )
                            for i in idxs
                        ]
                    )
                ).alias("x")
            )
            .select("x.ci", "x.val")
            .distinct()
            .localCheckpoint(eager=True)
        )
        cnts = {
            r["ci"]: r["count"]
            for r in combined.groupBy("ci").count().collect()
        }
        small = [i for i in idxs if cnts.get(i, 0) <= window_limit]
        if small:
            voc = (
                combined.where(F.col("ci").isin(small))
                .withColumn(
                    "code",
                    F.row_number()
                    .over(Window.partitionBy("ci").orderBy("val"))
                    .cast("long")
                    - 1,
                )
                .localCheckpoint(eager=True)
            )
            for i in small:
                vocabs[i] = voc.where(F.col("ci") == i).select("val", "code")
                sizes[i] = int(cnts.get(i, 0))
        for i in idxs:
            if i in small:
                continue
            # Distributed assignment of the same value-ordered contiguous
            # codes, JVM-only (guide §4: the former ``rdd.zipWithIndex``
            # pickled every distinct value out to Python row-at-a-time and
            # re-serialized the result through ``createDataFrame`` — one
            # full cross-engine round trip per wide column at 100 TB):
            # range-partition by value (partition p's values all sort
            # before partition p+1's), collect the per-partition counts
            # (one tiny row per partition), then
            # code = cumulative-offset(pid) + row_number within pid.
            # The mapping is identical for ANY range-boundary placement,
            # so the range partitioner's sampling cannot affect results.
            spark = df.sparkSession
            n_parts = max(
                1, int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
            )
            # lazy: the per-partition count collect below materializes the
            # checkpoint in its own job; the code-assignment join then
            # reads the same blocks (job folding, see checkpoints.py)
            ranged = (
                combined.where(F.col("ci") == i)
                .select("val")
                .repartitionByRange(n_parts, "val")
                .withColumn("_pid", F.spark_partition_id())
                .localCheckpoint(eager=False)
            )
            pid_counts = {
                r["_pid"]: r["cnt"]
                for r in ranged.groupBy("_pid")
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            acc = 0
            off_rows = []
            for pid_ in sorted(pid_counts):
                off_rows.append((pid_, acc))
                acc += pid_counts[pid_]
            off_df = spark.createDataFrame(
                off_rows, "_pid int, _off long"
            )
            vocabs[i] = (
                ranged.join(F.broadcast(off_df), "_pid")
                .withColumn(
                    "code",
                    F.row_number()
                    .over(Window.partitionBy("_pid").orderBy("val"))
                    .cast("long")
                    - 1
                    + F.col("_off"),
                )
                .select("val", "code")
                .localCheckpoint(eager=True)
            )
            sizes[i] = int(cnts.get(i, 0))
    offsets = [sum(sizes[:i]) for i in range(len(sizes))]

    out = work
    mapping_parts = []
    for i, ((name, expr), vocab, off, sz) in enumerate(
        zip(specs, vocabs, offsets, sizes)
    ):
        fcol = f"_feat_{i}"
        code_side = vocab.select(
            F.col("val").alias(f"_v_{i}"),
            (F.col("code") + F.lit(off)).alias(fcol),
        )
        # broadcast only vocabs small enough to materialize on the driver;
        # the >window_limit distributed-zipWithIndex vocabs would blow the
        # broadcast hard limits (8 GB / 512M rows) — let those take a
        # shuffle join, which is the scale path they were built for
        if sz <= window_limit:
            code_side = F.broadcast(code_side)
        out = out.withColumn(f"_v_{i}", expr).join(
            code_side, f"_v_{i}"
        ).drop(f"_v_{i}")
        mapping_parts.append(
            vocab.select(
                F.lit(name).alias("column"),
                F.col("val").cast("string").alias("value"),
                (F.col("code") + F.lit(off)).alias("feature_id"),
            )
        )
    mapping = mapping_parts[0]
    for p in mapping_parts[1:]:
        mapping = mapping.unionByName(p)
    feat_cols = [f"_feat_{i}" for i in range(len(specs))]
    return out.select(*df.columns, *feat_cols), mapping


def fm(
    ratings: DataFrame,
    feature_cols: list[str] | None = None,
    d: int = 5,
    iterations: int = 5,
    gamma: float = 0.01,
    lam: float = 0.01,
    num_blocks: int | None = None,
    target_block_rows: int = 50_000,
    step_dec: float = 0.9,
) -> tuple[DataFrame, list[dict]]:
    """Returns (feature_factors, history). ``feature_factors`` rows:
    (feature, factors array<double>) where factors = [v_1..v_d, w]; the
    global intercept w0 is returned in history[-1]['w0']."""
    feature_cols = feature_cols or ["user", "item"]
    if num_blocks is None:
        num_blocks = auto_num_blocks(ratings, target_block_rows)

    # offset each column into a disjoint global feature-id space
    maxes = ratings.agg(
        *[F.max(F.col(c)).alias(c) for c in feature_cols]
    ).collect()[0]
    offsets, off = {}, 0
    for c in feature_cols:
        offsets[c] = off
        off += int(maxes[c]) + 1

    feats = [
        (F.col(c) + F.lit(offsets[c])).cast("long").alias(f"_feat_{i}")
        for i, c in enumerate(feature_cols)
    ]
    r = ratings.select(
        F.col("rating").cast("double"),
        *feats,
        F.pmod(F.col(feature_cols[0]), F.lit(num_blocks)).alias("block"),
    ).cache()
    mu = float(r.agg(F.avg("rating")).collect()[0][0])

    nf = len(feature_cols)
    feat_ids = r.select(
        F.explode(F.array(*[f"_feat_{i}" for i in range(nf)])).alias("feature")
    ).distinct()
    # factors = [v(d), w] per feature
    feat_f = (
        _init_factors(feat_ids, "feature", d)
        .select(
            "feature",
            F.concat(
                F.transform("factors", lambda x: x * 0.1), F.array(F.lit(0.0))
            ).alias("factors"),
        )
        .localCheckpoint(eager=True)
    )

    w0 = mu  # intercept initialized at the global mean
    history: list[dict] = []
    for it in range(iterations):
        gamma_it = gamma * (step_dec ** it)

        def run_block(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(
                [f"_feat_{i}" for i in range(nf)]
            ).reset_index(drop=True)
            nonlocal_w0 = w0
            states: dict[int, np.ndarray] = {}
            upd: dict[int, int] = {}
            rts = pdf["rating"].to_numpy()
            fcols = [pdf[f"_feat_{i}"].to_numpy() for i in range(nf)]
            fvecs = [pdf[f"_ff_{i}"].to_numpy() for i in range(nf)]
            sse = 0.0
            for i in range(len(rts)):
                xs = []
                for j in range(nf):
                    fid = fcols[j][i]
                    v = states.get(fid)
                    if v is None:
                        v = states[fid] = np.array(fvecs[j][i], dtype=float)
                    xs.append(v)
                s = np.zeros(d)
                lin = 0.0
                sq = 0.0
                for v in xs:
                    s += v[:d]
                    lin += v[d]
                    sq += float(v[:d] @ v[:d])
                pred = nonlocal_w0 + lin + 0.5 * (float(s @ s) - sq)
                e = rts[i] - pred
                sse += e * e
                nonlocal_w0 += gamma_it * (e - lam * nonlocal_w0)
                for j, v in enumerate(xs):
                    grad_v = e * (s - v[:d]) - lam * v[:d]
                    v[:d] = v[:d] + gamma_it * grad_v
                    v[d] += gamma_it * (e - lam * v[d])
                    upd[fcols[j][i]] = upd.get(fcols[j][i], 0) + 1
            out = [
                ("item", k, [float(x) for x in v], upd.get(k, 1))
                for k, v in states.items()
            ]
            out.append(("w0", -1, [float(nonlocal_w0), float(len(rts))], 1))
            out.append(("rmse", -2, [sse, float(len(rts))], 1))
            return pd.DataFrame(out, columns=["kind", "id", "factors", "n_upd"])

        joined = r
        for i in range(nf):
            joined = joined.join(
                feat_f.select(
                    F.col("feature").alias(f"_feat_{i}"),
                    F.col("factors").alias(f"_ff_{i}"),
                ),
                f"_feat_{i}",
            )
        updated = (
            joined.groupBy("block")
            .applyInPandas(run_block, _OUT_SCHEMA)
            .localCheckpoint(eager=True)
        )
        feat_f = (
            updated.filter(F.col("kind") == "item")
            .select(F.col("id").alias("feature"), "factors", "n_upd")
            .select(
                "feature", "n_upd", F.posexplode("factors").alias("pos", "x")
            )
            .groupBy("feature", "pos")
            .agg((F.sum(F.col("x") * F.col("n_upd")) / F.sum("n_upd")).alias("x"))
            .groupBy("feature")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "x"))),
                    lambda s: s["x"],
                ).alias("factors")
            )
            .localCheckpoint(eager=True)
        )
        aggs = updated.filter(F.col("kind").isin("w0", "rmse")).collect()
        w0_rows = [a for a in aggs if a["kind"] == "w0"]
        rmse_rows = [a for a in aggs if a["kind"] == "rmse"]
        w0 = float(
            sum(a["factors"][0] * a["factors"][1] for a in w0_rows)
            / max(sum(a["factors"][1] for a in w0_rows), 1.0)
        )
        sse = sum(a["factors"][0] for a in rmse_rows)
        cnt = sum(a["factors"][1] for a in rmse_rows)
        history.append(
            {
                "iter": it,
                "train_rmse": float(np.sqrt(sse / max(cnt, 1.0))),
                "w0": w0,
            }
        )
    return feat_f, history


def _hard_threshold(factors_col, d: int, s: int):
    """Keep the top-``s`` components of a length-(d+1) FM factor array
    [v_0..v_{d-1}, w] by |value| (w untouched), zeroing the rest — JVM
    expressions only. Stable tie-break (equal magnitudes keep the lower
    index), matching ``np.argsort(-abs)``."""
    idx = F.sequence(F.lit(0), F.lit(d - 1))
    v = F.slice(factors_col, 1, d)

    def rank_lt_s(x, j):
        # components strictly larger, or equal with a lower index
        beats = F.zip_with(
            v,
            idx,
            lambda y, k: F.when(
                (F.abs(y) > F.abs(x))
                | ((F.abs(y) == F.abs(x)) & (k < j)),
                1,
            ).otherwise(0),
        )
        return (
            F.aggregate(beats, F.lit(0), lambda acc, z: acc + z) < F.lit(s)
        )

    pruned = F.zip_with(
        v, idx, lambda x, j: F.when(rank_lt_s(x, j), x).otherwise(F.lit(0.0))
    )
    return F.concat(pruned, F.slice(factors_col, d + 1, 1))


def sparse_fm(
    ratings: DataFrame,
    d: int = 5,
    iterations: int = 5,
    rates: tuple = (0.01, 0.01, 0.01),
    lam: float = 0.01,
    sparsity: int | None = None,
    num_blocks: int | None = None,
    target_block_rows: int = 50_000,
    step_dec: float = 0.9,
) -> tuple[DataFrame, list[dict]]:
    """sparse_gensgd (M8, ``sparse_gensgd.cpp:834``): the FM kernel over
    VARIABLE-LENGTH sparse feature-id lists — each row carries a
    ``features array<long>`` column (the reference's libsvm-style rows
    whose edges store per-rating feature/index arrays) instead of fixed
    feature columns. Two reference behaviors distinguish it from
    ``fm``:

    - per-POSITION learning rates (``gensgd_rate1/2/3``,
      ``sparse_gensgd.cpp:868-874``): position 0 (user) uses rates[0],
      position 1 (item) rates[1], every later feature rates[-1]; the
      global intercept moves at rates[0] (``:856``).
    - optional ``sparsity``: after each sweep, every factor vector is
      hard-thresholded to its top-``sparsity`` components by magnitude
      (the CoSaMP-style support pruning of ``als_variants._cosamp``
      applied sweep-wise, per the sparse-factor reading of the variant).

    Blocks partition on ``features[0]`` (the user-like leading id);
    cross-block features are update-count-averaged as in ``fm``.
    Returns (feature_factors, history with prequential train_rmse)."""
    if num_blocks is None:
        num_blocks = auto_num_blocks(ratings, target_block_rows)

    r = (
        ratings.select(
            F.col("rating").cast("double"),
            F.col("features").cast("array<long>"),
            F.pmod(F.col("features")[0], F.lit(num_blocks)).alias("block"),
        )
        .withColumn("_rid", F.monotonically_increasing_id())
        .cache()
    )
    mu = float(r.agg(F.avg("rating")).collect()[0][0])

    feat_ids = r.select(F.explode("features").alias("feature")).distinct()
    feat_f = (
        _init_factors(feat_ids, "feature", d)
        .select(
            "feature",
            F.concat(
                F.transform("factors", lambda x: x * 0.1), F.array(F.lit(0.0))
            ).alias("factors"),
        )
        .localCheckpoint(eager=True)
    )

    w0 = mu
    history: list[dict] = []
    for it in range(iterations):
        dec = step_dec ** it
        rates_it = [float(g) * dec for g in rates]

        def run_block(pdf: pd.DataFrame) -> pd.DataFrame:
            nonlocal_w0 = w0
            states: dict[int, np.ndarray] = {}
            upd: dict[int, int] = {}
            feats_l = pdf["features"].tolist()
            fvecs_l = pdf["fvecs"].tolist()
            rts = pdf["rating"].to_numpy()
            order = sorted(range(len(rts)), key=lambda i: tuple(feats_l[i]))
            sse = 0.0
            for i in order:
                fids = feats_l[i]
                xs = []
                for k, fid in enumerate(fids):
                    v = states.get(fid)
                    if v is None:
                        v = states[fid] = np.array(fvecs_l[i][k], dtype=float)
                    xs.append(v)
                s = np.zeros(d)
                lin = 0.0
                sq = 0.0
                for v in xs:
                    s += v[:d]
                    lin += v[d]
                    sq += float(v[:d] @ v[:d])
                pred = nonlocal_w0 + lin + 0.5 * (float(s @ s) - sq)
                e = rts[i] - pred
                sse += e * e
                nonlocal_w0 += rates_it[0] * (e - lam * nonlocal_w0)
                for k, v in enumerate(xs):
                    g = rates_it[min(k, len(rates_it) - 1)]
                    grad_v = e * (s - v[:d]) - lam * v[:d]
                    v[:d] = v[:d] + g * grad_v
                    v[d] += g * (e - lam * v[d])
                    upd[fids[k]] = upd.get(fids[k], 0) + 1
            out = [
                ("item", k, [float(x) for x in v], upd.get(k, 1))
                for k, v in states.items()
            ]
            out.append(("w0", -1, [float(nonlocal_w0), float(len(rts))], 1))
            out.append(("rmse", -2, [sse, float(len(rts))], 1))
            return pd.DataFrame(out, columns=["kind", "id", "factors", "n_upd"])

        # explode→join→regroup: per-row aligned factor-vector lists
        ex = (
            r.select("_rid", "block", "rating", F.posexplode("features"))
            .withColumnRenamed("col", "feature")
            .join(feat_f, "feature")
        )
        joined = (
            ex.groupBy("_rid", "block", "rating")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "feature", "factors"))
                ).alias("_pf")
            )
            .select(
                "block",
                "rating",
                F.transform("_pf", lambda x: x["feature"]).alias("features"),
                F.transform("_pf", lambda x: x["factors"]).alias("fvecs"),
            )
        )
        updated = (
            joined.groupBy("block")
            .applyInPandas(run_block, _OUT_SCHEMA)
            .localCheckpoint(eager=True)
        )
        feat_f = (
            updated.filter(F.col("kind") == "item")
            .select(F.col("id").alias("feature"), "factors", "n_upd")
            .select(
                "feature", "n_upd", F.posexplode("factors").alias("pos", "x")
            )
            .groupBy("feature", "pos")
            .agg((F.sum(F.col("x") * F.col("n_upd")) / F.sum("n_upd")).alias("x"))
            .groupBy("feature")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "x"))),
                    lambda q: q["x"],
                ).alias("factors")
            )
        )
        if sparsity is not None and sparsity < d:
            feat_f = feat_f.select(
                "feature",
                _hard_threshold(F.col("factors"), d, sparsity).alias("factors"),
            )
        feat_f = feat_f.localCheckpoint(eager=True)
        aggs = updated.filter(F.col("kind").isin("w0", "rmse")).collect()
        w0_rows = [a for a in aggs if a["kind"] == "w0"]
        rmse_rows = [a for a in aggs if a["kind"] == "rmse"]
        w0 = float(
            sum(a["factors"][0] * a["factors"][1] for a in w0_rows)
            / max(sum(a["factors"][1] for a in w0_rows), 1.0)
        )
        sse = sum(a["factors"][0] for a in rmse_rows)
        cnt = sum(a["factors"][1] for a in rmse_rows)
        history.append(
            {
                "iter": it,
                "train_rmse": float(np.sqrt(sse / max(cnt, 1.0))),
                "w0": w0,
            }
        )
    return feat_f, history
