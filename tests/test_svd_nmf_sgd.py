"""SVD (Lanczos), NMF, SGD family."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphchi_cpp_spark.cf.nmf import nmf
from graphchi_cpp_spark.cf.sgd import sgd
from graphchi_cpp_spark.cf.svd import lanczos_svd
from graphchi_cpp_spark.datasets import ratings


def test_lanczos_matches_numpy(spark):
    # generic matrix (distinct singular values — Lanczos with a single
    # start vector cannot resolve multiplicities, same as the reference)
    rng = np.random.RandomState(7)
    A = rng.rand(8, 6)
    rows = [
        (u, i, float(A[u, i])) for u in range(8) for i in range(6)
    ]
    r = spark.createDataFrame(rows, "user long, item long, rating double")
    s, U, V = lanczos_svd(r, k=3, max_iter=6)
    want = np.linalg.svd(A, compute_uv=False)[:3]
    assert s == pytest.approx(want, rel=1e-5)
    assert U.count() == 8 and V.count() == 6


def test_lanczos_onesided_matches_numpy(spark):
    from graphchi_cpp_spark.cf.svd import lanczos_svd_onesided

    rng = np.random.RandomState(7)
    A = rng.rand(8, 6)
    rows = [(u, i, float(A[u, i])) for u in range(8) for i in range(6)]
    r = spark.createDataFrame(rows, "user long, item long, rating double")
    s, U, V = lanczos_svd_onesided(r, k=3, max_iter=6)
    want = np.linalg.svd(A, compute_uv=False)[:3]
    assert s == pytest.approx(want, rel=1e-4)
    # U columns are A·v/σ — unit norm up to reorthogonalization error
    un = np.vstack([row["factors"] for row in U.collect()])
    assert np.linalg.norm(un[:, 0]) == pytest.approx(1.0, rel=1e-3)


def test_lanczos_on_testdata(spark, sf_dir):
    r = ratings(spark, sf_dir)
    s, U, V = lanczos_svd(r, k=2)
    assert len(s) == 2
    assert s[0] >= s[1] > 0


def test_nmf_converges_nonnegative(spark, sf_dir):
    r = ratings(spark, sf_dir)
    W, H, hist = nmf(r, d=4, iterations=4)
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]
    assert W.select(F.min(F.array_min("factors"))).collect()[0][0] >= 0
    assert H.select(F.min(F.array_min("factors"))).collect()[0][0] >= 0


def test_sgd_converges_deterministic(spark, sf_dir):
    r = ratings(spark, sf_dir)
    _, _, h1 = sgd(r, d=4, iterations=3, gamma=0.02)
    rmses1 = [h["train_rmse"] for h in h1]
    assert rmses1[-1] < rmses1[0]
    _, _, h2 = sgd(r, d=4, iterations=3, gamma=0.02)
    assert rmses1 == [h["train_rmse"] for h in h2]


def test_biassgd_converges(spark, sf_dir):
    r = ratings(spark, sf_dir)
    _, _, hist = sgd(r, d=4, iterations=3, gamma=0.02, variant="biassgd")
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]
    assert rmses[-1] < 1.5


def test_svdpp_converges(spark, sf_dir):
    r = ratings(spark, sf_dir)
    _, _, hist = sgd(r, d=4, iterations=3, gamma=0.02, variant="svdpp")
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]


def test_als_coord_converges_deterministic(spark, sf_dir):
    from graphchi_cpp_spark.cf.als_variants import als_coord

    r = ratings(spark, sf_dir)
    _, _, h1 = als_coord(r, d=4, iterations=3)
    rmses = [h["train_rmse"] for h in h1]
    assert rmses[-1] < rmses[0]
    _, _, h2 = als_coord(r, d=4, iterations=3)
    assert rmses == [h["train_rmse"] for h in h2]


def test_sparse_als_respects_sparsity(spark, sf_dir):
    from graphchi_cpp_spark.cf.als_variants import sparse_als

    r = ratings(spark, sf_dir)
    U, V, hist = sparse_als(r, d=4, iterations=2, user_sparsity=2)
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]
    # every user vector has at most 2 nonzeros; items stay dense
    nnz = U.select(
        F.max(
            F.size(F.filter(F.col("factors"), lambda x: F.abs(x) > 1e-12))
        ).alias("m")
    ).collect()[0]["m"]
    assert nnz <= 2


def test_als_tensor_converges(spark, sf_dir):
    from graphchi_cpp_spark.cf.als_variants import als_tensor

    r = ratings(spark, sf_dir).withColumn(
        "ts", F.pmod(F.col("user") + F.col("item"), F.lit(6))
    )
    U, V, T, hist = als_tensor(r, d=4, iterations=2)
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]
    assert T.count() == 6


def test_timesvdpp_converges(spark, sf_dir):
    r = ratings(spark, sf_dir).withColumn(
        "ts", F.pmod(F.col("user") + F.col("item"), F.lit(6))
    )
    _, _, hist = sgd(
        r, d=4, iterations=3, gamma=0.02, variant="timesvdpp", time_col="ts"
    )
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]


def test_biassgd2_losses_converge(spark, sf_dir):
    r = ratings(spark, sf_dir)
    for loss, g, dec in (("abs", 0.02, 0.5), ("logistic", 0.05, 1.0)):
        _, _, hist = sgd(
            r, d=4, iterations=3, gamma=g, variant="biassgd", loss=loss,
            step_dec=dec,
        )
        rmses = [h["train_rmse"] for h in hist]
        assert rmses[-1] < rmses[0], (loss, rmses)


def test_sgd_validation_and_early_stop(spark, sf_dir):
    """Reference --halt_on_rmse_increase parity (unittest.sh:19): the
    history carries validation RMSE and the loop stops on an increase."""
    from graphchi_cpp_spark.sources.matrix_market import kfold_split

    r = ratings(spark, sf_dir)
    train = kfold_split(r, 5, 0, training=True)
    val = kfold_split(r, 5, 0, training=False)
    _, _, hist = sgd(
        train, d=4, iterations=3, gamma=0.02,
        validation=val, halt_on_rmse_increase=True,
    )
    assert all("validation_rmse" in h for h in hist)
    assert len(hist) <= 3
    # an aggressive step forces divergence -> early halt before iter 6
    _, _, hist2 = sgd(
        train, d=4, iterations=6, gamma=0.5,
        validation=val, halt_on_rmse_increase=True,
    )
    assert len(hist2) < 6


def test_sgd_invalid_loss_combination(spark, sf_dir):
    r = ratings(spark, sf_dir)
    with pytest.raises(ValueError):
        sgd(r, variant="sgd", loss="abs")


def test_pmf_avg_rmse_descends_deterministic(spark, sf_dir):
    from graphchi_cpp_spark.cf.pmf import pmf

    r = ratings(spark, sf_dir)
    _, _, h1 = pmf(r, d=4, iterations=4, burn_in=1)
    rmses = [h["train_rmse"] for h in h1]
    # averaged-prediction RMSE descends from the first post-burn-in sample
    assert rmses[-1] < rmses[1]
    _, _, h2 = pmf(r, d=4, iterations=4, burn_in=1)
    assert rmses == [h["train_rmse"] for h in h2]  # seeded draws


def test_climf_objective_ascends(spark, sf_dir):
    from graphchi_cpp_spark.cf.climf import climf, smoothed_mrr

    r = ratings(spark, sf_dir)
    U, V, hist = climf(r, d=4, iterations=3, gamma=0.005)
    objs = [h["objective"] for h in hist]
    assert objs[-1] > objs[0]  # maximization
    rel = r.filter(F.col("rating") >= 4.0)
    mrr = smoothed_mrr(U, V, rel)
    assert mrr.count() > 0


def test_rbm_rmse_descends_deterministic(spark, sf_dir):
    from graphchi_cpp_spark.cf.rbm import rbm

    r = ratings(spark, sf_dir)
    _, _, h1 = rbm(r, d=6, iterations=3)
    rmses = [h["train_rmse"] for h in h1]
    assert rmses[-1] < rmses[0]
    _, _, h2 = rbm(r, d=6, iterations=3)
    assert rmses == [h["train_rmse"] for h in h2]  # seeded CD sampling


def test_fm_converges_with_extra_field(spark, sf_dir):
    from graphchi_cpp_spark.cf.fm import fm

    r = ratings(spark, sf_dir).withColumn(
        "tbin", F.pmod(F.col("user") + F.col("item"), F.lit(6))
    )
    _, hist = fm(r, feature_cols=["user", "item", "tbin"], d=4, iterations=3)
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]


def test_sparse_fm_converges_and_prunes(spark, sf_dir):
    """sparse_gensgd on full data: variable-length feature lists
    (every row [user, item'], even-sum rows get an extra bin feature),
    multi-block path, RMSE descending, and the sweep-end hard threshold
    leaves at most `sparsity` nonzero latents per factor vector."""
    from graphchi_cpp_spark.cf.fm import sparse_fm

    r = ratings(spark, sf_dir)
    max_u = r.agg(F.max("user")).collect()[0][0]
    off_i = int(max_u) + 1
    src = r.select(
        "rating",
        F.when(
            F.pmod(F.col("user") + F.col("item"), F.lit(2)) == 0,
            F.array(
                F.col("user"),
                F.col("item") + F.lit(off_i),
                F.pmod(F.col("item"), F.lit(4)) + F.lit(off_i + 1_000_000),
            ),
        )
        .otherwise(F.array(F.col("user"), F.col("item") + F.lit(off_i)))
        .alias("features"),
    )
    feat_f, hist = sparse_fm(src, d=3, iterations=3, sparsity=2)
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < rmses[0]
    nz = feat_f.select(
        F.aggregate(
            F.transform(
                F.slice("factors", 1, 3),
                lambda x: F.when(x != 0.0, 1).otherwise(0),
            ),
            F.lit(0),
            lambda a, b: a + b,
        ).alias("nnz")
    )
    assert nz.agg(F.max("nnz")).collect()[0][0] <= 2


def test_featurize_gensgd_parsing(spark):
    """gensgd parsing DSL: dictionary encoding over strings/ids,
    bucketized continuous columns, side-feature table join — feature ids
    are contiguous, disjoint per column, and deterministic."""
    from graphchi_cpp_spark.cf.fm import featurize

    r = spark.createDataFrame(
        [(1, 10, 4.0), (1, 11, 3.0), (2, 10, 5.0), (3, 11, 1.0)],
        "user long, item long, rating double",
    )
    side = spark.createDataFrame(
        [(1, "alpha", 12.0), (2, "beta", 55.0), (3, "alpha", 49.0)],
        "k long, seg string, price double",
    )
    out, vocab = featurize(
        r,
        categorical=["user", "item"],
        buckets={"price": 10.0},
        side_tables=[(side, "user", "k")],
    )
    rows = out.collect()
    assert len(rows) == 4
    # column ranges: user {0,1,2}, item {3,4}, seg {5,6}, price-bin {7,8,9}
    got = {c: {r[f"_feat_{i}"] for r in rows} for i, c in
           enumerate(["user", "item", "seg", "price"])}
    assert got["user"] == {0, 1, 2}
    assert got["item"] == {3, 4}
    assert got["seg"] == {5, 6}
    assert got["price"] <= {7, 8, 9} and len(got["price"]) == 3
    # vocab is the join contract: ids disjoint and contiguous overall
    ids = sorted(v["feature_id"] for v in vocab.collect())
    assert ids == list(range(len(ids)))
    # deterministic re-run
    out2, _ = featurize(
        r, categorical=["user", "item"], buckets={"price": 10.0},
        side_tables=[(side, "user", "k")],
    )
    key = lambda rr: (rr["user"], rr["item"])  # noqa: E731
    assert sorted(map(tuple, rows), key=lambda t: t[:2]) == sorted(
        map(tuple, out2.collect()), key=lambda t: t[:2]
    )
    # the distributed zipWithIndex vocab path (window_limit exceeded)
    # must assign identical codes to the window path
    out3, _ = featurize(
        r, categorical=["user", "item"], buckets={"price": 10.0},
        side_tables=[(side, "user", "k")], window_limit=1,
    )
    assert sorted(map(tuple, rows), key=lambda t: t[:2]) == sorted(
        map(tuple, out3.collect()), key=lambda t: t[:2]
    )


def test_wals_weighted(spark, sf_dir):
    from graphchi_cpp_spark.cf.als import als

    r = ratings(spark, sf_dir).withColumn(
        "w", 1.0 + F.pmod(F.col("user") + F.col("item"), F.lit(3)).cast("double")
    )
    _, _, hist = als(r, d=4, iterations=2, weight_col="w")
    rmses = [h["train_rmse"] for h in hist]
    assert rmses[-1] < 1.2
    # weighting changes the fit vs unweighted
    _, _, hist_u = als(r.drop("w"), d=4, iterations=2)
    assert rmses != [h["train_rmse"] for h in hist_u]


def test_word_pair_mi(spark, duck, sf_dir):
    from graphchi_cpp_spark.operators.mutual_info import (
        word_pair_mi,
        word_pair_mi_sql,
    )
    from tests.conftest import assert_df_matches_oracle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert_df_matches_oracle(
        word_pair_mi(docs, min_pairs=20),
        duck,
        word_pair_mi_sql(min_pairs=20),
        float_ndigits=5,
    )
