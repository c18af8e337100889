"""CF toolkit: item-CF, baselines, eval, ALS."""

import pytest
from pyspark.sql import functions as F

from graphchi_cpp_spark.cf.als import als, predict, recommend_top_k
from graphchi_cpp_spark.cf.baselines import (
    baseline_predict,
    baseline_predict_sql,
    baseline_rmse,
)
from graphchi_cpp_spark.cf.eval import (
    average_precision_at_k,
    mean_average_precision,
)
from graphchi_cpp_spark.cf.itemcf import (
    item_similarity,
    item_similarity_sql,
    itemsim2rating,
)
from graphchi_cpp_spark.datasets import RATINGS_SQL, ratings
from tests.conftest import assert_df_matches_oracle


def _tiny_ratings(spark):
    # users 0,1 both rated items 10,11; user 2 rated 10 only
    rows = [
        (0, 10, 5.0),
        (0, 11, 3.0),
        (1, 10, 4.0),
        (1, 11, 2.0),
        (2, 10, 1.0),
    ]
    return spark.createDataFrame(rows, ["user", "item", "rating"])


def test_itemcf_jaccard_tiny(spark):
    r = _tiny_ratings(spark)
    sims = {
        (x["item_a"], x["item_b"]): x["sim"]
        for x in item_similarity(r, "jaccard").collect()
    }
    # |A∩B|=2 (users 0,1), |A|=3, |B|=2 → 2/(3+2-2)=2/3
    assert sims[(10, 11)] == pytest.approx(2 / 3)


def test_itemcf_power_user_cap(spark):
    """Skewed fixture: one power user rating 40 items would alone emit
    C(40,2)=780 pairs; the cap bounds their fan-out to C(10,2)=45 while
    pairs among normal users are untouched (degrees are recomputed on the
    capped matrix, so similarities stay internally consistent)."""
    power = [(99, i) for i in range(40)]
    normal = [(1, 100), (1, 101), (2, 100), (2, 101)]
    r = spark.createDataFrame(
        [(u, i, 5.0) for u, i in power + normal], ["user", "item", "rating"]
    )
    full = item_similarity(r, "jaccard").collect()
    capped = item_similarity(r, "jaccard", max_user_degree=10).collect()
    assert len(full) == 780 + 1  # power-user pairs + (100,101)
    # power user contributes at most C(10,2) pairs after the cap
    assert len(capped) <= 45 + 1
    sims = {(x["item_a"], x["item_b"]): x["sim"] for x in capped}
    # the normal-user pair is unaffected: items 100/101 co-rated by both
    assert sims[(100, 101)] == pytest.approx(1.0)


def test_itemcf_cv_folds(spark, sf_dir):
    from graphchi_cpp_spark.cf.itemcf import itemcf_cv

    r = ratings(spark, sf_dir)
    out = itemcf_cv(r, k_folds=3).collect()
    assert len(out) == 3
    for row in out:
        assert 0.0 <= row["mean_ap"] <= 1.0
        assert row["n_users"] > 0


def test_itemcf_cap_binds_vs_duckdb(spark, sf_dir, duck):
    """With a tiny cap that definitely binds, the md5-ordered per-user
    sample must agree bit-exactly between Spark and the DuckDB oracle
    (same cross-engine hash as kfold_bucket)."""
    r = ratings(spark, sf_dir)
    result = item_similarity(r, "jaccard", min_common=2, max_user_degree=5).select(
        "item_a", "item_b", F.round("sim", 6).alias("sim")
    )
    sql = f"""
        SELECT item_a, item_b, round(sim, 6) AS sim
        FROM ({item_similarity_sql(RATINGS_SQL, "jaccard", min_common=2,
                                   max_user_degree=5)})
    """
    assert_df_matches_oracle(result, duck, sql, float_ndigits=5)


def test_itemcf_vs_duckdb(spark, sf_dir, duck):
    r = ratings(spark, sf_dir)
    for metric in ("jaccard", "cosine", "aa", "ra"):
        result = item_similarity(r, metric, min_common=2).select(
            "item_a", "item_b", F.round("sim", 6).alias("sim")
        )
        sql = f"""
            SELECT item_a, item_b, round(sim, 6) AS sim
            FROM ({item_similarity_sql(RATINGS_SQL, metric, min_common=2)})
        """
        assert_df_matches_oracle(result, duck, sql, float_ndigits=5)


def test_itemsim2rating_tiny(spark):
    r = _tiny_ratings(spark)
    sims = item_similarity(r, "jaccard")
    recs = itemsim2rating(r, sims, k=5)
    out = {(x["user"], x["item"]): x["score"] for x in recs.collect()}
    # user 2 has only item 10; item 11 similar (2/3) and unseen
    assert out[(2, 11)] == pytest.approx(2 / 3)
    # users 0,1 have rated everything → no recs
    assert all(u == 2 for (u, _) in out)


def test_baselines_vs_duckdb(spark, sf_dir, duck):
    r = ratings(spark, sf_dir)
    for method in ("global_mean", "user_mean", "item_mean", "bias"):
        result = baseline_predict(r, method).select(
            "user", "item", F.round("rating", 4).alias("rating"),
            F.round("prediction", 4).alias("prediction"),
        )
        sql = f"""
            SELECT "user", item, round(rating, 4) AS rating,
                   round(prediction, 4) AS prediction
            FROM ({baseline_predict_sql(RATINGS_SQL, method)})
        """
        assert_df_matches_oracle(result, duck, sql, float_ndigits=3)


def test_baseline_rmse_ordering(spark, sf_dir):
    r = ratings(spark, sf_dir)
    rmse_global = baseline_rmse(r, "global_mean").collect()[0]["rmse"]
    rmse_bias = baseline_rmse(r, "bias").collect()[0]["rmse"]
    assert rmse_bias <= rmse_global


def test_ap_at_k(spark):
    recs = spark.createDataFrame(
        [(0, 100, 1), (0, 101, 2), (0, 102, 3), (1, 100, 1)],
        ["user", "item", "rank"],
    )
    truth = spark.createDataFrame([(0, 100), (0, 102), (1, 999)], ["user", "item"])
    ap = {r["user"]: r["ap"] for r in average_precision_at_k(recs, truth, 3).collect()}
    # user0: rel=1@1 (prec 1), rel=0@2, rel=1@3 (prec 2/3); /min(3,2)=2 → (1+2/3)/2
    assert ap[0] == pytest.approx((1 + 2 / 3) / 2)
    assert ap[1] == 0.0
    m = mean_average_precision(recs, truth, 3).collect()[0]["map"]
    assert m == pytest.approx((ap[0] + 0.0) / 2)


def test_als_converges_and_deterministic(spark, sf_dir):
    r = ratings(spark, sf_dir)
    uf1, if1, hist1 = als(r, d=5, iterations=3)
    rmses = [h["train_rmse"] for h in hist1]
    assert rmses[-1] < rmses[0]  # converging
    assert rmses[-1] < 1.2  # actually fits ratings in [1,5]
    uf2, _, hist2 = als(r, d=5, iterations=3)
    # deterministic up to parallel-sum ULP noise in the RMSE aggregate
    # (repo policy: rel=1e-12 for run-to-run float comparisons — the
    # factor VALUES are exact, only the reduction order varies)
    assert rmses == pytest.approx(
        [h["train_rmse"] for h in hist2], rel=1e-12
    )


def test_als_recommend(spark):
    r = _tiny_ratings(spark)
    uf, itf, _ = als(r, d=2, iterations=3)
    recs = recommend_top_k(uf, itf, seen=r, k=2)
    out = [(x["user"], x["item"]) for x in recs.collect()]
    assert (2, 11) in out  # only unseen pair
    assert len(out) == 1


# --- golden parity against the reference's own unittest fixtures ---------

_REF_UNITTEST = "/root/reference/toolkits/collaborative_filtering/unittest"


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_UNITTEST),
    reason="reference fixtures not present",
)
def test_itemcf_reference_golden(spark):
    """Parity with the reference's own itemcf unit test (unittest.sh:89-95):
    itemcf --min_allowed_intersection=2 on itemcf.unittest.graph must
    produce exactly three 0.400000 similarities; the full expected set is
    itemcf.unittest.graph-topk-correct (5 pairs)."""
    from graphchi_cpp_spark.sources.matrix_market import read_matrix_market

    r = read_matrix_market(spark, f"{_REF_UNITTEST}/itemcf.unittest.graph")
    sims = item_similarity(r, metric="jaccard", min_common=2)
    # reader is 0-based; reference output is 1-based with larger item first
    got = {
        (int(x["item_b"]) + 1, int(x["item_a"]) + 1): round(x["sim"], 6)
        for x in sims.collect()
    }
    expected = {  # itemcf.unittest.graph-topk-correct, verbatim
        (5, 4): 0.4,
        (5, 3): 0.5,
        (4, 3): 0.4,
        (4, 1): 0.4,
        (3, 1): 0.5,
    }
    assert got == expected
    # the reference's own assertion: exactly three 0.400000 values
    assert sum(1 for v in got.values() if v == 0.4) == 3


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_UNITTEST),
    reason="reference fixtures not present",
)
def test_itemcf3_jaccard_weight_reference_golden(spark):
    """Parity with the reference's itemcf3 unit test (unittest.sh:104-112):
    --distance=9 (JACCARD_WEIGHT) on itemcf3.unittest.graph must produce
    '2 1 0.6666' and '3 1 0.3333' (full expected set:
    itemcf3.unittest.correct)."""
    from graphchi_cpp_spark.cf.itemcf import edge_jaccard_weight
    from graphchi_cpp_spark.sources.matrix_market import read_matrix_market

    mm = read_matrix_market(spark, f"{_REF_UNITTEST}/itemcf3.unittest.graph")
    edges = mm.select(
        (F.col("user") + 1).alias("src"),
        (F.col("item") + 1).alias("dst"),
        F.col("rating").alias("weight"),
    )
    got = {
        (int(x["item_a"]), int(x["item_b"])): round(x["sim"], 6)
        for x in edge_jaccard_weight(edges).collect()
    }
    expected = {  # itemcf3.unittest.correct, verbatim
        (2, 1): 0.666667,
        (3, 1): 0.333333,
        (5, 4): 1.0,
        (7, 6): 1.0,
    }
    assert got == expected


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_UNITTEST),
    reason="reference fixtures not present",
)
def test_itemsim2rating_reference_golden(spark):
    """Parity with the reference's itemsim2rating unit test
    (unittest.sh 'ITEM-SIM-TO-RATING'): --K=4 --undirected=1 on
    itemsim2rating.unittest.graph + .similarity must reproduce
    itemsim2rating.unittest verbatim — per user, each unseen item's
    score is the sum of similarities to the user's rated items, zero
    scores omitted."""
    from graphchi_cpp_spark.cf.itemcf import itemsim2rating
    from graphchi_cpp_spark.sources.matrix_market import read_matrix_market

    r = read_matrix_market(spark, f"{_REF_UNITTEST}/itemsim2rating.unittest.graph")
    s = read_matrix_market(
        spark, f"{_REF_UNITTEST}/itemsim2rating.unittest.similarity"
    ).select(
        F.col("user").alias("item_a"),
        F.col("item").alias("item_b"),
        F.col("rating").alias("sim"),
    )
    recs = itemsim2rating(r, s, k=4)
    # reader is 0-based; the reference's expected file is 1-based
    got = {
        (int(x["user"]) + 1, int(x["item"]) + 1): round(x["score"], 6)
        for x in recs.collect()
    }
    expected = {  # itemsim2rating.unittest, verbatim
        (1, 3): 2.0,
        (2, 1): 1.0,
        (2, 4): 1.0,
        (3, 1): 1.0,
        (3, 3): 1.0,
        (4, 2): 1.0,
        (4, 3): 1.0,
        (5, 2): 1.0,
        (5, 4): 1.0,
    }
    assert got == expected


def test_edge_jaccard_weight_vs_duckdb(spark, sf_dir, duck):
    from graphchi_cpp_spark.cf.itemcf import (
        edge_jaccard_weight,
        edge_jaccard_weight_sql,
    )

    edges = ratings(spark, sf_dir).select(
        F.col("user").alias("src"),
        F.col("item").alias("dst"),
        F.col("rating").alias("weight"),
    )
    assert_df_matches_oracle(
        edge_jaccard_weight(edges).select(
            "item_a", "item_b", F.round("sim", 6).alias("sim")
        ),
        duck,
        f"""SELECT item_a, item_b, round(sim, 6) AS sim FROM (
            {edge_jaccard_weight_sql(f'SELECT "user" AS src, item AS dst, rating AS weight FROM ({RATINGS_SQL})')}
        )""",
    )


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_UNITTEST),
    reason="reference fixtures not present",
)
def test_topk_parser_reference_golden(spark):
    """Parity with the reference's topk parser test (unittest.sh 'TOP K'):
    ``toolkits/parsers/topk.cpp:125-136`` keeps the FIRST K rows per
    from-key in file order (the input contract says the file is
    pre-sorted by key then value, topk.cpp:29); the expected output is
    committed verbatim as topk.unittest.ids.correct. The Spark analog is
    top_k_per_key ordered ascending on the line position."""
    from graphchi_cpp_spark.operators.toplist import top_k_per_key

    base = "/root/reference/toolkits/collaborative_filtering/unittest"
    rows = []
    with open(f"{base}/topk.unittest") as f:
        for pos, line in enumerate(f):
            p = line.split()
            if len(p) >= 3:
                rows.append((int(p[0]), int(p[1]), float(p[2]), pos))
    df = spark.createDataFrame(rows, "frm int, dst int, val double, pos long")
    got: dict[int, list[int]] = {}
    topk = top_k_per_key(df, "frm", "pos", 3, ascending=True)
    for r in topk.orderBy("frm", "rank").collect():
        got.setdefault(r["frm"], []).append(r["dst"])
    expected: dict[int, list[int]] = {}
    with open(f"{base}/topk.unittest.ids.correct") as f:
        for line in f:
            p = [int(x) for x in line.split()]
            if p:
                expected[p[0]] = p[1:]
    assert got == expected


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_UNITTEST),
    reason="reference fixtures not present",
)
def test_metric_eval_reference_golden(spark):
    """Parity with the reference's two metric_eval unit tests
    (unittest.sh:98,100): MAP@3 over its own fixture files.

    test 1: --training=metric_eval.unittest4 --test=metric_eval.unittest3
            → MAP = (5/9 + 2/3 + 5/6) / 3 = 0.685185
    test 2: --training=metric_eval.unittest2 --test=metric_eval.unittest2
            → MAP = 1.0
    (values derived by hand from metrics.hpp:28-43's
    average_precision_at_k over the fixture lines; the reference logs
    the MAP rather than diffing it, so the formula IS the golden.)

    Format: each fixture line is `user item item ...` — the training
    file's items are the ranked predictions (file order = rank), the
    test file's items the truth. metric_eval.cpp truncates the truth
    to its first min(K, n) FILE-ORDER items before matching
    (metrics.hpp:33-34, Ben Hamner's averagePrecisionAtK does the
    same); a DataFrame truth set carries no file order, so the parity
    harness applies that truncation at parse time."""
    from graphchi_cpp_spark.cf.eval import (
        average_precision_at_k as ap_at_k,
    )
    from graphchi_cpp_spark.cf.eval import mean_average_precision

    K = 3

    def parse(fname, truncate=None):
        rows = []
        with open(f"{_REF_UNITTEST}/{fname}") as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                user, items = int(parts[0]), [int(x) for x in parts[1:]]
                if truncate is not None:
                    items = items[:truncate]
                rows.extend(
                    (user, item, rank)
                    for rank, item in enumerate(items, start=1)
                )
        return spark.createDataFrame(rows, ["user", "item", "rank"])

    # test 1: predictions=unittest4, truth=unittest3
    recs = parse("metric_eval.unittest4")
    truth = parse("metric_eval.unittest3").select("user", "item")
    ap = {r["user"]: r["ap"] for r in ap_at_k(recs, truth, K).collect()}
    assert ap[1] == pytest.approx(5 / 9)
    assert ap[2] == pytest.approx(2 / 3)
    assert ap[3] == pytest.approx(5 / 6)
    m1 = mean_average_precision(recs, truth, K).collect()[0]["map"]
    assert m1 == pytest.approx((5 / 9 + 2 / 3 + 5 / 6) / 3)  # 0.685185

    # test 2: predictions = truth = unittest2 (truth truncated to K,
    # matching metrics.hpp:33-34)
    recs2 = parse("metric_eval.unittest2")
    truth2 = parse("metric_eval.unittest2", truncate=K).select("user", "item")
    m2 = mean_average_precision(recs2, truth2, K).collect()[0]["map"]
    assert m2 == pytest.approx(1.0)
