"""Training-data-pipeline operators: text, dedup, similarity, multimodal."""

import pytest
from pyspark.sql import functions as F

from graphchi_cpp_spark.operators.dedup import (
    exact_duplicates,
    exact_duplicates_sql,
    lsh_candidates,
    lsh_candidates_sql,
    minhash_dedup_pairs,
    minhash_signatures,
    minhash_signatures_sql,
    ngram_jaccard,
    ngram_jaccard_dedup,
    ngram_jaccard_dedup_sql,
    simhash,
    simhash_sql,
)
from graphchi_cpp_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    media_stats,
    synthetic_media,
)
from graphchi_cpp_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_sql,
    ivf_centroids,
    ivf_topk,
    ivf_topk_sql,
    lsh_cosine_topk,
)
from graphchi_cpp_spark.operators.text import (
    fingerprints,
    fingerprints_sql,
    language_id,
    language_id_sql,
    md5_long,
    quality_scores,
    quality_scores_sql,
    token_stats,
    token_stats_sql,
)
from tests.conftest import assert_df_matches_oracle


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_md5_long_cross_engine(spark, duck):
    sdf = spark.createDataFrame([("abc",), ("hello world",)], ["s"]).select(
        "s", md5_long(F.col("s")).alias("h")
    )
    got = {r["s"]: r["h"] for r in sdf.collect()}
    for s, h in got.items():
        dh = duck.execute(
            f"SELECT ('0x' || substr(md5('{s}'), 1, 15))::BIGINT"
        ).fetchone()[0]
        assert h == dh, s


def test_token_stats_vs_duckdb(spark, sf_dir, duck):
    assert_df_matches_oracle(
        token_stats(_docs(spark, sf_dir)), duck, token_stats_sql()
    )


def test_quality_scores_vs_duckdb(spark, sf_dir, duck):
    assert_df_matches_oracle(
        quality_scores(_docs(spark, sf_dir)), duck, quality_scores_sql(),
        float_ndigits=3,
    )


def test_language_id_vs_duckdb(spark, sf_dir, duck):
    assert_df_matches_oracle(
        language_id(_docs(spark, sf_dir)), duck, language_id_sql()
    )


def test_fingerprints_vs_duckdb(spark, sf_dir, duck):
    assert_df_matches_oracle(
        fingerprints(_docs(spark, sf_dir)), duck, fingerprints_sql()
    )


def test_exact_duplicates(spark, sf_dir, duck):
    docs = _docs(spark, sf_dir)
    assert_df_matches_oracle(exact_duplicates(docs), duck, exact_duplicates_sql())
    # planted duplicate is found
    dup = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc dd")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: (r["canonical_id"], r["group_size"]) for r in
           exact_duplicates(dup).collect()}
    assert out == {1: (1, 2), 2: (1, 2), 3: (3, 1)}


def test_minhash_signatures_vs_duckdb(spark, sf_dir, duck):
    assert_df_matches_oracle(
        minhash_signatures(_docs(spark, sf_dir), num_hashes=8),
        duck,
        minhash_signatures_sql(num_hashes=8),
    )


def test_lsh_candidates_vs_duckdb(spark, sf_dir, duck):
    assert_df_matches_oracle(
        lsh_candidates(_docs(spark, sf_dir)), duck, lsh_candidates_sql()
    )


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, "completely different words entirely here now")],
        ["doc_id", "text"],
    )
    pairs = minhash_dedup_pairs(docs, threshold=0.3)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)
    # jaccard sanity vs exact
    j = ngram_jaccard(
        docs, spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    ).collect()[0]["jaccard"]
    assert 0.3 < j < 1.0


def test_ngram_jaccard_scores_unaffected_by_noncandidate_docs(spark):
    # verification semi-joins the corpus down to docs appearing in a pair:
    # adding unrelated corpus docs must not change any reported jaccard,
    # and a zero-overlap pair must score 0.0 (not drop out)
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),
        (3, "p q r s t u v w"),
    ]
    noise = [(100 + i, f"noise{i} filler{i} words{i} here{i}") for i in range(20)]
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["doc_a", "doc_b"])
    small = spark.createDataFrame(rows, ["doc_id", "text"])
    big = spark.createDataFrame(rows + noise, ["doc_id", "text"])
    j_small = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard(small, pairs).collect()
    }
    j_big = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard(big, pairs).collect()
    }
    assert j_small == j_big
    assert j_big[(1, 3)] == 0.0
    assert 0.0 < j_big[(1, 2)] < 1.0
    # pairs referencing a doc absent from the corpus are dropped, not nulled
    ghost = spark.createDataFrame([(1, 999)], ["doc_a", "doc_b"])
    assert ngram_jaccard(small, ghost).count() == 0


def test_ngram_jaccard_dedup_vs_duckdb(spark, sf_dir, duck):
    # registered contract: default max_df pruning on both engines
    assert_df_matches_oracle(
        ngram_jaccard_dedup(_docs(spark, sf_dir), threshold=0.3),
        duck,
        ngram_jaccard_dedup_sql(threshold=0.3),
    )


def test_ngram_jaccard_dedup_vs_duckdb_binding_max_df(spark, sf_dir, duck):
    """max_df small enough that stop-shingle pruning BINDS on real data:
    both engines must prune candidates identically AND recount surviving
    intersections against the unpruned shingle table."""
    assert_df_matches_oracle(
        ngram_jaccard_dedup(_docs(spark, sf_dir), threshold=0.2, max_df=3),
        duck,
        ngram_jaccard_dedup_sql(threshold=0.2, max_df=3),
    )


def test_ngram_jaccard_dedup_max_df_binding_recount_exact(spark):
    """Pruning binds: 'x y z' appears in all 6 docs (df=6 > max_df=2) and
    is dropped from candidate generation — but the surviving pair's
    jaccard must still COUNT it (recount against unpruned shingles)."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "a b c d x y z q"),
            (3, "p3 q3 x y z"),
            (4, "p4 q4 x y z"),
            (5, "p5 q5 x y z"),
            (6, "p6 q6 x y z"),
        ],
        ["doc_id", "text"],
    )
    pruned = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_dedup(docs, threshold=0.5, max_df=2).collect()
    }
    # (1,2) share 5 shingles incl. the PRUNED 'x y z'; sizes 5 and 6 →
    # exact jaccard 5/6. A pruned-postings count would give 4/7 ≈ 0.571.
    assert set(pruned) == {(1, 2)}
    assert pruned[(1, 2)] == pytest.approx(5 / 6, abs=1e-6)
    # documented false negative: pairs sharing ONLY the pruned shingle
    # (e.g. (3,4), exact jaccard 1/5) vanish under max_df but exist in
    # the uncapped run at a low threshold
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_dedup(
            docs, threshold=0.15, max_df=None
        ).collect()
    }
    assert (3, 4) in full and full[(3, 4)] == pytest.approx(0.2, abs=1e-6)
    low_pruned = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_dedup(
            docs, threshold=0.15, max_df=2
        ).collect()
    }
    assert (3, 4) not in low_pruned and (1, 2) in low_pruned


def test_ngram_jaccard_dedup_disk_materialization_identical(
    spark, sf_dir, monkeypatch
):
    """SPARK_GRAFT_MATERIALIZE=disk (out-of-core postings persist, the
    30M-doc single-host path) must produce byte-identical pairs to the
    default localCheckpoint materialization."""
    docs = _docs(spark, sf_dir)
    default = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_dedup(docs, threshold=0.3).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "disk")
    disk = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_dedup(docs, threshold=0.3).collect()
    }
    assert disk == default and len(default) > 0


def test_minhash_pairs_subset_of_exact_jaccard(spark, sf_dir):
    """Cross-operator invariant: the sketched pipeline (LSH candidates →
    exact verify) can only MISS pairs, never invent them — its output is
    a subset of the exact inverted-index dedup at the same threshold,
    with identical jaccard values."""
    docs = _docs(spark, sf_dir)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_dedup(docs, threshold=0.3).collect()
    }
    sketched = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(docs, threshold=0.3).collect()
    }
    assert set(sketched) <= set(exact)
    for pair, j in sketched.items():
        assert j == exact[pair]


def test_ngram_contamination_vs_duckdb(spark, sf_dir, duck):
    from graphchi_cpp_spark.operators.dedup import (
        ngram_contamination,
        ngram_contamination_sql,
    )

    docs = _docs(spark, sf_dir)
    assert_df_matches_oracle(
        ngram_contamination(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            n=5,
            min_containment=0.2,
        ),
        duck,
        ngram_contamination_sql(
            "doc_id % 10 != 0", "doc_id % 10 = 0", n=5, min_containment=0.2
        ),
    )


def test_ngram_contamination_planted(spark):
    from graphchi_cpp_spark.operators.dedup import ngram_contamination

    probe = "the quick brown fox jumps over the lazy sleeping dog"
    train = spark.createDataFrame(
        [
            (1, f"some preamble text here {probe} and a long trailing suffix"),
            (2, "entirely unrelated content about graph partitioning at scale"),
        ],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame([(100, probe)], ["doc_id", "text"])
    got = {
        r["train_id"]: (r["overlap"], r["containment"])
        for r in ngram_contamination(train, probes, n=5).collect()
    }
    # every 5-gram of the probe appears verbatim in doc 1 → containment 1.0
    assert set(got) == {1}
    assert got[1][1] == 1.0


def test_repetition_stats_vs_duckdb(spark, sf_dir, duck):
    from graphchi_cpp_spark.operators.text import (
        repetition_stats,
        repetition_stats_sql,
    )

    assert_df_matches_oracle(
        repetition_stats(_docs(spark, sf_dir)), duck, repetition_stats_sql()
    )


def test_repetition_stats_planted(spark):
    from graphchi_cpp_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # 1 distinct token, 1 distinct bigram
            (2, "all four tokens differ"),  # no repetition at all
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["dup_token_frac"] == 0.75  # 3 of 4 occurrences repeat
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["dup_bigram_frac"] == 0.0


def test_repetition_stats_short_docs(spark, duck):
    """Docs with < 2 tokens have no bigrams: bigram fracs must be 0.0
    (not a synthesized single-token 'bigram' reporting 1.0), in both
    engines."""
    from graphchi_cpp_spark.operators.text import (
        repetition_stats,
        repetition_stats_sql,
    )

    rows = [(1, "one"), (2, "two two"), (3, "solo")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["n_tokens"] == 1
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[1]["top_bigram_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == 0.0
    assert got[2]["dup_token_frac"] == 0.5  # sanity: >=2 tokens unaffected
    duck.execute(
        "CREATE OR REPLACE TABLE _short_docs AS SELECT * FROM (VALUES "
        "(1, 'one'), (2, 'two two'), (3, 'solo')) t(doc_id, text)"
    )
    oracle = {
        r[0]: r
        for r in duck.execute(
            repetition_stats_sql("_short_docs")
        ).fetchall()
    }
    for d in (1, 2, 3):
        assert round(got[d]["top_bigram_frac"], 6) == round(oracle[d][4], 6)
        assert round(got[d]["dup_bigram_frac"], 6) == round(oracle[d][3], 6)


def test_clean_corpus_filters_compose(spark):
    """Each pipeline stage knocks out exactly the planted offender:
    the exact duplicate, the low-quality fragment, the repetitive doc,
    and the contaminated doc — the natural doc survives."""
    from graphchi_cpp_spark.pipeline import clean_corpus

    probe = "the quick brown fox jumps over the lazy sleeping dog tonight"
    natural = (
        "the analysis of large graphs is a topic with many interesting "
        "questions and the methods in this work apply to a wide range of "
        "domains for example social networks and the web of documents"
    )
    docs = spark.createDataFrame(
        [
            (1, natural),
            (2, natural),  # exact duplicate of 1 -> deduped
            (3, "12345 67890"),  # short, non-alpha, no stopwords -> quality floor
            (4, "spam spam spam spam spam spam spam spam spam spam"),  # repetition
            (5, f"intro text {probe} outro text of the training document "
                "with a few extra words for the quality of this row and "
                "the stopwords the a of and to in is on for with again"),
        ],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame([(100, probe)], ["doc_id", "text"])
    out = clean_corpus(
        docs, probes, quality_min=0.3, dup_bigram_max=0.5, contamination_max=0.8
    )
    assert {r["doc_id"] for r in out.collect()} == {1}
    # without probes, the contaminated doc survives (still beats quality)
    out2 = clean_corpus(docs, None, quality_min=0.3, dup_bigram_max=0.5)
    assert {r["doc_id"] for r in out2.collect()} == {1, 5}


def test_simhash_vs_duckdb(spark, sf_dir, duck):
    assert_df_matches_oracle(simhash(_docs(spark, sf_dir)), duck, simhash_sql())


def test_simhash_near_dup_close(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(1, base), (2, base.replace("today", "tonight")),
         (3, "zzz yyy xxx www vvv uuu")],
        ["doc_id", "text"],
    )
    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h[1], h[2]) < ham(h[1], h[3])


def test_cosine_topk_vs_duckdb(spark, sf_dir, duck):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    result = cosine_topk(emb, queries, k=5).select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("long")
    )
    assert_df_matches_oracle(
        result, duck, cosine_topk_sql("vec_id % 20 = 0", k=5), float_ndigits=5
    )


def test_lsh_cosine_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_cosine_topk(emb, queries, k=5, num_planes=4, num_bands=8)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.5  # 8 bands x 4 planes OR-amplification


def test_ivf_topk_vs_duckdb(spark, sf_dir, duck):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert_df_matches_oracle(
        ivf_topk(
            emb, emb.filter(F.col("vec_id") % 20 == 0), k=5, n_cells=8, nprobe=3
        ),
        duck,
        ivf_topk_sql("vec_id % 20 = 0", k=5, n_cells=8, nprobe=3),
    )


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """nprobe = n_cells probes every cell → exactly the brute-force
    result (the IVF plumbing loses nothing; only probe pruning is
    approximate)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    full = {
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in ivf_topk(emb, queries, k=5, n_cells=4, nprobe=4).collect()
    }
    assert full == exact


def test_ivf_join_assignment_matches_expressions(spark, sf_dir, monkeypatch):
    """The broadcast-join assignment path (used above EXPR_CELLS_LIMIT)
    must produce the identical result to the literal-expression path —
    same rounded scores, same cell-asc tiebreaks."""
    from graphchi_cpp_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    expr = sorted(
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in ivf_topk(emb, queries, k=5, n_cells=8, nprobe=3).collect()
    )
    monkeypatch.setattr(sim, "EXPR_CELLS_LIMIT", 4)
    joined = sorted(
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in ivf_topk(emb, queries, k=5, n_cells=8, nprobe=3).collect()
    )
    assert joined == expr


def test_ivf_sample_mod_trains_on_subset(spark, sf_dir):
    """sample_mod bounds training cost: centroids from a 1-in-5 sample
    still come back unit-length and n_cells strong, and the full query
    path runs end-to-end on them."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb, n_cells=4, iters=1, sample_mod=5)
    assert len(cents) == 4
    for c in cents:
        assert abs(sum(x * x for x in c) ** 0.5 - 1.0) < 1e-9
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") % 50 == 0),
        k=3, n_cells=4, nprobe=2, iters=1, sample_mod=5,
    )
    assert out.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] <= 3


def test_ivf_lloyd_refinement_recall(spark):
    """Planted clusters: after Lloyd refinement, probing 1 of 4 cells
    still recovers the true same-cluster neighbors (recall 1.0 on
    well-separated data); centroids must be unit-norm."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = np.eye(4, 16)  # 4 orthogonal cluster directions
    rows = []
    for i in range(80):
        c = i % 4
        v = centers[c] + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = ivf_centroids(emb, n_cells=4, iters=3)
    for c in cents:
        assert abs(sum(x * x for x in c) ** 0.5 - 1.0) < 1e-9
    queries = emb.filter(F.col("vec_id") < 4)  # one per cluster
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_cells=4, nprobe=1, iters=3)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) == 1.0


def test_lsh_near_dups_subset_of_brute_force(spark, sf_dir):
    """The registered LSH near-dup path must report a subset of the exact
    brute-force pairs at the same threshold, with identical cosines —
    brute force is the verifier (VERDICT r1 #5)."""
    from graphchi_cpp_spark.operators.dedup import embedding_near_dups
    from graphchi_cpp_spark.operators.similarity import lsh_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups(emb, threshold=0.45).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_near_dups(emb, threshold=0.45).collect()
    }
    assert set(approx) <= set(brute)
    for pair, cos in approx.items():
        assert cos == pytest.approx(brute[pair], abs=1e-6)
    assert len(approx) >= 0.5 * len(brute)  # banding recall floor


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same payload → same features
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    for r in rows:
        assert again[r["media_id"]] == pytest.approx(r["feature"])
    fs = frame_sample(media, every_ms=500)
    assert fs.filter(F.col("frame_ts_ms") % 500 != 0).count() == 0
    stats = media_stats(media).collect()
    assert {r["kind"] for r in stats} == {"image", "audio", "video"}

    # resize: every image row re-emitted at the target resolution with a
    # payload of exactly width*height bytes; output schema composes with
    # the other media ops (feature extraction runs on the resized table)
    from graphchi_cpp_spark.operators.multimodal import resize_images

    rs = resize_images(media, width=32, height=24)
    rrows = rs.collect()
    assert len(rrows) == media.filter(F.col("kind") == "image").count()
    assert all(len(r["payload"]) == 32 * 24 for r in rrows)
    assert all((r["width"], r["height"]) == (32, 24) for r in rrows)
    assert extract_features(rs, dim=8).count() == len(rrows)
    # deterministic
    again_rs = {r["media_id"]: r["payload"] for r in
                resize_images(media, width=32, height=24).collect()}
    assert all(again_rs[r["media_id"]] == r["payload"] for r in rrows)


def test_multimodal_unknown_kind_raises(spark):
    from graphchi_cpp_spark.operators.multimodal import MEDIA_SCHEMA

    bad = spark.createDataFrame(
        [(1, "hologram", b"xx", 0, 0, 0)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        extract_features(bad).collect()


def test_real_ppm_and_wav_codecs_end_to_end(spark):
    """The de-stubbed codecs: a PPM image and a PCM WAV payload decode
    for real inside the mapInPandas pipeline, and the features match a
    local numpy decode of the same bytes. A non-PPM image payload on
    the same run takes the documented byte-level fallback."""
    import numpy as np

    from graphchi_cpp_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _features_from_signal,
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
    )

    img = np.arange(4 * 3 * 3, dtype=np.float32).reshape(4, 3, 3) / 36.0
    ppm = encode_ppm(img)
    wav = encode_wav(np.sin(np.linspace(0, 20, 500, dtype=np.float32)))
    rows = [
        (0, "image", ppm, 3, 4, 0),
        (1, "audio", wav, 0, 0, 31),
        (2, "image", b"\x01\x02\x03\x04", 2, 2, 0),  # fallback path
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: np.array(r["feature"])
        for r in extract_features(media, dim=8).collect()
    }
    # round-trip: decoded pixels match the encoded image (8-bit quantized)
    assert np.allclose(decode_ppm(ppm), (img * 255).round() / 255.0, atol=1e-6)
    want_img = _features_from_signal(decode_ppm(ppm).reshape(-1), 8)
    want_wav = _features_from_signal(decode_wav(wav), 8)
    assert np.allclose(got[0], want_img, atol=1e-6)
    assert np.allclose(got[1], want_wav, atol=1e-6)
    assert len(got[2]) == 8  # fallback still yields a feature vector
    # P3 (ASCII) variant decodes to the same pixels as P6
    p3 = ("P3\n3 4\n255\n" + " ".join(
        str(int(v)) for v in (img * 255).round().astype(int).reshape(-1)
    )).encode()
    assert np.allclose(decode_ppm(p3), decode_ppm(ppm), atol=1e-6)


def test_png_codec_round_trip_and_filters():
    """REAL PNG codec: encode->decode round-trips every supported
    channel count; scanlines written with each of the five PNG filter
    types (forward-filtered by an independent per-spec reference here)
    decode back to the original pixels; palette images resolve through
    PLTE; Adam7 raises."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from graphchi_cpp_spark.operators.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.random((5, 4, ch)).astype(np.float32)
        got = decode_png(encode_png(img))
        assert got.shape == (5, 4, ch)
        assert np.allclose(got, (img * 255).round() / 255.0, atol=1e-6)

    def png_with_filters(pix, filters):
        """Forward-filter per the PNG spec (independent scalar loops) and
        wrap in minimal chunks — exercises the decoder's unfilter paths."""
        h, w, ch = pix.shape
        p = pix.astype(np.int32)
        scan = bytearray()
        prior = np.zeros((w, ch), dtype=np.int32)
        for y in range(h):
            f = filters[y % len(filters)]
            scan.append(f)
            row = p[y]
            for x in range(w):
                for c in range(ch):
                    a = int(row[x - 1][c]) if x else 0  # left (raw)
                    b = int(prior[x][c])  # up (recon == raw: lossless)
                    cc = int(prior[x - 1][c]) if x else 0  # upper-left
                    v = int(row[x][c])
                    if f == 0:
                        enc = v
                    elif f == 1:
                        enc = v - a
                    elif f == 2:
                        enc = v - b
                    elif f == 3:
                        enc = v - ((a + b) >> 1)
                    else:  # Paeth
                        q = a + b - cc
                        pa, pb, pc2 = abs(q - a), abs(q - b), abs(q - cc)
                        pred = a if (pa <= pb and pa <= pc2) else (b if pb <= pc2 else cc)
                        enc = v - pred
                    scan.append(enc & 0xFF)
            prior = row

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF
            )

        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        return (
            PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(scan)))
            + chunk(b"IEND", b"")
        )

    pix = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png(png_with_filters(pix, filters))
        assert np.array_equal((got * 255).round().astype(np.uint8), pix), filters

    # palette: 2-entry PLTE, indices resolve to RGB
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    scan = b"".join(b"\x00" + row.tobytes() for row in idx)
    pal_png = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    got = (decode_png(pal_png) * 255).round().astype(np.uint8)
    assert got[0, 0].tolist() == [255, 0, 0] and got[0, 1].tolist() == [0, 0, 255]

    adam7 = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(adam7)


def test_png_dispatch_in_extract_features(spark):
    """A PNG payload takes the real-decode path inside mapInPandas: the
    emitted feature equals a local decode of the same bytes, and differs
    from what the byte-level fallback would produce."""
    import numpy as np

    from graphchi_cpp_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _features_from_signal,
        decode_png,
        encode_png,
        extract_features,
    )

    img = np.linspace(0.0, 1.0, 6 * 4 * 3, dtype=np.float32).reshape(6, 4, 3)
    png = encode_png(img)
    media = spark.createDataFrame([(0, "image", png, 4, 6, 0)], MEDIA_SCHEMA)
    (row,) = extract_features(media, dim=8).collect()
    want = _features_from_signal(decode_png(png).reshape(-1), 8)
    assert np.allclose(np.array(row["feature"]), want, atol=1e-6)
    fallback = np.frombuffer(png, dtype=np.uint8).astype(np.float32)[:8] / 255.0
    assert not np.allclose(np.array(row["feature"]), fallback)


def test_resize_images_real_path_png_and_ppm(spark):
    """Decodable payloads (PNG + PPM) take the real resize path: the
    output is a PNG whose pixels match a local decode → bilinear-resize
    of the same source, and metadata carries the new dimensions."""
    import numpy as np

    from graphchi_cpp_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PNG_SIG,
        bilinear_resize,
        decode_png,
        decode_ppm,
        encode_png,
        encode_ppm,
        resize_images,
    )

    rng = np.random.default_rng(11)
    src_png = rng.random((10, 7, 3)).astype(np.float32)
    src_ppm = rng.random((6, 9, 3)).astype(np.float32)
    rows = [
        (0, "image", encode_png(src_png), 7, 10, 0),
        (1, "image", encode_ppm(src_ppm), 9, 6, 0),
        (2, "image", b"\x05\x06\x07\x08", 2, 2, 0),  # fallback path
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in resize_images(media, width=5, height=4).collect()}
    for mid, src, dec in ((0, src_png, decode_png), (1, src_ppm, decode_ppm)):
        assert got[mid]["width"] == 5 and got[mid]["height"] == 4
        out = bytes(got[mid]["payload"])
        assert out[: len(PNG_SIG)] == PNG_SIG
        # local reference: decode source payload, bilinear, 8-bit quantize
        want = bilinear_resize(dec(rows[mid][2]), 4, 5)
        assert np.allclose(
            decode_png(out), (want * 255).round() / 255.0, atol=1e-6
        )
    assert len(bytes(got[2]["payload"])) == 5 * 4  # fallback byte resample
