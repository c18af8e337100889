"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Conventions keeping Spark↔DuckDB hash-comparable:
- every computed column is aliased identically on both sides;
- floating-point outputs of iterative algorithms are rounded (round(x, 4))
  on BOTH sides; money-style sums round(x, 2);
- aggregates that DuckDB widens (sum(BIGINT)→HUGEINT) are cast explicitly.
"""

from __future__ import annotations

import sys
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

# Per-process memo for intermediates shared by several registered queries
# (wcc → wcc_sizes, item sims → itemsim2rating → ap_at_k). Each query
# stays independently callable and deterministic — the memo only avoids
# recomputing the identical upstream DataFrame when several queries run
# in one process (the bench/driver loop). Keyed on the Spark application
# id so a fresh session never sees another session's checkpoints.
_MEMO: dict = {}


def _memo(spark: SparkSession, sf_dir: str, key: str, build):
    k = (spark.sparkContext.applicationId, sf_dir, key)
    if k not in _MEMO:
        _MEMO[k] = build().localCheckpoint(eager=True)
    return _MEMO[k]


def query(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------- #
# graph algorithms
# --------------------------------------------------------------------- #
def _bipartite_graph(spark, sf_dir):
    from graphchi_cpp_spark.datasets import bipartite_edges
    from graphchi_cpp_spark.graph import PropertyGraph

    e = _memo(
        spark, sf_dir, "edges_bipartite", lambda: bipartite_edges(spark, sf_dir)
    )
    return PropertyGraph.from_edges(e)


def _cosupply_graph(spark, sf_dir):
    from graphchi_cpp_spark.datasets import cosupply_edges
    from graphchi_cpp_spark.graph import PropertyGraph

    # the supplier co-supply derivation is a lineitem self-join — by far
    # the most expensive "scan"; five registered queries share it
    e = _memo(
        spark, sf_dir, "edges_cosupply", lambda: cosupply_edges(spark, sf_dir)
    )
    return PropertyGraph.from_edges(e)


def _ratings(spark, sf_dir):
    from graphchi_cpp_spark.datasets import ratings

    return _memo(spark, sf_dir, "ratings", lambda: ratings(spark, sf_dir))


def _register_core():
    from graphchi_cpp_spark.algos.pagerank import pagerank, pagerank_sql
    from graphchi_cpp_spark.algos.connected_components import (
        component_sizes,
        connected_components,
        wcc_sql,
    )
    from graphchi_cpp_spark.datasets import (
        BIPARTITE_EDGES_SQL,
        COSUPPLY_EDGES_SQL,
    )

    @query("pagerank", pagerank_sql(BIPARTITE_EDGES_SQL, iterations=3))
    def q_pagerank(spark, sf_dir):
        g = _bipartite_graph(spark, sf_dir)
        return pagerank(g, max_iter=3).select(
            "id", F.round("rank", 4).alias("rank")
        )

    def _wcc(spark, sf_dir):
        return _memo(
            spark,
            sf_dir,
            "wcc_cosupply",
            lambda: connected_components(_cosupply_graph(spark, sf_dir)),
        )

    @query("wcc", wcc_sql(COSUPPLY_EDGES_SQL))
    def q_wcc(spark, sf_dir):
        return _wcc(spark, sf_dir)

    # large-star/small-star contraction (O(log² V) rounds — the
    # high-diameter / union-find-contract path) vs the same oracle
    @query("wcc_star", wcc_sql(COSUPPLY_EDGES_SQL))
    def q_wcc_star(spark, sf_dir):
        from graphchi_cpp_spark.algos.connected_components import (
            connected_components_star,
        )

        return connected_components_star(_cosupply_graph(spark, sf_dir))

    @query(
        "wcc_sizes",
        f"""
        WITH cc AS ({wcc_sql(COSUPPLY_EDGES_SQL)})
        SELECT component, count(*) AS size FROM cc GROUP BY component
        """,
    )
    def q_wcc_sizes(spark, sf_dir):
        return component_sizes(_wcc(spark, sf_dir))

    @query(
        "degree_distribution",
        f"""
        WITH edges AS ({BIPARTITE_EDGES_SQL}),
        deg AS (
            SELECT id,
                   coalesce(i.ind, 0) + coalesce(o.outd, 0) AS degree
            FROM (SELECT src AS id FROM edges UNION SELECT dst FROM edges) v
            LEFT JOIN (SELECT dst AS id, count(*) AS ind FROM edges GROUP BY 1) i USING (id)
            LEFT JOIN (SELECT src AS id, count(*) AS outd FROM edges GROUP BY 1) o USING (id)
        )
        SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree
        """,
    )
    def q_degree_distribution(spark, sf_dir):
        from graphchi_cpp_spark.operators.aggregates import degree_distribution

        g = _bipartite_graph(spark, sf_dir)
        return degree_distribution(g.degrees())


def _register_ops():
    from graphchi_cpp_spark.datasets import RATINGS_SQL, ratings
    from graphchi_cpp_spark.operators.toplist import top_k_per_key

    @query(
        "topk_per_user",
        f"""
        WITH r AS ({RATINGS_SQL})
        SELECT "user", item, rating, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY "user" ORDER BY rating DESC, item ASC
            ) AS rank
            FROM r
        ) WHERE rank <= 5
        """,
    )
    def q_topk_per_user(spark, sf_dir):
        r = _ratings(spark, sf_dir)
        return top_k_per_key(
            r, "user", "rating", k=5, tiebreak_col="item"
        ).select("user", "item", "rating", F.col("rank").cast("long"))


def _register_graph_algos():
    from graphchi_cpp_spark.algos.kcores import kcores, kcores_sql
    from graphchi_cpp_spark.algos.label_propagation import lpa_communities, lpa_sql
    from graphchi_cpp_spark.algos.percolation import (
        bond_percolation,
        percolation_survivors_sql,
    )
    from graphchi_cpp_spark.algos.subgraph import khop_vertices, khop_vertices_sql
    from graphchi_cpp_spark.algos.connected_components import wcc_sql
    from graphchi_cpp_spark.algos.triangles import (
        triangle_count,
        triangles_per_vertex,
        triangles_per_vertex_sql,
    )
    from graphchi_cpp_spark.datasets import BIPARTITE_EDGES_SQL, COSUPPLY_EDGES_SQL

    @query("triangles_per_vertex", triangles_per_vertex_sql(COSUPPLY_EDGES_SQL))
    def q_tpv(spark, sf_dir):
        return triangles_per_vertex(_cosupply_graph(spark, sf_dir), orient="id")

    @query(
        "triangle_count",
        f"""
        WITH e AS ({COSUPPLY_EDGES_SQL})
        SELECT count(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        """,
    )
    def q_tc(spark, sf_dir):
        # degree orientation exercises the S11 optimization; count is
        # orientation-invariant so the id-oriented oracle matches
        return triangle_count(_cosupply_graph(spark, sf_dir), orient="degree")

    # h-index fixpoint both sides; unroll count covers convergence at
    # sf0.01 with margin (extra iterations are identity at the fixpoint)
    @query("kcores", kcores_sql(COSUPPLY_EDGES_SQL, iterations=24))
    def q_kcores(spark, sf_dir):
        return kcores(_cosupply_graph(spark, sf_dir))

    @query("lpa_communities", lpa_sql(COSUPPLY_EDGES_SQL, 2))
    def q_lpa(spark, sf_dir):
        return lpa_communities(_cosupply_graph(spark, sf_dir), max_iter=2)

    _SEEDS_SQL = (
        f"SELECT id FROM (SELECT src AS id FROM ({BIPARTITE_EDGES_SQL}) "
        f"UNION SELECT dst FROM ({BIPARTITE_EDGES_SQL})) WHERE id % 50 = 0"
    )

    @query("khop_vertices", khop_vertices_sql(BIPARTITE_EDGES_SQL, _SEEDS_SQL, 2))
    def q_khop(spark, sf_dir):
        g = _bipartite_graph(spark, sf_dir)
        seeds = g.vertices.filter(F.col("id") % 50 == 0)
        return khop_vertices(g, seeds, 2)

    @query(
        "bond_percolation",
        wcc_sql(
            percolation_survivors_sql(COSUPPLY_EDGES_SQL, 0.5),
            vertices_sql=(
                f"SELECT src AS id FROM ({COSUPPLY_EDGES_SQL}) "
                f"UNION SELECT dst FROM ({COSUPPLY_EDGES_SQL})"
            ),
        ),
    )
    def q_percolation(spark, sf_dir):
        return bond_percolation(_cosupply_graph(spark, sf_dir), p=0.5)


def _register_cf():
    from graphchi_cpp_spark.cf.als import als, recommend_top_k
    from graphchi_cpp_spark.cf.baselines import baseline_predict, baseline_predict_sql
    from graphchi_cpp_spark.cf.eval import ap_at_k_sql, average_precision_at_k
    from graphchi_cpp_spark.cf.itemcf import item_similarity, item_similarity_sql
    from graphchi_cpp_spark.datasets import RATINGS_SQL, ratings
    from graphchi_cpp_spark.operators.toplist import top_k_per_key

    def _jaccard_sims(spark, sf_dir):
        return _memo(
            spark,
            sf_dir,
            "sims_jaccard_mc2",
            lambda: item_similarity(_ratings(spark, sf_dir), "jaccard", min_common=2),
        )

    @query(
        "itemcf_jaccard",
        f"""
        SELECT item_a, item_b, round(sim, 6) AS sim
        FROM ({item_similarity_sql(RATINGS_SQL, "jaccard", min_common=2)})
        """,
    )
    def q_itemcf_jaccard(spark, sf_dir):
        return _jaccard_sims(spark, sf_dir).select(
            "item_a", "item_b", F.round("sim", 6).alias("sim")
        )

    from graphchi_cpp_spark.cf.itemcf import (
        edge_jaccard_weight,
        edge_jaccard_weight_sql,
    )

    # items offset into their own vertex space (reference MM bipartite
    # convention: users 1..M, items M+1..M+N) so degrees never merge
    _RATINGS_EDGES_SQL = (
        f'SELECT "user" AS src, item + 1000000 AS dst, rating AS weight '
        f"FROM ({RATINGS_SQL})"
    )

    @query(
        "edge_jaccard_weight",
        f"""
        SELECT item_a, item_b, round(sim, 6) AS sim
        FROM ({edge_jaccard_weight_sql(_RATINGS_EDGES_SQL)})
        """,
    )
    def q_edge_jaccard_weight(spark, sf_dir):
        # itemcf3 --distance=9 (JACCARD_WEIGHT): direct-edge weighted
        # Jaccard over the ratings bipartite graph
        edges = _ratings(spark, sf_dir).select(
            F.col("user").alias("src"),
            (F.col("item") + 1000000).alias("dst"),
            F.col("rating").alias("weight"),
        )
        return edge_jaccard_weight(edges).select(
            "item_a", "item_b", F.round("sim", 6).alias("sim")
        )

    @query(
        "itemcf_adamic_adar",
        f"""
        SELECT item_a, item_b, round(sim, 6) AS sim
        FROM ({item_similarity_sql(RATINGS_SQL, "aa", min_common=2)})
        """,
    )
    def q_itemcf_aa(spark, sf_dir):
        return item_similarity(_ratings(spark, sf_dir), "aa", min_common=2).select(
            "item_a", "item_b", F.round("sim", 6).alias("sim")
        )

    @query(
        "baseline_bias_predict",
        f"""
        SELECT "user", item, round(rating, 4) AS rating,
               round(prediction, 4) AS prediction
        FROM ({baseline_predict_sql(RATINGS_SQL, "bias")})
        """,
    )
    def q_baseline_bias(spark, sf_dir):
        return baseline_predict(_ratings(spark, sf_dir), "bias").select(
            "user",
            "item",
            F.round("rating", 4).alias("rating"),
            F.round("prediction", 4).alias("prediction"),
        )

    # itemsim2rating (M11) with a full SQL oracle: jaccard sims → history
    # scores (rounded to kill ulp-order differences) → top-5 unseen per user
    _SIMS = item_similarity_sql(RATINGS_SQL, "jaccard", min_common=2)
    _RECS_SQL = f"""
        WITH sims AS ({_SIMS}),
        both_dirs AS (
            SELECT item_a, item_b, sim FROM sims
            UNION ALL
            SELECT item_b AS item_a, item_a AS item_b, sim FROM sims
        ),
        hist AS (SELECT DISTINCT "user", item FROM ({RATINGS_SQL})),
        scores AS (
            SELECT h."user", b.item_b AS item, round(sum(b.sim), 6) AS score
            FROM hist h JOIN both_dirs b ON b.item_a = h.item
            GROUP BY h."user", b.item_b
        ),
        unseen AS (
            SELECT s.* FROM scores s
            LEFT JOIN hist h ON h."user" = s."user" AND h.item = s.item
            WHERE h.item IS NULL
        )
        SELECT "user", item, score, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY "user" ORDER BY score DESC, item ASC
            ) AS rank FROM unseen
        ) WHERE rank <= 5
    """

    def _spark_recs(spark, sf_dir):
        def build():
            from graphchi_cpp_spark.cf.itemcf import itemsim2rating

            r = _ratings(spark, sf_dir)
            sims = _jaccard_sims(spark, sf_dir)
            # same score/rank semantics as before (round-6 before
            # ranking, item tiebreak, seen excluded) — the library op
            # now runs the broadcast-sims single-exchange plan
            return itemsim2rating(r, sims, k=5, score_ndigits=6).select(
                "user", "item", "score", F.col("rank").cast("long")
            )

        return _memo(spark, sf_dir, "recs_jaccard_top5", build)

    query("itemsim2rating", _RECS_SQL)(_spark_recs)

    # MAP-style eval (M14): AP@5 of those recs vs "liked" truth (rating >= 4)
    _TRUTH_SQL = f'SELECT "user", item FROM ({RATINGS_SQL}) WHERE rating >= 4'

    @query(
        "ap_at_k",
        f"""
        SELECT "user", round(ap, 6) AS ap
        FROM ({ap_at_k_sql(_RECS_SQL, _TRUTH_SQL, 5)})
        """,
    )
    def q_ap_at_k(spark, sf_dir):
        recs = _spark_recs(spark, sf_dir)
        truth = _ratings(spark, sf_dir).filter(F.col("rating") >= 4).select("user", "item")
        return average_precision_at_k(recs, truth, 5).select(
            "user", F.round("ap", 6).alias("ap")
        )

    from graphchi_cpp_spark.cf.itemcf import itemcf_cv, itemcf_cv_sql

    # K-fold CV driver (itemcf2/itemcf3 role): md5 fold hash + rounded
    # scores make the whole pipeline hash-comparable fold-for-fold
    @query("itemcf_cv", itemcf_cv_sql(RATINGS_SQL, k_folds=3))
    def q_itemcf_cv(spark, sf_dir):
        return itemcf_cv(_ratings(spark, sf_dir), k_folds=3)

    from graphchi_cpp_spark.cf.als import als_recommend_sql, als_sql

    # d=2: the 2x2 normal equations unroll to closed-form SQL, making the
    # full ALS trajectory (and the factor-based recommendations below)
    # hash-checkable; d=5 runs stay covered by tests + als_ml_rmse
    @query("als_rmse_history", als_sql(RATINGS_SQL, iterations=3))
    def q_als_history(spark, sf_dir):
        _, _, hist = als(_ratings(spark, sf_dir), d=2, iterations=3)
        return spark.createDataFrame(
            [(h["iter"], round(h["train_rmse"], 4)) for h in hist],
            "iter int, train_rmse double",
        )

    @query("als_recommend", als_recommend_sql(RATINGS_SQL, iterations=2, k=3))
    def q_als_recommend(spark, sf_dir):
        r = _ratings(spark, sf_dir)
        uf, itf, _ = als(r, d=2, iterations=2)
        # restrict to a deterministic user subset to bound the crossJoin
        uf = uf.filter(F.col("user") % 100 == 0)
        return recommend_top_k(uf, itf, seen=r, k=3, score_ndigits=4).select(
            "user", "item", "score", F.col("rank").cast("long")
        )


def _register_pipeline_ops():
    from graphchi_cpp_spark.operators.dedup import (
        exact_duplicates,
        exact_duplicates_sql,
        lsh_candidates,
        lsh_candidates_sql,
        minhash_dedup_pairs,
        minhash_dedup_pairs_sql,
        simhash,
        simhash_sql,
    )
    from graphchi_cpp_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_sql,
        lsh_cosine_topk,
        lsh_cosine_topk_sql,
        lsh_near_dups,
        lsh_near_dups_sql,
    )
    from graphchi_cpp_spark.operators.text import (
        fingerprints,
        fingerprints_sql,
        language_id,
        language_id_sql,
        quality_scores,
        quality_scores_sql,
        token_stats,
        token_stats_sql,
    )

    def _docs(spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def _emb(spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    @query("token_stats", token_stats_sql())
    def q_token_stats(spark, sf_dir):
        return token_stats(_docs(spark, sf_dir))

    from graphchi_cpp_spark.operators.text import (
        repetition_stats,
        repetition_stats_sql,
    )

    @query("repetition_stats", repetition_stats_sql())
    def q_repetition_stats(spark, sf_dir):
        return repetition_stats(_docs(spark, sf_dir))

    @query("quality_scores", quality_scores_sql())
    def q_quality(spark, sf_dir):
        return quality_scores(_docs(spark, sf_dir))

    @query("language_id", language_id_sql())
    def q_langid(spark, sf_dir):
        return language_id(_docs(spark, sf_dir))

    @query("doc_fingerprints", fingerprints_sql())
    def q_fp(spark, sf_dir):
        return fingerprints(_docs(spark, sf_dir))

    @query("exact_dedup", exact_duplicates_sql())
    def q_exact_dedup(spark, sf_dir):
        return exact_duplicates(_docs(spark, sf_dir))

    @query("minhash_lsh_candidates", lsh_candidates_sql())
    def q_lsh_cand(spark, sf_dir):
        return lsh_candidates(_docs(spark, sf_dir))

    @query("streaming_lsh_candidates", lsh_candidates_sql())
    def q_streaming_lsh_cand(spark, sf_dir):
        # X5+ streaming twin of minhash_lsh_candidates, EXECUTED as a
        # real Structured Streaming query: the corpus is replayed as two
        # interleaved micro-batches through the applyInPandasWithState
        # bucket op (streaming/dedup.py), and the emitted pair set must
        # hash-match the same batch SQL oracle — a streaming operator
        # held to the batch correctness contract.
        import os
        import shutil
        import tempfile
        import uuid

        from graphchi_cpp_spark.streaming.dedup import streaming_lsh_candidates

        d = tempfile.mkdtemp(prefix="graft_stream_lsh_")
        try:
            indir = os.path.join(d, "in")
            os.makedirs(indir)
            rows = _docs(spark, sf_dir).select("doc_id", "text").collect()
            import json as _json

            for b in range(2):
                with open(os.path.join(indir, f"b{b}.json"), "w") as f:
                    for i, r in enumerate(rows):
                        if i % 2 == b:
                            f.write(
                                _json.dumps(
                                    {"doc_id": r["doc_id"], "text": r["text"]}
                                )
                                + "\n"
                            )
            sink = f"stream_lsh_{uuid.uuid4().hex[:8]}"
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .json(indir)
            )
            q = (
                streaming_lsh_candidates(stream)
                .writeStream.format("memory")
                .queryName(sink)
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                # stop the zombie stream BEFORE the finally rmtree pulls
                # its checkpoint out from under it
                q.stop()
                raise TimeoutError("streaming_lsh_candidates run exceeded 600s")
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return spark.table(sink).select("doc_a", "doc_b").distinct()

    @query("streaming_lsh_batched", lsh_candidates_sql())
    def q_streaming_lsh_batched(spark, sf_dir):
        # the JVM-join foreachBatch variant of streaming_lsh_candidates
        # (streaming/dedup.py BatchedLshDedup), run as a REAL readStream
        # + foreachBatch over three interleaved micro-batches; the
        # accumulated pair set must hash-match the same batch SQL oracle
        import json as _json
        import os
        import shutil
        import tempfile

        from graphchi_cpp_spark.streaming.dedup import BatchedLshDedup

        d = tempfile.mkdtemp(prefix="graft_stream_lshb_")
        pairs: set = set()
        try:
            indir = os.path.join(d, "in")
            os.makedirs(indir)
            rows = _docs(spark, sf_dir).select("doc_id", "text").collect()
            for b in range(3):
                with open(os.path.join(indir, f"b{b}.json"), "w") as f:
                    for i, r in enumerate(rows):
                        if i % 3 == b:
                            f.write(
                                _json.dumps(
                                    {"doc_id": r["doc_id"], "text": r["text"]}
                                )
                                + "\n"
                            )
            dedup = BatchedLshDedup(os.path.join(d, "state"))

            def handle(batch_df, batch_id):
                pairs.update(
                    (r["doc_a"], r["doc_b"])
                    for r in dedup.process(batch_df, batch_id).collect()
                )

            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .json(indir)
            )
            q = (
                stream.writeStream.foreachBatch(handle)
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("streaming_lsh_batched run exceeded 600s")
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return spark.createDataFrame(
            sorted(pairs), "doc_a long, doc_b long"
        )

    @query("minhash_dedup", minhash_dedup_pairs_sql(threshold=0.3))
    def q_minhash_dedup(spark, sf_dir):
        return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.3)

    @query(
        "streaming_exact_dedup",
        """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        )
        SELECT md5(text) AS h, 1 AS n_survivors FROM corpus GROUP BY md5(text)
        """,
    )
    def q_streaming_exact_dedup(spark, sf_dir):
        # X5+ streaming exact dedup EXECUTED as a real Structured
        # Streaming run over the corpus PLUS planted exact duplicates
        # (every 10th doc replayed under doc_id+1M, so the drop branch
        # actually fires). The contract is ORDER-INSENSITIVE on purpose:
        # which copy of a duplicate group survives depends on per-key
        # arrival order inside the shuffled micro-batch (file splits
        # under maxPartitionBytes make it nondeterministic at larger
        # sf), so the oracle pins what dedup actually guarantees — every
        # distinct text survives EXACTLY ONCE (h + survivor count per
        # hash), not which doc_id carried it.
        import os
        import shutil
        import tempfile
        import uuid

        from graphchi_cpp_spark.streaming.dedup import streaming_exact_dedup

        d = tempfile.mkdtemp(prefix="graft_stream_exact_")
        try:
            indir = os.path.join(d, "in")
            os.makedirs(indir)
            base = _docs(spark, sf_dir).select("doc_id", "text")
            from pyspark.sql import functions as SF

            planted = base.filter(SF.col("doc_id") % 10 == 0).select(
                (SF.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
            rows = sorted(
                base.unionByName(planted).collect(),
                key=lambda r: r["doc_id"],
            )
            import json as _json

            half = (len(rows) + 1) // 2
            for b, chunk in enumerate((rows[:half], rows[half:])):
                with open(os.path.join(indir, f"b{b}.json"), "w") as f:
                    for i, r in enumerate(chunk):
                        f.write(
                            _json.dumps(
                                {
                                    "doc_id": r["doc_id"],
                                    # synthetic monotone event time, all
                                    # within the 1h watermark horizon
                                    "ts": f"2024-01-01T10:{(b * half + i) % 60:02d}:00",
                                    "text": r["text"],
                                }
                            )
                            + "\n"
                        )
            sink = f"stream_exact_{uuid.uuid4().hex[:8]}"
            stream = (
                spark.readStream.schema("doc_id long, ts timestamp, text string")
                .option("maxFilesPerTrigger", 1)
                .json(indir)
            )
            q = (
                streaming_exact_dedup(stream)
                .writeStream.format("memory")
                .queryName(sink)
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("streaming_exact_dedup run exceeded 600s")
        finally:
            shutil.rmtree(d, ignore_errors=True)
        from pyspark.sql import functions as SF2

        return (
            spark.table(sink)
            .groupBy("h")
            .agg(SF2.count("*").alias("n_survivors"))
            .select("h", SF2.col("n_survivors").cast("int").alias("n_survivors"))
        )

    # exact inverted-index variant; the REGISTERED contract is the
    # scale-safe one: max_df stop-shingle pruning ON by default
    # (DEFAULT_MAX_SHINGLE_DF) for candidate generation, with the
    # intersection re-counted against the unpruned shingle table so
    # reported Jaccards stay exact. max_df=None = uncapped opt-in.
    from graphchi_cpp_spark.operators.dedup import (
        ngram_jaccard_dedup,
        ngram_jaccard_dedup_sql,
    )

    @query("ngram_jaccard_dedup", ngram_jaccard_dedup_sql(threshold=0.3))
    def q_ngram_jaccard_dedup(spark, sf_dir):
        return ngram_jaccard_dedup(_docs(spark, sf_dir), threshold=0.3)

    # same operator with max_df forced BELOW the corpus's max shingle
    # df (sf0.01 tops out at 7), so the driver gate exercises the
    # pruned-candidate + dropped-shingle-recount branch rather than the
    # empty-stop-set short circuit the default takes at test scale
    @query(
        "ngram_jaccard_dedup_pruned",
        ngram_jaccard_dedup_sql(threshold=0.3, max_df=3),
    )
    def q_ngram_jaccard_dedup_pruned(spark, sf_dir):
        return ngram_jaccard_dedup(
            _docs(spark, sf_dir), threshold=0.3, max_df=3
        )

    # decontamination: every 10th doc plays the "benchmark suite",
    # the rest the training corpus; probe shingles broadcast
    from graphchi_cpp_spark.operators.dedup import (
        ngram_contamination,
        ngram_contamination_sql,
    )

    @query(
        "ngram_contamination",
        ngram_contamination_sql(
            "doc_id % 10 != 0", "doc_id % 10 = 0", n=5, min_containment=0.2
        ),
    )
    def q_ngram_contamination(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return ngram_contamination(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            n=5,
            min_containment=0.2,
        )

    # full corpus-cleaning composition: dedup -> quality/repetition
    # filters -> decontamination, verified end-to-end via nested CTEs
    from graphchi_cpp_spark.pipeline import clean_corpus, clean_corpus_sql

    @query(
        "clean_corpus",
        clean_corpus_sql(
            "doc_id % 10 != 0",
            "doc_id % 10 = 0",
            quality_min=0.5,
            dup_bigram_max=0.5,
            contamination_max=0.8,
        ),
    )
    def q_clean_corpus(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return clean_corpus(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            quality_min=0.5,
            dup_bigram_max=0.5,
            contamination_max=0.8,
        )

    @query("simhash", simhash_sql())
    def q_simhash(spark, sf_dir):
        return simhash(_docs(spark, sf_dir))

    # the LSH-bucketed path is the registered contract (no crossJoin in
    # the plan — scale path); brute-force embedding_near_dups stays as
    # the exact verifier in tests/test_pipeline_ops.py
    @query("embedding_near_dups", lsh_near_dups_sql(0.45))
    def q_emb_near_dups(spark, sf_dir):
        return lsh_near_dups(_emb(spark, sf_dir), threshold=0.45)

    # multimodal plumbing (mapInPandas decode stub) verified end-to-end:
    # the synthetic payload bytes are formula-deterministic, so DuckDB
    # recomputes n_bytes and the float32 feature checksum independently
    @query(
        "multimodal_features",
        """
        SELECT i AS media_id,
               CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                          ELSE 'video' END AS kind,
               CAST(64 + (i % 5) * 16 AS BIGINT) AS n_bytes,
               round((
                 SELECT sum(CAST(CAST((i * 31 + j * 7) % 251 AS FLOAT)
                                 / CAST(255.0 AS FLOAT) AS DOUBLE))
                 FROM range(16) t(j)
               ), 4) AS feat_sum
        FROM range(100) r(i)
        """,
    )
    def q_multimodal(spark, sf_dir):
        from graphchi_cpp_spark.operators.multimodal import (
            extract_features,
            synthetic_media,
        )

        feats = extract_features(synthetic_media(spark, 100), dim=16)
        return feats.select(
            "media_id",
            "kind",
            "n_bytes",
            F.round(
                F.aggregate(
                    F.col("feature").cast("array<double>"),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                4,
            ).alias("feat_sum"),
        )

    # REAL PNG decode verified end-to-end: payload pixel bytes follow an
    # exact integer formula, so DuckDB recomputes each decoded image's
    # pixel sum without any PNG library (decode_png round-trips exactly)
    @query(
        "multimodal_png_decode",
        """
        SELECT i AS media_id,
               CAST(4 AS BIGINT) AS height,
               CAST(3 AS BIGINT) AS width,
               CAST(3 AS BIGINT) AS channels,
               CAST((SELECT sum((i * 31 + j * 7) % 251) FROM range(36) t(j))
                    AS BIGINT) AS pixel_sum
        FROM range(100) r(i)
        """,
    )
    def q_multimodal_png(spark, sf_dir):
        from graphchi_cpp_spark.operators.multimodal import (
            image_stats,
            synthetic_png_media,
        )

        return image_stats(synthetic_png_media(spark, 100))

    @query("ann_cosine_topk", cosine_topk_sql("vec_id % 20 = 0", k=5))
    def q_ann_brute(spark, sf_dir):
        emb = _emb(spark, sf_dir)
        return cosine_topk(emb, emb.filter(F.col("vec_id") % 20 == 0), k=5).select(
            "query_id", "vec_id", "cosine", F.col("rank").cast("long")
        )

    @query("ann_lsh_topk", lsh_cosine_topk_sql("vec_id % 20 = 0", k=5))
    def q_ann_lsh(spark, sf_dir):
        emb = _emb(spark, sf_dir)
        return lsh_cosine_topk(
            emb, emb.filter(F.col("vec_id") % 20 == 0), k=5
        ).select("query_id", "vec_id", "cosine", F.col("rank").cast("long"))

    # IVF scale path: iters=0 (seed centroids) is the oracled contract;
    # Lloyd-refined centroids (iters>0) are recall-tested in pytest
    from graphchi_cpp_spark.operators.similarity import ivf_topk, ivf_topk_sql

    @query("ann_ivf_topk", ivf_topk_sql("vec_id % 20 = 0", k=5, n_cells=8, nprobe=3))
    def q_ann_ivf(spark, sf_dir):
        emb = _emb(spark, sf_dir)
        return ivf_topk(
            emb, emb.filter(F.col("vec_id") % 20 == 0), k=5, n_cells=8, nprobe=3
        ).select("query_id", "vec_id", "cosine", F.col("rank").cast("long"))


def _register_advanced_algos():
    from graphchi_cpp_spark.algos.msf import minimum_spanning_forest
    from graphchi_cpp_spark.algos.random_walks import random_walks, random_walks_sql
    from graphchi_cpp_spark.algos.scc import scc_sql, strongly_connected_components
    from graphchi_cpp_spark.datasets import ORDERFLOW_EDGES_SQL, orderflow_edges
    from graphchi_cpp_spark.graph import PropertyGraph

    def _orderflow(spark, sf_dir):
        # memoized: the derivation includes a driver-side customer.count()
        e = _memo(
            spark, sf_dir, "edges_orderflow", lambda: orderflow_edges(spark, sf_dir)
        )
        return PropertyGraph.from_edges(e)

    @query("scc", scc_sql(ORDERFLOW_EDGES_SQL))
    def q_scc(spark, sf_dir):
        return strongly_connected_components(_orderflow(spark, sf_dir))

    from graphchi_cpp_spark.algos.msf import msf_sql

    # the (w, src, dst) total order makes the forest unique, so the
    # unrolled-Borůvka oracle and the Spark contraction loop must agree
    # edge-for-edge (tests additionally cross-check against Kruskal)
    _MSF_EDGES_SQL = (
        "SELECT src, dst, CAST((src * 7 + dst * 13) % 97 + 1 AS DOUBLE) "
        f"AS weight FROM ({ORDERFLOW_EDGES_SQL})"
    )

    @query("msf", msf_sql(_MSF_EDGES_SQL))
    def q_msf(spark, sf_dir):
        g = _orderflow(spark, sf_dir)
        e = g.edges.select(
            "src",
            "dst",
            (F.pmod(F.col("src") * 7 + F.col("dst") * 13, F.lit(97)) + 1)
            .cast("double")
            .alias("weight"),
        )
        return minimum_spanning_forest(PropertyGraph(e))

    _WALK_SOURCES_SQL = (
        f"SELECT id FROM (SELECT src AS id FROM ({ORDERFLOW_EDGES_SQL}) "
        f"UNION SELECT dst FROM ({ORDERFLOW_EDGES_SQL})) WHERE id % 100 = 0"
    )

    @query(
        "random_walks",
        random_walks_sql(
            ORDERFLOW_EDGES_SQL, _WALK_SOURCES_SQL, walks_per_source=5, steps=4
        ),
    )
    def q_walks(spark, sf_dir):
        g = _orderflow(spark, sf_dir)
        sources = g.vertices.filter(F.col("id") % 100 == 0)
        return random_walks(g, sources, walks_per_source=5, steps=4)


def _register_parsers_streaming():
    from graphchi_cpp_spark.datasets import (
        BIPARTITE_EDGES_SQL,
        ORDERFLOW_EDGES_SQL,
        bipartite_edges,
        load_table,
        orderflow_edges,
    )
    from graphchi_cpp_spark.graph import PropertyGraph
    from graphchi_cpp_spark.operators.aggregates import (
        aggregate_per_key,
        value_counts,
    )
    from graphchi_cpp_spark.sources.readers import densify_ids

    @query(
        "aggregator_per_key",
        """
        SELECT user_id, event_type, round(sum(value), 4) AS sum_value
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type
        """,
    )
    def q_aggregator(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        return aggregate_per_key(ev, ["user_id", "event_type"], "value").select(
            "user_id", "event_type", F.round("sum_value", 4).alias("sum_value")
        )

    @query(
        "value_counts",
        """
        SELECT event_type, count(*) AS count FROM events GROUP BY event_type
        """,
    )
    def q_value_counts(spark, sf_dir):
        return value_counts(load_table(spark, sf_dir, "events"), "event_type")

    @query(
        "densify_ids",
        f"""
        WITH verts AS (
            SELECT src AS orig FROM ({BIPARTITE_EDGES_SQL})
            UNION SELECT dst FROM ({BIPARTITE_EDGES_SQL})
        )
        SELECT orig, row_number() OVER (ORDER BY orig) - 1 AS dense_id
        FROM verts
        """,
    )
    def q_densify(spark, sf_dir):
        _, mapping = densify_ids(bipartite_edges(spark, sf_dir))
        return mapping.select("orig", "dense_id")

    from graphchi_cpp_spark.streaming.ingest import streaming_pagerank_sql

    # stage s sees base (pmod 0) plus batches 1..s — the pmod classes are
    # disjoint, so the cumulative deduped union is a simple <= filter
    _STREAM_STAGES = [
        f"SELECT DISTINCT src, dst FROM ({ORDERFLOW_EDGES_SQL}) "
        f"WHERE (src + dst) % 4 <= {s}"
        for s in (1, 2, 3)
    ]

    # C8/X2/X3: tombstone deletes + buffer visibility + compaction — the
    # visible edge set is pure set algebra, so the oracle is direct SQL
    @query(
        "streaming_edges_after_deletes",
        f"""
        WITH e AS ({ORDERFLOW_EDGES_SQL}),
        base AS (SELECT src, dst FROM e WHERE (src + dst) % 4 <= 1),
        adds AS (SELECT src, dst FROM e WHERE (src + dst) % 4 = 2),
        dels AS (SELECT src, dst FROM base WHERE (src * 3 + dst) % 7 = 0)
        SELECT DISTINCT b.src, b.dst
        FROM (SELECT * FROM base UNION SELECT * FROM adds) b
        LEFT JOIN dels d ON d.src = b.src AND d.dst = b.dst
        WHERE d.src IS NULL
        """,
    )
    def q_streaming_deletes(spark, sf_dir):
        from graphchi_cpp_spark.streaming.ingest import DynamicGraph

        e = _memo(
            spark, sf_dir, "edges_orderflow", lambda: orderflow_edges(spark, sf_dir)
        )
        base = e.filter(F.pmod(F.col("src") + F.col("dst"), F.lit(4)) <= 1)
        dg = DynamicGraph(base)
        adds = e.filter(F.pmod(F.col("src") + F.col("dst"), F.lit(4)) == 2)
        dels = base.filter(F.pmod(F.col("src") * 3 + F.col("dst"), F.lit(7)) == 0)
        dg.ingest_batch(adds.withColumn("op", F.lit("add")))
        dg.ingest_batch(dels.withColumn("op", F.lit("delete")))
        if dg.should_compact():
            dg.compact()  # X3: fold buffer into the rewritten base
        return dg.edges().select("src", "dst")

    @query(
        "streaming_pagerank",
        streaming_pagerank_sql(_STREAM_STAGES, supersteps_per_batch=3),
    )
    def q_streaming_pagerank(spark, sf_dir):
        from graphchi_cpp_spark.streaming.ingest import (
            DynamicGraph,
            run_streaming_pagerank,
        )

        e = _memo(
            spark, sf_dir, "edges_orderflow", lambda: orderflow_edges(spark, sf_dir)
        )
        base = e.filter(F.pmod(F.col("src") + F.col("dst"), F.lit(4)) == 0)
        batches = [
            e.filter(F.pmod(F.col("src") + F.col("dst"), F.lit(4)) == i).withColumn(
                "op", F.lit("add")
            )
            for i in (1, 2, 3)
        ]
        dg = DynamicGraph(base)
        ranks = run_streaming_pagerank(dg, batches, supersteps_per_batch=3)
        return ranks.select("id", F.round("rank", 4).alias("rank"))


def _register_ml_extras():
    from graphchi_cpp_spark.algos.label_propagation import seeded_label_propagation
    from graphchi_cpp_spark.cf.nmf import nmf
    from graphchi_cpp_spark.cf.sgd import sgd
    from graphchi_cpp_spark.cf.svd import lanczos_svd
    from graphchi_cpp_spark.datasets import cosupply_edges, ratings
    from graphchi_cpp_spark.graph import PropertyGraph

    from graphchi_cpp_spark.cf.svd import lowrank_fixture, lowrank_sigma_sql
    from graphchi_cpp_spark.datasets import RATINGS_SQL as _RSQL_SVD

    # Both SVD queries run the full Lanczos operators on a deterministic
    # rank-3 fixture over the ratings id universe: Lanczos is exact on
    # rank-3 input, and the fixture's singular values have a closed form
    # (trig-cubic on the 3×3 Gram product) DuckDB can evaluate — value-
    # hashed trajectories instead of rows-only checks.
    @query("svd_singular_values", lowrank_sigma_sql(_RSQL_SVD))
    def q_svd(spark, sf_dir):
        s, _, _ = lanczos_svd(lowrank_fixture(_ratings(spark, sf_dir)), k=3)
        return spark.createDataFrame(
            [(i, round(float(v), 4)) for i, v in enumerate(s)],
            "rank int, sigma double",
        )

    @query("svd_onesided_singular_values", lowrank_sigma_sql(_RSQL_SVD))
    def q_svd_onesided(spark, sf_dir):
        from graphchi_cpp_spark.cf.svd import lanczos_svd_onesided

        s, _, _ = lanczos_svd_onesided(
            lowrank_fixture(_ratings(spark, sf_dir)), k=3
        )
        return spark.createDataFrame(
            [(i, round(float(v), 4)) for i, v in enumerate(s)],
            "rank int, sigma double",
        )

    from graphchi_cpp_spark.cf.nmf import nmf_sql
    from graphchi_cpp_spark.datasets import RATINGS_SQL

    # the Lee-Seung trajectory is pure matmuls from a deterministic hash
    # init — fully SQL-expressible, so the rmse history hash-checks
    @query("nmf_rmse_history", nmf_sql(RATINGS_SQL, d=4, iterations=3))
    def q_nmf(spark, sf_dir):
        _, _, hist = nmf(_ratings(spark, sf_dir), d=4, iterations=3)
        return spark.createDataFrame(
            [(h["iter"], round(h["train_rmse"], 4)) for h in hist],
            "iter int, train_rmse double",
        )

    def _hist_df(spark, hist):
        return spark.createDataFrame(
            [(h["iter"], round(h["train_rmse"], 4)) for h in hist],
            "iter int, train_rmse double",
        )

    from graphchi_cpp_spark.cf.als_variants import (
        als_coord_sql,
        als_tensor_sql,
        sparse_als_sql,
    )

    # d=2 versions: the 2x2 closed forms make all three ALS variants
    # fully SQL-expressible (CCD sweeps, prune-after-solve CoSaMP,
    # product design rows) — hash-checked trajectories
    @query("als_coord_rmse_history", als_coord_sql(RATINGS_SQL, iterations=3))
    def q_als_coord(spark, sf_dir):
        from graphchi_cpp_spark.cf.als_variants import als_coord

        _, _, hist = als_coord(_ratings(spark, sf_dir), d=2, iterations=3)
        return _hist_df(spark, hist)

    @query("sparse_als_rmse_history", sparse_als_sql(RATINGS_SQL, iterations=3))
    def q_sparse_als(spark, sf_dir):
        from graphchi_cpp_spark.cf.als_variants import sparse_als

        _, _, hist = sparse_als(
            _ratings(spark, sf_dir), d=2, iterations=3, user_sparsity=1
        )
        return _hist_df(spark, hist)

    @query(
        "als_tensor_rmse_history",
        als_tensor_sql(RATINGS_SQL, '("user" + item) % 6', iterations=2),
    )
    def q_als_tensor(spark, sf_dir):
        from graphchi_cpp_spark.cf.als_variants import als_tensor

        r = _ratings(spark, sf_dir).withColumn(
            "ts", F.pmod(F.col("user") + F.col("item"), F.lit(6))
        )
        _, _, _, hist = als_tensor(r, d=2, iterations=2)
        return _hist_df(spark, hist)

    # sequential-SGD variants: trajectories on real data cannot be
    # replayed set-level, so the registered contract is the 6-rating
    # fixture (ids from the real table) with num_blocks=1 and EVERY SGD
    # step unrolled into a CTE the oracle recomputes — update order,
    # old/new read semantics and all. Full-data multi-epoch runs stay
    # covered in pytest (test_svd_nmf_sgd).
    from graphchi_cpp_spark.cf.sgd_oracle import (
        biassgd2_logistic_fixture_sql,
        sgd_fixture,
        timesvdpp_fixture_sql,
    )

    @query("timesvdpp_rmse_history", timesvdpp_fixture_sql(RATINGS_SQL))
    def q_timesvdpp(spark, sf_dir):
        from graphchi_cpp_spark.cf.sgd import sgd

        r = sgd_fixture(spark, _ratings(spark, sf_dir), with_ts=True)
        _, _, hist = sgd(
            r, d=1, iterations=2, gamma=0.02, variant="timesvdpp",
            time_col="ts", num_blocks=1,
        )
        return _hist_df(spark, hist)

    @query(
        "biassgd2_logistic_rmse_history",
        biassgd2_logistic_fixture_sql(RATINGS_SQL),
    )
    def q_biassgd2_logistic(spark, sf_dir):
        from graphchi_cpp_spark.cf.sgd import sgd

        r = sgd_fixture(spark, _ratings(spark, sf_dir))
        _, _, hist = sgd(
            r, d=2, iterations=2, gamma=0.05,
            variant="biassgd", loss="logistic", num_blocks=1,
        )
        return _hist_df(spark, hist)

    # deterministic posterior-mean mode (ICM over the BPMF posterior):
    # at d=1 the whole 3-sweep trajectory is closed-form, so the oracle
    # replays it in chained CTEs on the full ratings table. The seeded
    # Gibbs 'sample' mode stays exercised in pytest (test_adpredictor).
    from graphchi_cpp_spark.cf.pmf import pmf_mean_sql

    @query("pmf_rmse_history", pmf_mean_sql(RATINGS_SQL, iterations=3))
    def q_pmf(spark, sf_dir):
        from graphchi_cpp_spark.cf.pmf import pmf

        _, _, hist = pmf(
            _ratings(spark, sf_dir), d=1, iterations=3, burn_in=0, mode="mean"
        )
        return _hist_df(spark, hist)

    # objective is reported from epoch-START factors, so iteration 0 is
    # a closed form of the hash init — full hash oracle. Multi-iteration
    # ascent stays covered in pytest (test_svd_nmf_sgd).
    from graphchi_cpp_spark.cf.climf import climf_objective_sql

    @query("climf_objective_history", climf_objective_sql(RATINGS_SQL, d=4))
    def q_climf(spark, sf_dir):
        from graphchi_cpp_spark.cf.climf import climf

        _, _, hist = climf(_ratings(spark, sf_dir), d=4, iterations=1, gamma=0.005)
        return spark.createDataFrame(
            [(h["iter"], round(h["objective"], 4)) for h in hist],
            "iter int, objective double",
        )

    # singleton user blocks (num_blocks > max user id) make the first
    # epoch's predictions a pure function of the deterministic init —
    # full hash oracle for iteration 0. Multi-epoch seeded CD-1 stays
    # covered in pytest (test_svd_nmf_sgd).
    from graphchi_cpp_spark.cf.rbm import rbm_iter0_sql

    @query("rbm_rmse_history", rbm_iter0_sql(RATINGS_SQL, d=6))
    def q_rbm(spark, sf_dir):
        from graphchi_cpp_spark.cf.rbm import rbm

        r = _ratings(spark, sf_dir)
        max_user = r.agg(F.max("user")).collect()[0][0]
        _, _, hist = rbm(r, d=6, iterations=1, num_blocks=int(max_user) + 1)
        return _hist_df(spark, hist)

    from graphchi_cpp_spark.cf.sgd_oracle import (
        gensgd_fixture_sql,
        libfm_fixture_sql,
    )

    @query("libfm_rmse_history", libfm_fixture_sql(RATINGS_SQL))
    def q_fm(spark, sf_dir):
        from graphchi_cpp_spark.cf.fm import fm

        r = sgd_fixture(
            spark, _ratings(spark, sf_dir), with_ts=True
        ).withColumnRenamed("ts", "tbin")
        _, hist = fm(
            r, feature_cols=["user", "item", "tbin"], d=2, iterations=3,
            num_blocks=1,
        )
        return _hist_df(spark, hist)

    # gensgd input-parsing breadth (gensgd.cpp:28,:84-105,:383-460):
    # dictionary-encoded categoricals + bucketized continuous + per-entity
    # side-feature tables, hash-checked against DuckDB dense_rank encoding
    _FEATURIZE_SQL = f"""
        WITH r AS MATERIALIZED ({RATINGS_SQL}),
        j AS MATERIALIZED (
          SELECT r."user", r.item, r.rating, c.c_mktsegment AS seg,
                 p.p_brand AS brand,
                 CAST(floor(p.p_retailprice / 100.0) AS BIGINT) AS pbin
          FROM r JOIN customer c ON c.c_custkey = r."user"
                 JOIN part p ON p.p_partkey = r.item
        ),
        vu AS (SELECT val, CAST(row_number() OVER (ORDER BY val) - 1 AS BIGINT)
               AS code FROM (SELECT DISTINCT "user" AS val FROM j)),
        vi AS (SELECT val, CAST(row_number() OVER (ORDER BY val) - 1 AS BIGINT)
               AS code FROM (SELECT DISTINCT item AS val FROM j)),
        vs AS (SELECT val, CAST(row_number() OVER (ORDER BY val) - 1 AS BIGINT)
               AS code FROM (SELECT DISTINCT seg AS val FROM j)),
        vb AS (SELECT val, CAST(row_number() OVER (ORDER BY val) - 1 AS BIGINT)
               AS code FROM (SELECT DISTINCT brand AS val FROM j)),
        vp AS (SELECT val, CAST(row_number() OVER (ORDER BY val) - 1 AS BIGINT)
               AS code FROM (SELECT DISTINCT pbin AS val FROM j))
        SELECT j."user", j.item, round(j.rating, 4) AS rating,
               vu.code AS f_user,
               (SELECT count(*) FROM vu) + vi.code AS f_item,
               (SELECT count(*) FROM vu) + (SELECT count(*) FROM vi)
                 + vs.code AS f_seg,
               (SELECT count(*) FROM vu) + (SELECT count(*) FROM vi)
                 + (SELECT count(*) FROM vs) + vb.code AS f_brand,
               (SELECT count(*) FROM vu) + (SELECT count(*) FROM vi)
                 + (SELECT count(*) FROM vs) + (SELECT count(*) FROM vb)
                 + vp.code AS f_price
        FROM j JOIN vu ON vu.val = j."user" JOIN vi ON vi.val = j.item
               JOIN vs ON vs.val = j.seg JOIN vb ON vb.val = j.brand
               JOIN vp ON vp.val = j.pbin
    """

    @query("featurized_ratings", _FEATURIZE_SQL)
    def q_featurize(spark, sf_dir):
        from graphchi_cpp_spark.cf.fm import featurize
        from graphchi_cpp_spark.datasets import load_table

        customer = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        part = load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_retailprice"
        )
        out, _ = featurize(
            _ratings(spark, sf_dir),
            categorical=["user", "item"],
            buckets={"p_retailprice": 100.0},
            side_tables=[
                (customer, "user", "c_custkey"),
                (part, "item", "p_partkey"),
            ],
        )
        return out.select(
            "user",
            "item",
            F.round("rating", 4).alias("rating"),
            F.col("_feat_0").alias("f_user"),
            F.col("_feat_1").alias("f_item"),
            F.col("_feat_2").alias("f_seg"),
            F.col("_feat_3").alias("f_brand"),
            F.col("_feat_4").alias("f_price"),
        )

    # the full gensgd pipeline on the fixture: featurize (dictionary
    # encode users/items + a per-user side feature) then the FM kernel;
    # every code assignment and SGD step is static in the oracle. The
    # full-data featurize path keeps its own hash-checked query
    # (featurized_ratings); full-data FM descent stays in pytest.
    # sparse_gensgd (last M8 sub-variant): FM over variable-length
    # sparse feature lists + per-position rates + sweep-end top-s factor
    # pruning — fully unrolled oracle including the prune steps
    from graphchi_cpp_spark.cf.sgd_oracle import (
        sparse_fm_fixture,
        sparse_gensgd_fixture_sql,
    )

    @query("sparse_gensgd_rmse_history", sparse_gensgd_fixture_sql(RATINGS_SQL))
    def q_sparse_gensgd(spark, sf_dir):
        from graphchi_cpp_spark.cf.fm import sparse_fm

        r = sparse_fm_fixture(spark, _ratings(spark, sf_dir))
        _, hist = sparse_fm(
            r, d=2, iterations=2, rates=(0.01, 0.01, 0.01), sparsity=1,
            num_blocks=1,
        )
        return _hist_df(spark, hist)

    @query("gensgd_rmse_history", gensgd_fixture_sql(RATINGS_SQL))
    def q_gensgd(spark, sf_dir):
        from graphchi_cpp_spark.cf.fm import featurize, fm

        r = sgd_fixture(spark, _ratings(spark, sf_dir))
        us = [x[0] for x in r.select("user").distinct().orderBy("user").collect()]
        side = spark.createDataFrame(
            [(int(u), a) for a, u in enumerate(us)], "user long, seg long"
        )
        out, _ = featurize(
            r,
            categorical=["user", "item"],
            side_tables=[(side, "user", "user")],
        )
        _, hist = fm(
            out, feature_cols=["_feat_0", "_feat_1", "_feat_2"],
            d=2, iterations=2, num_blocks=1,
        )
        return _hist_df(spark, hist)

    from graphchi_cpp_spark.cf.sgd_oracle import sgd_variant_fixture_sql

    @query(
        "biassgd2_abs_rmse_history",
        sgd_variant_fixture_sql(
            RATINGS_SQL, "biassgd", "abs", d=2, iterations=2, gamma=0.02,
            step_dec=0.5,
        ),
    )
    def q_biassgd2_abs(spark, sf_dir):
        from graphchi_cpp_spark.cf.sgd import sgd

        r = sgd_fixture(spark, _ratings(spark, sf_dir))
        _, _, hist = sgd(
            r, d=2, iterations=2, gamma=0.02,
            variant="biassgd", loss="abs", step_dec=0.5, num_blocks=1,
        )
        return _hist_df(spark, hist)

    @query(
        "sgd_rmse_history",
        sgd_variant_fixture_sql(
            RATINGS_SQL, "sgd", "square", d=2, iterations=3, gamma=0.02
        ),
    )
    def q_sgd(spark, sf_dir):
        r = sgd_fixture(spark, _ratings(spark, sf_dir))
        _, _, hist = sgd(r, d=2, iterations=3, gamma=0.02, num_blocks=1)
        return spark.createDataFrame(
            [(h["iter"], round(h["train_rmse"], 4)) for h in hist],
            "iter int, train_rmse double",
        )

    @query(
        "biassgd_rmse_history",
        sgd_variant_fixture_sql(
            RATINGS_SQL, "biassgd", "square", d=2, iterations=3, gamma=0.02
        ),
    )
    def q_biassgd(spark, sf_dir):
        r = sgd_fixture(spark, _ratings(spark, sf_dir))
        _, _, hist = sgd(
            r, d=2, iterations=3, gamma=0.02, variant="biassgd", num_blocks=1
        )
        return spark.createDataFrame(
            [(h["iter"], round(h["train_rmse"], 4)) for h in hist],
            "iter int, train_rmse double",
        )

    from graphchi_cpp_spark.algos.label_propagation import (
        seeded_label_propagation_sql,
    )
    from graphchi_cpp_spark.datasets import COSUPPLY_EDGES_SQL

    @query(
        "seeded_label_propagation",
        seeded_label_propagation_sql(
            COSUPPLY_EDGES_SQL,
            # verts is defined by the oracle before this CTE, so seeds can
            # reuse it — same id universe as g.vertices on the Spark side
            "SELECT id, CAST(id % 3 AS INT) AS label FROM verts WHERE id % 20 = 0",
            num_labels=3,
            alpha=0.15,
            iterations=5,
        ),
    )
    def q_slp(spark, sf_dir):
        g = PropertyGraph.from_edges(cosupply_edges(spark, sf_dir))
        seeds = g.vertices.filter(F.col("id") % 20 == 0).select(
            "id", F.pmod(F.col("id"), F.lit(3)).cast("int").alias("label")
        )
        out = seeded_label_propagation(g, seeds, num_labels=3, max_iter=5)
        # argmax over rounded probs — cross-engine-stable on near-ties
        pr = F.transform(F.col("probs"), lambda x: F.round(x, 4))
        return out.select(
            "id",
            (F.array_position(pr, F.array_max(pr)) - 1).cast("int").alias("label"),
            F.array_max(pr).alias("confidence"),
        )


def _register_windows():
    from graphchi_cpp_spark.datasets import BIPARTITE_EDGES_SQL, load_table
    from graphchi_cpp_spark.streaming.windows import (
        hourly_event_stats,
        hourly_event_stats_sql,
        sessionize,
        sessionize_sql,
    )

    @query("events_hourly", hourly_event_stats_sql())
    def q_events_hourly(spark, sf_dir):
        return hourly_event_stats(load_table(spark, sf_dir, "events"))

    @query("sessionize", sessionize_sql())
    def q_sessionize(spark, sf_dir):
        return sessionize(load_table(spark, sf_dir, "events"))

    # native F.session_window engine path (streaming-capable); same
    # sessions as the gaps-and-islands oracle keyed by session start
    @query(
        "session_windows",
        "SELECT user_id, session_start_us, n_events FROM "
        f"({sessionize_sql()})",
    )
    def q_session_windows(spark, sf_dir):
        from graphchi_cpp_spark.streaming.windows import (
            sessionize_session_window,
        )

        return sessionize_session_window(load_table(spark, sf_dir, "events"))

    @query(
        "word_pair_mi",
        __import__(
            "graphchi_cpp_spark.operators.mutual_info", fromlist=["word_pair_mi_sql"]
        ).word_pair_mi_sql(min_pairs=50),
    )
    def q_word_mi(spark, sf_dir):
        from graphchi_cpp_spark.operators.mutual_info import word_pair_mi

        return word_pair_mi(load_table(spark, sf_dir, "documents"), min_pairs=50)

    from graphchi_cpp_spark.cf.als import als_sql as _als_sql
    from graphchi_cpp_spark.datasets import RATINGS_SQL as _RSQL

    @query(
        "wals_rmse_history",
        _als_sql(
            _RSQL,
            iterations=2,
            weight='(1.0 + ("user" + item) % 3)',
        ),
    )
    def q_wals(spark, sf_dir):
        from graphchi_cpp_spark.cf.als import als
        from graphchi_cpp_spark.datasets import ratings

        r = _ratings(spark, sf_dir).withColumn(
            "w", 1.0 + F.pmod(F.col("user") + F.col("item"), F.lit(3)).cast("double")
        )
        _, _, hist = als(r, d=2, iterations=2, weight_col="w")
        return spark.createDataFrame(
            [(h["iter"], round(h["train_rmse"], 4)) for h in hist],
            "iter int, train_rmse double",
        )

    from graphchi_cpp_spark.cf.sgd_oracle import (
        sgd_fixture as _sgd_fix,
        sgd_variant_fixture_sql as _sgd_fix_sql,
    )

    @query(
        "svdpp_rmse_history",
        _sgd_fix_sql(_RSQL, "svdpp", "square", d=2, iterations=2, gamma=0.02),
    )
    def q_svdpp(spark, sf_dir):
        from graphchi_cpp_spark.cf.sgd import sgd

        r = _sgd_fix(spark, _ratings(spark, sf_dir))
        _, _, hist = sgd(
            r, d=2, iterations=2, gamma=0.02, variant="svdpp", num_blocks=1
        )
        return spark.createDataFrame(
            [(h["iter"], round(h["train_rmse"], 4)) for h in hist],
            "iter int, train_rmse double",
        )

    @query(
        "doc_term_counts",
        """
        SELECT doc_id, term, count(*) AS n FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ) WHERE term != '' GROUP BY doc_id, term
        """,
    )
    def q_doc_term_counts(spark, sf_dir):
        from graphchi_cpp_spark.operators.topics import doc_term_counts

        return doc_term_counts(load_table(spark, sf_dir, "documents"))

    from graphchi_cpp_spark.operators.topics import LDA_RECOVERY_ORACLE_SQL

    @query("lda_topics", LDA_RECOVERY_ORACLE_SQL)
    def q_lda(spark, sf_dir):
        # Oracled contract: MLlib LDA weights are seed/partition-dependent,
        # but on a 3-disjoint-vocabulary corpus the RECOVERY verdict is
        # deterministic — k=3 must concentrate each topic's top-term mass
        # in one vocabulary group and cover all 3 groups.
        from graphchi_cpp_spark.operators.topics import lda_topic_recovery

        return lda_topic_recovery(spark)

    _SUBGRAPH_SEEDS = (
        f"SELECT id FROM (SELECT src AS id FROM ({BIPARTITE_EDGES_SQL}) "
        f"UNION SELECT dst FROM ({BIPARTITE_EDGES_SQL})) WHERE id % 200 = 0"
    )

    @query(
        "khop_subgraph",
        f"""
        WITH reach AS (
            SELECT id FROM (
                {__import__("graphchi_cpp_spark.algos.subgraph", fromlist=["khop_vertices_sql"]).khop_vertices_sql(BIPARTITE_EDGES_SQL, _SUBGRAPH_SEEDS, 1)}
            )
        ),
        e AS ({BIPARTITE_EDGES_SQL})
        SELECT DISTINCT e.src, e.dst FROM e
        JOIN reach r ON r.id = e.src OR r.id = e.dst
        """,
    )
    def q_khop_subgraph(spark, sf_dir):
        from graphchi_cpp_spark.algos.subgraph import khop_subgraph
        from graphchi_cpp_spark.graph import PropertyGraph

        g = _bipartite_graph(spark, sf_dir)
        seeds = g.vertices.filter(F.col("id") % 200 == 0)
        return khop_subgraph(g, seeds, 1).select("src", "dst")

    from graphchi_cpp_spark.cf.adpredictor import adpredictor_sql

    @query("adpredictor_weights", adpredictor_sql(sweeps=2))
    def q_adpredictor(spark, sf_dir):
        from graphchi_cpp_spark.cf.adpredictor import adpredictor, event_impressions

        imp = event_impressions(load_table(spark, sf_dir, "events"))
        w = adpredictor(imp, sweeps=2)
        return w.select(
            "feature", F.round("mu", 4).alias("mu"), F.round("sigma2", 4).alias("sigma2")
        )

    @query("als_ml_rmse", "SELECT 1 AS ml_within_eps")
    def q_als_ml(spark, sf_dir):
        # Oracled contract: MLlib's blocked ALS is seed/partitioning-
        # dependent, so its raw RMSE can't be SQL-twinned — but it MUST
        # land within eps of the fully-oracled native M1 ALS on the same
        # ratings (same d, iterations, reg). Measured delta at sf0.01 is
        # ~0.01; eps=0.05 absorbs partitioning jitter without ever
        # passing a diverged fit.
        from graphchi_cpp_spark.cf.als import als
        from graphchi_cpp_spark.cf.als_ml import als_ml

        r = _ratings(spark, sf_dir)
        _, _, preds = als_ml(r, d=4, iterations=5)
        rmse_ml = preds.agg(
            F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"), 2)))
        ).collect()[0][0]
        _, _, hist = als(r, d=4, iterations=5)
        rmse_native = hist[-1]["train_rmse"]
        ok = 1 if abs(rmse_ml - rmse_native) <= 0.05 else 0
        return spark.createDataFrame([(ok,)], "ml_within_eps int")


_register_core()
_register_ops()
_register_graph_algos()
_register_cf()
_register_pipeline_ops()
_register_advanced_algos()
_register_parsers_streaming()
_register_ml_extras()
_register_windows()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-10 on the sf0.001 customer→supplier graph."""
    from graphchi_cpp_spark.algos.pagerank import pagerank
    from graphchi_cpp_spark.operators.toplist import top_k_vertices

    g = _bipartite_graph(spark, "/root/testdata/sf0.001")
    return top_k_vertices(pagerank(g, max_iter=3), "rank", 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
