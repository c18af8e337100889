"""Topic modeling over documents (T3 — reference LDA GAS port).

Reference: ``graphlab_toolkit_ports/lda/cgs_lda.cpp`` (collapsed Gibbs
sampling vertex program over the doc-word bipartite graph). The
Spark-native route (per SURVEY §2.6) is ``pyspark.ml.clustering.LDA``
over a doc-term count matrix built with split+explode+groupBy — the same
tokenize-count substrate as the reference's parsers
(``toolkits/parsers/texttokens.cpp``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, n) — the doc-word count graph (reference
    ``toolkits/parsers/mi.cpp:1-30`` shape)."""
    return (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("n"))
    )


def lda_topics(
    docs: DataFrame,
    k: int = 5,
    max_iter: int = 10,
    vocab_size: int = 1000,
    seed: int = 42,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Fit LDA; returns (topics(topic, term, weight), doc_topics(doc_id,
    topic_distribution)). Guarded import of pyspark.ml."""
    try:
        from pyspark.ml.clustering import LDA
        from pyspark.ml.feature import CountVectorizer, Tokenizer
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable") from e

    tok = Tokenizer(inputCol=text_col, outputCol="_tokens")
    with_tokens = tok.transform(docs.select("doc_id", text_col))
    cv = CountVectorizer(
        inputCol="_tokens", outputCol="_features", vocabSize=vocab_size
    ).fit(with_tokens)
    vec = cv.transform(with_tokens)
    model = LDA(
        k=k, maxIter=max_iter, seed=seed, featuresCol="_features"
    ).fit(vec)
    vocab = cv.vocabulary
    topics = (
        model.describeTopics(5)
        .select(
            "topic",
            F.explode(F.arrays_zip("termIndices", "termWeights")).alias("tw"),
        )
        .select(
            "topic",
            F.col("tw.termIndices").alias("term_idx"),
            F.round(F.col("tw.termWeights"), 6).alias("weight"),
        )
    )
    vocab_df = docs.sparkSession.createDataFrame(
        list(enumerate(vocab)), "term_idx int, term string"
    )
    topics = topics.join(F.broadcast(vocab_df), "term_idx").select(
        "topic", "term", "weight"
    )
    doc_topics = model.transform(vec).select(
        "doc_id", F.col("topicDistribution").alias("topic_distribution")
    )
    return topics, doc_topics
