"""Pairwise mutual information between words (T4).

Reference: ``toolkits/parsers/mi.cpp`` — builds doc×word count graphs and
computes mutual information between word pairs that co-occur in
documents.

Pointwise MI here: for words a, b over N documents,
    pmi(a,b) = log( (c_ab · N) / (c_a · c_b) )
with c_* document frequencies (binary occurrence). Pure co-occurrence
joins + one log expression — same substrate as item-CF (M10).

Scale: the word–word self-join is bounded by Σ_doc |vocab_doc|²; cap
per-doc distinct words upstream for adversarial docs. min_pairs prunes
the long tail before the join output materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_pair_mi(
    docs: DataFrame,
    text_col: str = "text",
    min_pairs: int = 2,
) -> DataFrame:
    """(word_a, word_b, n_ab, pmi) for word_a < word_b."""
    dw = (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_docs = docs.select("doc_id").distinct().count()
    wc = dw.groupBy("w").agg(F.count("*").alias("c"))
    a = dw.select("doc_id", F.col("w").alias("word_a"))
    b = dw.select("doc_id", F.col("w").alias("word_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    ca = wc.select(F.col("w").alias("word_a"), F.col("c").alias("ca"))
    cb = wc.select(F.col("w").alias("word_b"), F.col("c").alias("cb"))
    return (
        pairs.join(ca, "word_a")
        .join(cb, "word_b")
        .select(
            "word_a",
            "word_b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") * F.lit(float(n_docs)))
                    / (F.col("ca") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def word_pair_mi_sql(docs_sql: str = "documents", min_pairs: int = 2) -> str:
    return f"""
        WITH dw AS (
            SELECT DISTINCT doc_id, w FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM {docs_sql}
            ) WHERE w != ''
        ),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM {docs_sql}),
        wc AS (SELECT w, count(*) AS c FROM dw GROUP BY w),
        pairs AS (
            SELECT a.w AS word_a, b.w AS word_b, count(*) AS n_ab
            FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
            GROUP BY a.w, b.w HAVING count(*) >= {min_pairs}
        )
        SELECT word_a, word_b, n_ab,
               round(ln((n_ab * (SELECT n_docs * 1.0 FROM n))
                        / (ca.c * cb.c)), 6) AS pmi
        FROM pairs
        JOIN wc ca ON ca.w = word_a
        JOIN wc cb ON cb.w = word_b
    """
