"""End-to-end training-corpus cleaning: the individual pipeline
operators (exact dedup, quality scoring, repetition filters, benchmark
decontamination, language ID) composed into one declarative flow — the
shape a real 100 TB data-prep job takes. The post-dedup corpus is
materialized once at the fan-out point (Spark does not share common
subplans across consumers within a plan, only identical exchanges), and
the downstream per-document passes stay declarative.

Stage order follows the cheap-first convention of production pipelines:
exact dedup (one groupBy) → per-document quality/repetition filters
(pure projections + partial aggregates) → decontamination last, so the
broadcast probe join only sees documents that survived everything else.

All arithmetic is the operators' own (each independently hash-verified
against DuckDB); the composed oracle nests their SQL twins as CTEs, so
the pipeline query is verified end-to-end, not just stage-by-stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.operators.dedup import (
    _materialize_postings,
    exact_duplicates,
    exact_duplicates_sql,
    ngram_contamination,
    ngram_contamination_sql,
)
from graphchi_cpp_spark.operators.text import (
    language_id,
    language_id_sql,
    quality_scores,
    quality_scores_sql,
    repetition_stats,
    repetition_stats_sql,
)


def clean_corpus(
    docs: DataFrame,
    probes: DataFrame | None = None,
    quality_min: float = 0.5,
    dup_bigram_max: float = 0.5,
    contamination_max: float = 0.8,
    n_contam: int = 5,
    materialize: bool = True,
) -> DataFrame:
    """Returns the surviving documents' summary rows
    (doc_id, n_tokens, quality, dup_bigram_frac, pred_lang) after:

    1. exact dedup — only each text's canonical (min) doc_id survives;
    2. quality floor — heuristic quality ≥ ``quality_min``;
    3. repetition ceiling — duplicate-bigram fraction ≤ ``dup_bigram_max``;
    4. decontamination — drop documents containing ≥ ``contamination_max``
       of any probe document's n-grams (skipped when ``probes`` is None).

    ``materialize=True`` (default) eagerly materializes the post-dedup
    corpus at plan-BUILD time — constructing the pipeline runs the dedup
    jobs. Pass ``materialize=False`` for a fully lazy plan (each
    downstream consumer re-executes the dedup join).
    """
    dups = exact_duplicates(docs)
    # the post-dedup corpus is the fan-out point: four independent
    # aggregation passes (quality, repetition, contamination, language)
    # consume it, and an unmaterialized join re-executes per consumer —
    # measured 2.4x end-to-end at 1M docs (136s -> 57s). Materializing
    # here is exactly what a production pipeline does: persist the
    # deduped corpus once, then run the per-document passes over it.
    # _materialize_postings honors SPARK_GRAFT_MATERIALIZE=disk (scratch
    # parquet instead of block-manager blocks) for corpora that rival
    # the executor heap.
    kept = docs.join(
        dups.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id"),
        "doc_id",
    )
    if materialize:
        kept = _materialize_postings(kept, "clean_corpus_kept")
    q = quality_scores(kept).select("doc_id", "n_tokens", "quality")
    r = repetition_stats(kept).select("doc_id", "dup_bigram_frac")
    out = (
        q.filter(F.col("quality") >= quality_min)
        .join(r.filter(F.col("dup_bigram_frac") <= dup_bigram_max), "doc_id")
    )
    if probes is not None:
        contaminated = (
            ngram_contamination(
                kept, probes, n=n_contam, min_containment=contamination_max
            )
            .select(F.col("train_id").alias("doc_id"))
            .distinct()
        )
        out = out.join(contaminated, "doc_id", "left_anti")
    lang = language_id(kept).select("doc_id", "pred_lang")
    return out.join(lang, "doc_id").select(
        "doc_id", "n_tokens", "quality", "dup_bigram_frac", "pred_lang"
    )


def clean_corpus_sql(
    train_filter: str = "TRUE",
    probe_filter: str | None = None,
    docs_sql: str = "documents",
    quality_min: float = 0.5,
    dup_bigram_max: float = 0.5,
    contamination_max: float = 0.8,
    n_contam: int = 5,
) -> str:
    """DuckDB twin: nests each operator's SQL twin as a CTE over the
    ``kept0`` (post-dedup) view, then applies the same filters/joins."""
    decontam = ""
    if probe_filter is not None:
        # kept0_or_probe holds both sides; the train side is exactly
        # "not a probe" because train_filter and probe_filter are
        # disjoint in the registered contract
        decontam = f""",
        contaminated AS (
            SELECT DISTINCT train_id AS doc_id FROM (
                {ngram_contamination_sql(
                    f"NOT ({probe_filter})", probe_filter, "kept0_or_probe",
                    n=n_contam, min_containment=contamination_max,
                )}
            )
        )"""
    anti = (
        "AND doc_id NOT IN (SELECT doc_id FROM contaminated)"
        if probe_filter is not None
        else ""
    )
    probe_union = (
        f"""
        kept0_or_probe AS (
            SELECT * FROM kept0
            UNION ALL
            SELECT * FROM {docs_sql} WHERE {probe_filter}
        ),"""
        if probe_filter is not None
        else ""
    )
    return f"""
        WITH dups AS ({exact_duplicates_sql(f"(SELECT * FROM {docs_sql} WHERE {train_filter})")}),
        kept0 AS (
            SELECT d.* FROM {docs_sql} d
            JOIN dups ON dups.doc_id = d.doc_id
                     AND dups.doc_id = dups.canonical_id
        ),{probe_union}
        q AS (SELECT doc_id, n_tokens, quality
              FROM ({quality_scores_sql("kept0")})),
        r AS (SELECT doc_id, dup_bigram_frac
              FROM ({repetition_stats_sql("kept0")})),
        lang AS (SELECT doc_id, pred_lang
                 FROM ({language_id_sql("kept0")})){decontam}
        SELECT doc_id, n_tokens, quality, dup_bigram_frac, pred_lang
        FROM q JOIN r USING (doc_id) JOIN lang USING (doc_id)
        WHERE quality >= {quality_min}
          AND dup_bigram_frac <= {dup_bigram_max}
          {anti}
    """
