"""Text-analysis operators for training-data pipelines.

Beyond the reference surface (BASELINE.json north-star): language ID,
quality scoring, token counting, document fingerprinting over the
``documents`` table. The reference's text-adjacent code (tokenizers in
``toolkits/parsers/texttokens.cpp``, word counting ``toolkits/parsers/
mi.cpp:1-30``) maps to the same split+explode+groupBy substrate.

Every operator is a deterministic pure expression, evaluated JVM-side
(no Python UDFs), and each has a DuckDB-equivalent SQL builder so the
correctness gate can hash-compare. Shared hash primitive:
``h(s) = bigint(first 15 hex chars of md5(s))`` — identical in Spark
(``conv(substr(md5(s),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(s),1,15))::BIGINT``).

Scale: all per-row projections → embarrassingly parallel, no shuffles;
column pruning pushes the single ``text`` column read down to parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HASH_PRIME = 2147483647  # 2^31 - 1, Mersenne — keeps a*h+b inside int64


def md5_long(col: Column) -> Column:
    """60-bit integer hash from md5 — the cross-engine primitive."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens(col: Column) -> Column:
    return F.split(col, " ")


# --------------------------------------------------------------------- #
# token counting
# --------------------------------------------------------------------- #
def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_re_tokens, n_chars_measured) —
    whitespace tokens + BPE-ish regex tokens (letter runs / digit runs /
    single punctuation, the pre-tokenizer shape of GPT-style BPE)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokens(t)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).cast("long").alias(
            "n_re_tokens"
        ),
        F.length(t).cast("long").alias("n_chars_measured"),
    )


def token_stats_sql(docs_sql: str = "documents") -> str:
    return f"""
        SELECT doc_id,
               len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::BIGINT
                   AS n_re_tokens,
               length(text)::BIGINT AS n_chars_measured
        FROM {docs_sql}
    """


# --------------------------------------------------------------------- #
# quality scoring
# --------------------------------------------------------------------- #
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_word_len, stopword_ratio, alpha_ratio,
    quality) — heuristic quality in [0,1]: long-enough docs with natural
    stopword density and mostly-alphabetic characters score high
    (C4/CCNet-style hand rules, deterministic arithmetic only)."""
    # token array materialized once: the raw expression is consumed by
    # size + filter + two ratio terms, each of which would re-split
    t = F.col("_text")
    pre = docs.select(
        "doc_id",
        F.col(text_col).alias("_text"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    mean_wl = F.try_divide(F.length(F.regexp_replace(t, " ", "")), n)
    stop_ratio = F.try_divide(n_stop, n)
    alpha_ratio = F.try_divide(alpha, F.length(t))
    quality = F.least(
        F.lit(1.0),
        (
            F.least(n / F.lit(50.0), F.lit(1.0)) * 0.4
            + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
            + alpha_ratio * 0.3
        ),
    )
    return pre.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def quality_scores_sql(docs_sql: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        SELECT doc_id,
               n::BIGINT AS n_tokens,
               round(nospace_len * 1.0 / nullif(n, 0), 4) AS mean_word_len,
               round(n_stop * 1.0 / nullif(n, 0), 4) AS stopword_ratio,
               round(alpha * 1.0 / nullif(length(text), 0), 4) AS alpha_ratio,
               round(least(1.0,
                     least(n / 50.0, 1.0) * 0.4
                   + least((n_stop * 1.0 / nullif(n, 0)) * 5.0, 1.0) * 0.3
                   + (alpha * 1.0 / nullif(length(text), 0)) * 0.3), 4) AS quality
        FROM (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n,
                   len(list_filter(string_split(text, ' '),
                       x -> list_contains([{stop_list}], x))) AS n_stop,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
                   length(replace(text, ' ', '')) AS nospace_len
            FROM {docs_sql}
        )
    """


# --------------------------------------------------------------------- #
# language identification (n-gram / marker-word heuristic)
# --------------------------------------------------------------------- #
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "la", "que", "es"),
    "fr": ("le", "la", "et", "est"),
    "zh": ("de", "shi", "le", "zai"),
}


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, lang_score) — argmax of marker-token counts,
    alphabetical tiebreak, 'und' (undetermined) when no marker hits."""
    # two-stage materialization: the token array feeds one filter per
    # language, and the score array is consumed three times (max, argmax
    # filter, null-guard) — project each once instead of re-evaluating
    pre = docs.select("doc_id", tokens(F.col(text_col)).alias("_toks"))
    scores = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        cnt = F.size(
            F.filter(F.col("_toks"), lambda x: F.array_contains(arr, x))
        )
        scores.append(F.struct(cnt.alias("c"), F.lit(lang).alias("l")))
    staged = pre.select("doc_id", F.array(*scores).alias("_scores"))
    # argmax: highest count wins, alphabetically-first lang on ties
    structs = F.col("_scores")
    best_count = F.array_max(F.transform(structs, lambda s: s["c"]))
    pred = F.array_min(
        F.filter(structs, lambda s: s["c"] == best_count)
    )["l"]
    return staged.select(
        "doc_id",
        F.when(best_count > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
        best_count.cast("long").alias("lang_score"),
    )


def language_id_sql(docs_sql: str = "documents") -> str:
    cases = []
    for lang in sorted(LANG_MARKERS):
        marker_list = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        cases.append(
            f"len(list_filter(string_split(text, ' '), "
            f"x -> list_contains([{marker_list}], x))) AS c_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    pick = "CASE " + " ".join(
        f"WHEN c_{lang} = best THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
        SELECT doc_id,
               CASE WHEN best > 0 THEN {pick} ELSE 'und' END AS pred_lang,
               best::BIGINT AS lang_score
        FROM (
            SELECT doc_id, text, {best} AS best, *
            FROM (SELECT doc_id, text, {', '.join(cases)} FROM {docs_sql})
        )
    """


# --------------------------------------------------------------------- #
# document fingerprinting (rolling-hash / winnowing-style)
# --------------------------------------------------------------------- #
def fingerprints(docs: DataFrame, text_col: str = "text", w: int = 5) -> DataFrame:
    """(doc_id, fingerprint) — min hash over word w-grams (the winnowing
    'select minimum of window' idea collapsed to one global min; documents
    sharing the fingerprint almost surely share a w-gram)."""
    # tokens materialized in a prior select: a computed child captured
    # by a HOF lambda is re-evaluated per element (split once per gram)
    pre = docs.select("doc_id", tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, w)),
    )
    return pre.select(
        "doc_id",
        F.array_min(F.transform(grams, lambda g: md5_long(g))).alias("fingerprint"),
    )


def fingerprints_sql(docs_sql: str = "documents", w: int = 5) -> str:
    return f"""
        SELECT doc_id,
               list_min(list_transform(
                   list_transform(
                       range(1, greatest(len(string_split(text,' ')) - {w - 1}, 1) + 1),
                       i -> array_to_string(string_split(text,' ')[i : i + {w - 1}], ' ')
                   ),
                   g -> {md5_long_sql('g')}
               )) AS fingerprint
        FROM {docs_sql}
    """


# --------------------------------------------------------------------- #
# repetition signals (Gopher-style duplicate-n-gram fractions)
# --------------------------------------------------------------------- #
def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, dup_bigram_frac,
    top_bigram_frac) — within-document repetition signals used by
    Gopher/CCNet-style quality filters: the fraction of token (and
    bigram) occurrences that are repeats of an earlier occurrence, and
    the share of bigram occurrences claimed by the single most frequent
    bigram.

    Scale: one explode + one (doc_id, gram) groupBy + one doc_id
    re-aggregate — all partially aggregated, no joins; cost is linear in
    corpus token count."""
    # tokens materialized in a prior select: a computed child captured
    # by a HOF lambda is re-evaluated per element (split once per bigram)
    pre = docs.select("doc_id", tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    cnt = F.size(toks)
    # docs with < 2 tokens have NO bigrams — emit an empty gram list
    # (not a synthesized single-token "bigram", which would report
    # top_bigram_frac = 1.0 and wrongly trip downstream quality filters)
    grams = F.when(
        cnt >= 2,
        F.transform(
            F.sequence(F.lit(1), cnt - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_tok = pre.select(
        "doc_id", F.explode(toks).alias("g")
    ).groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    tok_agg = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(
            (F.sum("c") - F.count("*")) / F.sum("c"), 6
        ).alias("dup_token_frac"),
    )
    per_bg = pre.select(
        "doc_id", F.explode(grams).alias("g")
    ).groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    bg_agg = per_bg.groupBy("doc_id").agg(
        F.round((F.sum("c") - F.count("*")) / F.sum("c"), 6).alias(
            "dup_bigram_frac"
        ),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
    )
    # left join + 0.0 defaults: bigram-less docs have zero repetition
    return tok_agg.join(bg_agg, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "dup_token_frac",
        F.coalesce("dup_bigram_frac", F.lit(0.0)).alias("dup_bigram_frac"),
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


def repetition_stats_sql(docs_sql: str = "documents") -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS g
            FROM {docs_sql}
        ),
        per_tok AS (
            SELECT doc_id, g, count(*) AS c FROM toks GROUP BY 1, 2
        ),
        tok_agg AS (
            SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                   round((sum(c) - count(*)) * 1.0 / sum(c), 6)
                       AS dup_token_frac
            FROM per_tok GROUP BY doc_id
        ),
        bgs AS (
            SELECT doc_id, unnest(list_transform(
                range(1, len(string_split(text,' '))),
                i -> array_to_string(string_split(text,' ')[i : i + 1], ' ')
            )) AS g
            FROM {docs_sql}
            WHERE len(string_split(text, ' ')) >= 2
        ),
        per_bg AS (
            SELECT doc_id, g, count(*) AS c FROM bgs GROUP BY 1, 2
        ),
        bg_agg AS (
            SELECT doc_id,
                   round((sum(c) - count(*)) * 1.0 / sum(c), 6)
                       AS dup_bigram_frac,
                   round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
            FROM per_bg GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, dup_token_frac,
               coalesce(dup_bigram_frac, 0.0) AS dup_bigram_frac,
               coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
        FROM tok_agg LEFT JOIN bg_agg USING (doc_id)
    """
