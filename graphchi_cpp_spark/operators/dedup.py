"""Deduplication operators for training-data pipelines (north-star set).

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket
join), SimHash, n-gram Jaccard verification, embedding-cosine near-dup.
All hash functions are the deterministic md5-derived cross-engine
primitive from ``operators.text`` — Spark and DuckDB produce identical
signatures, so even the LSH candidate sets are oracle-comparable.

Scale design (the point of these at 100 TB):
- shingling is a per-row projection (no shuffle);
- minhash signatures: explode(shingles × K hash params) → groupBy(doc,
  hash_id).min — partial aggregation bounds the shuffle to docs×K rows;
- LSH banding: one groupBy(band_key) — only docs sharing a band collide,
  so the candidate join is output-bounded, never all-pairs;
- exact Jaccard verification runs ONLY on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.operators.text import (
    HASH_PRIME,
    md5_long,
    md5_long_sql,
    tokens,
)

# stop-shingle document-frequency cap for the exact inverted-index
# dedup path — mirrors cf/itemcf.py:DEFAULT_MAX_USER_DEGREE: the
# postings self-join fans out Sum_sh df(sh)^2, so one boilerplate
# shingle shared by 10^6 docs alone yields 10^12 join rows at corpus
# scale. ON by default; pass max_df=None for the uncapped exact run.
DEFAULT_MAX_SHINGLE_DF = 1000


# scratch dirs written by disk-mode materialization; freed at process
# exit, or earlier via reclaim_scratch() once no reader is live
_SCRATCH_DIRS: list[str] = []


def reclaim_scratch() -> None:
    """Delete disk-mode scratch tables. Callers (e.g. bench repeat
    loops) must ensure no DataFrame still reading them is live."""
    import shutil

    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


def _materialize_postings(df: DataFrame, name: str = "postings") -> DataFrame:
    """Eagerly materialize a multiply-consumed postings table.

    Default: ``localCheckpoint`` — lineage-truncating MEMORY_AND_DISK
    blocks, right when the table fits the executor heap. With
    ``SPARK_GRAFT_MATERIALIZE=disk``: write to scratch parquet and read
    back — the out-of-core path for postings tables that rival the heap
    (30M docs × 22 shingles = 660M rows ≈ tens of GB on a single host).
    Plain files rather than DISK_ONLY persist on purpose: block-manager
    storage is subject to cleaner/eviction races under a GC-pressured
    heap (observed: ``Block rdd_*_* does not exist`` killing a 24-min
    job at 30M docs), while a parquet scan is re-readable forever and
    gets column pruning on each downstream consumer. This is the analog
    of the reference's core design decision — GraphChi keeps shards on
    disk and streams them (src/engine/graphchi_engine.hpp PSW loop) —
    applied to the one intermediate this operator must read three times
    (sizes, stop set, self-join). On a multi-executor cluster the
    default is fine: the same table spreads across executors'
    memory+disk."""
    import os

    if os.environ.get("SPARK_GRAFT_MATERIALIZE") == "disk":
        import atexit
        import tempfile

        path = tempfile.mkdtemp(prefix=f"graft_scratch_{name}_")
        if not _SCRATCH_DIRS:
            atexit.register(reclaim_scratch)
        _SCRATCH_DIRS.append(path)
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint(eager=True)


# deterministic affine hash params for minhash permutations
def _hash_params(k: int) -> list[tuple[int, int, int]]:
    """(i, a, b) for h_i(x) = (a*x + b) mod HASH_PRIME, a odd, fixed."""
    return [(i, 2 * i + 1 + 104729, (i * 12289 + 514229) % HASH_PRIME) for i in range(k)]


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #
def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, group_size) — canonical = min doc_id with
    identical text (md5 groupBy; collision-safe enough at any scale when
    extended to 128 bits — we group on the full md5 hex)."""
    h = docs.select("doc_id", F.md5(F.col(text_col)).alias("h"))
    groups = h.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        h.join(groups, "h")
        .select("doc_id", "canonical_id", F.col("group_size").cast("long"))
    )


def exact_duplicates_sql(docs_sql: str = "documents") -> str:
    return f"""
        WITH h AS (SELECT doc_id, md5(text) AS h FROM {docs_sql}),
        g AS (SELECT h, min(doc_id) AS canonical_id, count(*) AS group_size
              FROM h GROUP BY h)
        SELECT doc_id, canonical_id, group_size::BIGINT AS group_size
        FROM h JOIN g USING (h)
    """


# --------------------------------------------------------------------- #
# shingles + minhash signatures
# --------------------------------------------------------------------- #
def _gram_strings(toks, n: int):
    """Array column of word n-gram strings from a MATERIALIZED token
    array column. ``toks`` must be an attribute reference to a column
    projected in a prior select, never an inline ``tokens(text)``
    expression: any non-trivial child captured by a higher-order-
    function lambda is re-evaluated PER ELEMENT (the split ran once per
    gram — measured 3× slower on the sf0.1 gram expansion), and nesting
    further HOFs on top compounds it (measured 8× vs
    explode-then-compute)."""
    cnt = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def shingle_hashes(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, sh) — distinct md5-int hashes of word n-gram shingles."""
    pre = docs.select("doc_id", tokens(F.col(text_col)).alias("_toks"))
    return (
        pre.select("doc_id", F.explode(_gram_strings(F.col("_toks"), n)).alias("g"))
        .select("doc_id", F.pmod(md5_long(F.col("g")), F.lit(HASH_PRIME)).alias("sh"))
        .distinct()
    )


def shingle_hashes_sql(docs_sql: str = "documents", n: int = 3) -> str:
    return f"""
        SELECT DISTINCT doc_id,
               {md5_long_sql('g')} % {HASH_PRIME} AS sh
        FROM (
            SELECT doc_id, unnest(list_transform(
                range(1, greatest(len(string_split(text,' ')) - {n - 1}, 1) + 1),
                i -> array_to_string(string_split(text,' ')[i : i + {n - 1}], ' ')
            )) AS g
            FROM {docs_sql}
        )
    """


def _shingle_hash_array(toks, n: int):
    """Per-row array of shingle hashes from a materialized token array
    column (min is duplicate-insensitive, so no distinct needed)."""
    return F.transform(
        _gram_strings(toks, n),
        lambda g: F.pmod(md5_long(g), F.lit(HASH_PRIME)),
    )


def minhash_columns(
    docs: DataFrame, text_col: str = "text", n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """(doc_id, mh0..mh{K-1}) — ZERO-shuffle minhash: the signature is a
    per-row projection (array_min over the shingle-hash array under each
    affine permutation), entirely inside whole-stage codegen. This is the
    scale path: 100 TB of documents → embarrassingly parallel scan, no
    exchange until the LSH band join."""
    pre = docs.select("doc_id", tokens(F.col(text_col)).alias("_toks"))
    d = pre.select(
        "doc_id", _shingle_hash_array(F.col("_toks"), n).alias("_shs")
    )

    def perm(a: int, b: int):
        return lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(HASH_PRIME))

    mh_cols = [
        F.array_min(F.transform(F.col("_shs"), perm(a, b))).alias(f"mh{i}")
        for i, a, b in _hash_params(num_hashes)
    ]
    return d.select("doc_id", *mh_cols)


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """(doc_id, hash_id, mh) — long-form view of minhash_columns (same
    math as the SQL oracle's explode+groupBy; Spark side needs no shuffle,
    the explode is a cheap projection of K columns)."""
    wide = minhash_columns(docs, text_col, n, num_hashes)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("hash_id"), F.col(f"mh{i}").alias("mh"))
            for i in range(num_hashes)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.hash_id").cast("int").alias("hash_id"), F.col("p.mh")
    )


def minhash_signatures_sql(
    docs_sql: str = "documents", n: int = 3, num_hashes: int = 32
) -> str:
    params_rows = ", ".join(f"({i}, {a}, {b})" for i, a, b in _hash_params(num_hashes))
    return f"""
        WITH sh AS ({shingle_hashes_sql(docs_sql, n)}),
        params(hash_id, a, b) AS (VALUES {params_rows})
        SELECT doc_id, hash_id,
               min((a * sh + b) % {HASH_PRIME}) AS mh
        FROM sh CROSS JOIN params
        GROUP BY doc_id, hash_id
    """


# --------------------------------------------------------------------- #
# LSH banding → candidate pairs
# --------------------------------------------------------------------- #
def banded_keys(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """(doc_id, band, band_key) — the LSH band keys as a PURE per-row
    projection (minhash columns → per-band concat → one explode), no
    shuffle and no action, so it composes into batch plans AND streaming
    DataFrames unchanged (streaming/dedup.py builds its stateful
    candidate op on this exact projection)."""
    wide = minhash_columns(docs, text_col, n, bands * rows_per_band)
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{band * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias("band_key"),
        )
        for band in range(bands)
    ]
    return wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key")
    )


def lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """(doc_a, doc_b) candidate near-duplicate pairs: docs agreeing on all
    rows of at least one band. 8×4 ≈ catches Jaccard ≳ 0.5.

    Scale shape: band keys are per-row projections (no shuffle), then ONE
    explode to (doc, band, key) and ONE self-equi-join on (band, key) —
    output-bounded, never all-pairs."""
    banded = banded_keys(docs, text_col, n, bands, rows_per_band).localCheckpoint(
        eager=True
    )
    a = banded.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    b = banded.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_candidates_sql(
    docs_sql: str = "documents", n: int = 3, bands: int = 8, rows_per_band: int = 4
) -> str:
    return f"""
        WITH sig AS ({minhash_signatures_sql(docs_sql, n, bands * rows_per_band)}),
        banded AS (
            SELECT doc_id, hash_id // {rows_per_band} AS band,
                   string_agg(mh::VARCHAR, ',' ORDER BY hash_id) AS band_key
            FROM sig GROUP BY doc_id, hash_id // {rows_per_band}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id
    """


# --------------------------------------------------------------------- #
# n-gram Jaccard (verification of candidates, or exact pairwise)
# --------------------------------------------------------------------- #
def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for the given candidate pairs.

    Scale shape: shingle sets are built ONLY for documents that appear
    in a candidate pair (semi-join first), so verification cost is
    proportional to |candidates|, not |corpus| — at a 100 TB corpus
    with a sub-percent candidate rate this is the difference between
    re-shingling everything and re-shingling almost nothing. The
    intersection is a per-row ``array_intersect`` on the two docs'
    shingle-set arrays (one collect_set shuffle, two bounded joins),
    not a corpus-wide postings join."""
    doc_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sub = docs.join(doc_ids, "doc_id", "leftsemi").select(
        "doc_id", tokens(F.col(text_col)).alias("_toks")
    )
    sets = (
        sub.select("doc_id", F.explode(_gram_strings(F.col("_toks"), n)).alias("g"))
        .select(
            "doc_id", F.pmod(md5_long(F.col("g")), F.lit(HASH_PRIME)).alias("sh")
        )
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("shs"))
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                inter / (F.size("sa") + F.size("sb") - inter)
            ).cast("double").alias("jaccard"),
        )
    )


def ngram_jaccard_dedup(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact-SCORE n-gram Jaccard dedup via the shingle inverted index:
    candidate pairs are documents sharing ≥1 retained shingle; every
    reported Jaccard is exact (computed over the FULL, unpruned shingle
    sets). Returns (doc_a, doc_b, jaccard ≥ threshold). With the default
    ``max_df`` pruning, recall is near- but not strictly complete: a
    pair is missed only if EVERY shingle it shares has df > max_df.
    Pass ``max_df=None`` for the exhaustive run with zero false
    negatives for any threshold > 0 (a pair with positive Jaccard
    shares a shingle by definition).

    Scale: the postings self-join fans out Σ_sh df(sh)², so common
    shingles dominate cost; ``max_df`` (ON by default,
    ``DEFAULT_MAX_SHINGLE_DF``) prunes shingles whose document frequency
    exceeds it from candidate generation (stop-shingle removal — the
    join bound becomes Σ over retained shingles only). The stop set is
    tiny BY CONSTRUCTION (≤ |postings| / max_df shingles), so it is
    computed with one map-side-combined aggregate and BROADCAST: the
    kept postings are a broadcast anti-join (no shuffle of the postings
    table, and no window over partitionBy(sh), which would sort exactly
    the skewed hub-shingle groups pruning exists to remove). When no
    shingle exceeds max_df — the common case at moderate corpus sizes —
    the plan short-circuits to the exhaustive single self-join, making
    the default pruning free. Otherwise the pruned self-join yields each
    candidate's intersection count over retained shingles for free, and
    exactness is restored by adding only the pruned shingles'
    contribution — candidates joined against the (broadcast-semi-joined)
    df>max_df postings on both sides, a join bounded by
    |candidates| × (pruned shingles per doc), typically a handful —
    rather than re-expanding every candidate against the full table.
    This plays the memory-bounding role of the reference's pivot
    batching (toolkits/collaborative_filtering/itemcf.cpp:206)."""
    sh = _materialize_postings(shingle_hashes(docs, text_col, n))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))

    def exhaustive_inter() -> DataFrame:
        return (
            sh.select(F.col("doc_id").alias("doc_a"), "sh")
            .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("c"))
        )

    if max_df is None:
        inter = exhaustive_inter()
    else:
        stop = _materialize_postings(
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("sh"),
            name="stop",
        )
        if stop.isEmpty():
            # no stop shingles: the pruned plan IS the exhaustive plan
            inter = exhaustive_inter()
        else:
            inter = _pruned_inter(sh, stop)
    sza = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa"))
    szb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb"))
    return (
        inter.join(sza, "doc_a")
        .join(szb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c") / (F.col("sa") + F.col("sb") - F.col("c")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _pruned_inter(sh: DataFrame, stop: DataFrame) -> DataFrame:
    """(doc_a, doc_b, c) exact intersection counts with stop-shingle
    pruned candidate generation: c_kept from the pruned self-join plus
    the dropped shingles' delta. ``stop`` must be small (broadcast)."""
    postings = sh.join(F.broadcast(stop), "sh", "left_anti")
    # the candidate self-join already computes each pair's
    # intersection count over RETAINED shingles — keep it
    c_kept = (
        postings.select(F.col("doc_id").alias("doc_a"), "sh")
        .join(postings.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c_kept"))
    )
    # exactness delta: only the PRUNED (df > max_df) shingles'
    # postings, joined against candidates on both sides — bounded
    # by |candidates| × (pruned shingles per doc), not the full table
    dropped_postings = sh.join(F.broadcast(stop), "sh", "left_semi")
    c_drop = (
        c_kept.select("doc_a", "doc_b")
        .join(
            dropped_postings.select(F.col("doc_id").alias("doc_a"), "sh"),
            "doc_a",
        )
        .join(
            dropped_postings.select(F.col("doc_id").alias("doc_b"), "sh"),
            ["doc_b", "sh"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c_drop"))
    )
    return c_kept.join(c_drop, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        (F.col("c_kept") + F.coalesce(F.col("c_drop"), F.lit(0))).alias("c"),
    )


def ngram_jaccard_dedup_sql(
    docs_sql: str = "documents",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> str:
    """DuckDB twin of the exact inverted-index dedup, including the
    identical max_df candidate pruning + unpruned-intersection recount."""
    if max_df is None:
        inter = """
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )"""
    else:
        inter = f"""
        stop AS (
            SELECT sh FROM sh GROUP BY sh HAVING count(*) > {max_df}
        ),
        p AS (
            SELECT doc_id, sh FROM sh
            WHERE sh NOT IN (SELECT sh FROM stop)
        ),
        c_kept AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c_kept
            FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        dp AS (
            SELECT doc_id, sh FROM sh
            WHERE sh IN (SELECT sh FROM stop)
        ),
        c_drop AS (
            SELECT k.doc_a, k.doc_b, count(*) AS c_drop
            FROM c_kept k
            JOIN dp a ON a.doc_id = k.doc_a
            JOIN dp b ON b.doc_id = k.doc_b AND b.sh = a.sh
            GROUP BY 1, 2
        ),
        inter AS (
            SELECT k.doc_a, k.doc_b,
                   k.c_kept + coalesce(d.c_drop, 0) AS c
            FROM c_kept k
            LEFT JOIN c_drop d
              ON d.doc_a = k.doc_a AND d.doc_b = k.doc_b
        )"""
    return f"""
        WITH sh AS ({shingle_hashes_sql(docs_sql, n)}),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        {inter}
        SELECT doc_a, doc_b,
               round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(c * 1.0 / (sa.sz + sb.sz - c), 6) >= {threshold}
    """


def ngram_contamination(
    train: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_containment: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: for each (train doc, probe doc) pair,
    containment = |shared n-gram shingles| / |probe shingles| — the
    fraction of the benchmark document already present in the training
    document. Returns (train_id, probe_id, overlap, containment ≥
    min_containment).

    Scale: probe sets (benchmark suites) are tiny next to a 100 TB
    training corpus, so the probe shingle table is broadcast — the whole
    check is one map-side join over the training shingle stream plus a
    partially-aggregated groupBy; no shuffle of train-side shingles by
    key is ever needed. Longer n (5-13 words) is the decontamination
    convention: incidental phrase overlap dies off exponentially in n."""
    t_sh = shingle_hashes(train, text_col, n)
    p_sh = shingle_hashes(probes, text_col, n)
    p_sizes = p_sh.groupBy("doc_id").agg(F.count("*").alias("psz"))
    inter = (
        t_sh.select(F.col("doc_id").alias("train_id"), "sh")
        .join(
            F.broadcast(p_sh.select(F.col("doc_id").alias("probe_id"), "sh")),
            "sh",
        )
        .groupBy("train_id", "probe_id")
        .agg(F.count("*").alias("overlap"))
    )
    return (
        inter.join(
            F.broadcast(p_sizes.select(F.col("doc_id").alias("probe_id"), "psz")),
            "probe_id",
        )
        .select(
            "train_id",
            "probe_id",
            "overlap",
            F.round(F.col("overlap") / F.col("psz"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )


def ngram_contamination_sql(
    train_filter: str,
    probe_filter: str,
    docs_sql: str = "documents",
    n: int = 5,
    min_containment: float = 0.2,
) -> str:
    """DuckDB twin: ``train_filter``/``probe_filter`` are WHERE
    predicates carving the two sides out of the documents table."""
    return f"""
        WITH t_sh AS (
            SELECT * FROM ({shingle_hashes_sql(docs_sql, n)})
            WHERE {train_filter}
        ),
        p_sh AS (
            SELECT * FROM ({shingle_hashes_sql(docs_sql, n)})
            WHERE {probe_filter}
        ),
        p_sizes AS (SELECT doc_id, count(*) AS psz FROM p_sh GROUP BY doc_id),
        inter AS (
            SELECT t.doc_id AS train_id, p.doc_id AS probe_id,
                   count(*) AS overlap
            FROM t_sh t JOIN p_sh p ON t.sh = p.sh
            GROUP BY 1, 2
        )
        SELECT train_id, probe_id, overlap,
               round(overlap * 1.0 / psz, 6) AS containment
        FROM inter JOIN p_sizes ON p_sizes.doc_id = probe_id
        WHERE round(overlap * 1.0 / psz, 6) >= {min_containment}
    """


def minhash_dedup_pairs_sql(
    docs_sql: str = "documents",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> str:
    """Candidates verified by exact shingle Jaccard >= threshold."""
    return f"""
        WITH cand AS ({lsh_candidates_sql(docs_sql, n, bands, rows_per_band)}),
        sh AS ({shingle_hashes_sql(docs_sql, n)}),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS c
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT c.doc_a, c.doc_b,
               round(coalesce(i.c, 0) * 1.0 /
                     (sa.sz + sb.sz - coalesce(i.c, 0)), 6) AS jaccard
        FROM cand c
        LEFT JOIN inter i USING (doc_a, doc_b)
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
        WHERE coalesce(i.c, 0) * 1.0 / (sa.sz + sb.sz - coalesce(i.c, 0))
              >= {threshold}
    """


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """The full MinHash pipeline: LSH candidates verified by exact
    Jaccard ≥ threshold. Returns (doc_a, doc_b, jaccard)."""
    # candidates are output-bounded and referenced 3× downstream
    # (doc_id semi-join ×2 + the final pair join) — materialize once
    cand = lsh_candidates(docs, text_col, n, bands, rows_per_band).localCheckpoint(
        eager=True
    )
    j = ngram_jaccard(docs, cand, text_col, n)
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #
def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — classic Charikar simhash over word unigrams:
    bit_j = sign of Σ_tokens (±1 depending on bit j of token hash).

    Implemented as ONE groupBy with ``bits`` aggregate columns (exact
    integer bit ops, no row blowup): the shuffle carries docs×bits ints
    via partial aggregation.
    """
    toks = tokens(F.col(text_col))
    th = docs.select("doc_id", F.explode(toks).alias("t")).select(
        "doc_id", md5_long(F.col("t")).alias("h")
    )
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"ss{j}")
        for j in range(bits)
    ]
    bitsums = th.groupBy("doc_id").agg(*sums)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"ss{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bitsums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_sql(docs_sql: str = "documents", bits: int = 32) -> str:
    sums = ",\n".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS ss{j}"
        for j in range(bits)
    )
    total = " + ".join(
        f"CASE WHEN ss{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END" for j in range(bits)
    )
    return f"""
        WITH th AS (
            SELECT doc_id, {md5_long_sql('t')} AS h
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                  FROM {docs_sql})
        ),
        bitsums AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id)
        SELECT doc_id, ({total})::BIGINT AS simhash FROM bitsums
    """


# --------------------------------------------------------------------- #
# embedding-cosine near-duplicates
# --------------------------------------------------------------------- #
def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold.

    Brute-force all-pairs (the baseline path); for web scale switch to
    LSH bucketing first (operators.similarity.lsh_cosine_candidates) and
    verify only bucket collisions with the same expression.
    """
    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = v.select("id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm"))
    a = norm.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = norm.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
