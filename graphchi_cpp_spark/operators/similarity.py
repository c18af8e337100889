"""Similarity search over embedding columns (north-star set).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (bucket → candidate join → exact re-rank).

Scale design: brute force is O(Q·N·D) — fine for reranking or small Q;
the LSH path prunes to bucket collisions, turning all-pairs into an
output-bounded equi-join (same shape as dedup.lsh_candidates). IVF with
k-means centroids would slot in the same way (assign → probe nearest
cells → exact re-rank); hyperplane LSH is chosen because it is fully
deterministic (hash-derived hyperplanes, no training state).

Determinism: dot products fold left-to-right in double precision in both
Spark (zip_with + aggregate) and DuckDB (list_dot_product on DOUBLE[]),
so scores are bit-comparable; ranks tiebreak on id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from graphchi_cpp_spark.operators.text import HASH_PRIME
from graphchi_cpp_spark.operators.toplist import top_k_per_key


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact brute-force top-k
    neighbors (self excluded) for each query vector."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    base = base.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnrm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    scored = (
        q.crossJoin(F.broadcast(base))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    return top_k_per_key(scored, "query_id", "cosine", k, tiebreak_col="vec_id")


def cosine_topk_sql(
    queries_filter: str, k: int = 10, table: str = "embeddings"
) -> str:
    """DuckDB oracle: ``queries_filter`` is a WHERE predicate selecting
    the query vectors (e.g. 'vec_id % 20 = 0')."""
    return f"""
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM {table}
        ),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM base
              WHERE {queries_filter.replace('vec_id', 'vec_id')}),
        scored AS (
            SELECT q.query_id, b.vec_id,
                   round(list_dot_product(q.qv, b.v) / (q.qnrm * b.nrm), 6) AS cosine
            FROM q CROSS JOIN base b
            WHERE q.query_id != b.vec_id
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
            ) AS rank FROM scored
        ) WHERE rank <= {k}
    """


# --------------------------------------------------------------------- #
# random-hyperplane LSH
# --------------------------------------------------------------------- #
def _hyperplane(plane_id: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component c from an
    affine hash — reproducible everywhere, no RNG state."""
    comps = []
    for c in range(dim):
        v = (1103515245 * (plane_id * dim + c) + 12345) % HASH_PRIME
        comps.append((v / HASH_PRIME) * 2.0 - 1.0)
    return comps


def lsh_sign_buckets(
    embeddings: DataFrame,
    num_planes: int = 4,
    num_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(vec_id, band, bucket) — per band, bucket = bit-packed signs of
    ``num_planes`` hyperplane projections (independent planes per band).
    OR-amplification: vectors collide if they agree in ANY band — the
    standard banding construction (few planes per band → high recall,
    many bands → precision via the exact re-rank)."""
    v = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    band_cols = []
    for band in range(num_bands):
        bucket = None
        for p in range(num_planes):
            plane = F.array(
                *[F.lit(x) for x in _hyperplane(band * num_planes + p, dim)]
            )
            bit = F.when(_dot(F.col("v"), plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        band_cols.append(
            F.struct(F.lit(band).alias("band"), bucket.cast("long").alias("bucket"))
        )
    return v.select(
        "vec_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 4,
    num_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: candidates = bucket collision in any band, exact cosine
    re-rank of the (deduped) candidates. Recall < 1 by construction
    (documented ANN semantics); tune (num_planes, num_bands) for the
    recall/cost point."""
    buckets = lsh_sign_buckets(
        embeddings, num_planes, num_bands, id_col, vec_col, dim
    ).cache()
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnrm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    cand = (
        buckets.withColumnRenamed("vec_id", "query_id")
        .join(q.select("query_id"), "query_id", "left_semi")
        .join(buckets, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(q, "query_id")
        .join(base, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    return top_k_per_key(scored, "query_id", "cosine", k, tiebreak_col="vec_id")


def lsh_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 4,
    num_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(id_a, id_b, cosine) near-duplicate pairs via sign-LSH bucketing —
    the SCALE path for embedding dedup: candidates are pairs colliding in
    ANY band (one explode + one equi-join on (band, bucket), output-
    bounded), then exact cosine keeps pairs ≥ threshold. No crossJoin
    anywhere in the plan. Recall < 1 by construction (pairs colliding in
    no band are missed — OR-amplified banding semantics, documented);
    ``dedup.embedding_near_dups`` is the exact brute-force verifier.
    """
    buckets = lsh_sign_buckets(
        embeddings, num_planes, num_bands, id_col, vec_col, dim
    )
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a = buckets.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    vb = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def lsh_near_dups_sql(
    threshold: float,
    num_planes: int = 4,
    num_bands: int = 8,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB oracle for ``lsh_near_dups`` — the deterministic hyperplanes
    reproduce the candidate sets bit-identically."""
    band_bucket_exprs = []
    for band in range(num_bands):
        bits = []
        for p in range(num_planes):
            plane = _hyperplane(band * num_planes + p, dim)
            lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
            bits.append(
                f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << p} ELSE 0 END)"
            )
        band_bucket_exprs.append(
            f"{{'band': {band}, 'bucket': {' + '.join(bits)}}}"
        )
    bucket_rows = ", ".join(band_bucket_exprs)
    return f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM {table}
        ),
        buckets AS MATERIALIZED (
            SELECT id, bb['band'] AS band, bb['bucket'] AS bucket
            FROM base, unnest([{bucket_rows}]) AS t(bb)
        ),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM buckets a
            JOIN buckets b ON b.band = a.band AND b.bucket = a.bucket
                           AND a.id < b.id
        )
        SELECT c.id_a, c.id_b,
               round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6) AS cosine
        FROM cand c
        JOIN base va ON va.id = c.id_a
        JOIN base vb ON vb.id = c.id_b
        WHERE list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm) >= {threshold}
    """


def embedding_near_dups_sql(threshold: float, table: str = "embeddings") -> str:
    """DuckDB oracle for dedup.embedding_near_dups."""
    return f"""
        WITH base AS (
            SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM {table}
        )
        SELECT a.id AS id_a, b.id AS id_b,
               round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
        FROM base a JOIN base b ON a.id < b.id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {threshold}
    """


def lsh_cosine_topk_sql(
    queries_filter: str,
    k: int = 10,
    num_planes: int = 4,
    num_bands: int = 8,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB oracle for lsh_cosine_topk — possible because the
    hyperplanes are deterministic literals (no RNG): buckets, candidate
    sets and the exact re-rank all reproduce bit-identically."""
    band_bucket_exprs = []
    for band in range(num_bands):
        bits = []
        for p in range(num_planes):
            plane = _hyperplane(band * num_planes + p, dim)
            lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
            bits.append(
                f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << p} ELSE 0 END)"
            )
        band_bucket_exprs.append(
            f"{{'band': {band}, 'bucket': {' + '.join(bits)}}}"
        )
    bucket_rows = ", ".join(band_bucket_exprs)
    return f"""
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM {table}
        ),
        buckets AS (
            SELECT vec_id, bb['band'] AS band, bb['bucket'] AS bucket
            FROM base, unnest([{bucket_rows}]) AS t(bb)
        ),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM base
              WHERE {queries_filter}),
        cand AS (
            SELECT DISTINCT qa.vec_id AS query_id, bb.vec_id
            FROM buckets qa
            JOIN q ON q.query_id = qa.vec_id
            JOIN buckets bb ON bb.band = qa.band AND bb.bucket = qa.bucket
                            AND bb.vec_id != qa.vec_id
        ),
        scored AS (
            SELECT c.query_id, c.vec_id,
                   round(list_dot_product(q.qv, b.v) / (q.qnrm * b.nrm), 6) AS cosine
            FROM cand c
            JOIN q ON q.query_id = c.query_id
            JOIN base b ON b.vec_id = c.vec_id
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
            ) AS rank FROM scored
        ) WHERE rank <= {k}
    """
