"""Similarity search over embedding columns (north-star set).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (bucket → candidate join → exact re-rank).

Scale design: brute force is O(Q·N·D) — fine for reranking or small Q;
the LSH path prunes to bucket collisions, turning all-pairs into an
output-bounded equi-join (same shape as dedup.lsh_candidates). The IVF
path (``ivf_topk``) is the FAISS-style alternative: spherical k-means
coarse quantizer trained on a bounded deterministic sample, broadcast
centroids → map-only cell assignment → probe the ``nprobe`` nearest
cells per query → exact re-rank, an equi-join on cell that scans only
nprobe/n_cells of the base at 100 TB. The registered contract uses
``iters=0`` (seed centroids, no averaging) so every score is a
left-to-right double dot product reproducible bit-for-bit in DuckDB;
Lloyd refinement (``iters>0``) is recall-tested in pytest.

Determinism: dot products fold left-to-right in double precision in both
Spark (zip_with + aggregate) and DuckDB (list_dot_product on DOUBLE[]),
so scores are bit-comparable; ranks tiebreak on id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

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
    partial_buckets: int = 64,
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact brute-force top-k
    neighbors (self excluded) for each query vector.

    Scale: the QUERY side is the small one (a probe set against a
    100 TB corpus), so queries are broadcast and the corpus stays
    distributed — scoring is map-side over corpus partitions, no corpus
    shuffle. Top-k then runs two-phase: partial top-k within
    (query_id, corpus-hash-bucket) so no single window group ever holds
    a whole corpus' scores for one query, then a final merge over the
    ≤ k × partial_buckets survivors per query. For corpus-scale query
    sets use ``lsh_topk`` / ``ivf_topk`` instead."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    base = base.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnrm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    scored = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    partial = top_k_per_key(
        scored.withColumn("_b", F.pmod(F.col("vec_id"), F.lit(partial_buckets))),
        ["query_id", "_b"],
        "cosine",
        k,
        tiebreak_col="vec_id",
    ).drop("_b", "rank")
    return top_k_per_key(partial, "query_id", "cosine", k, tiebreak_col="vec_id")


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
    many bands → precision via the exact re-rank).

    Physical shape (r11, guide §7.2): the plane matrix is ONE
    nested-array literal and all bands*planes dots are one ``transform``
    over it, replacing the former per-plane expansion (32 separate
    64-element ``F.array(F.lit(...))`` chains — ~2048 literal nodes,
    each carrying its own zip_with/aggregate subtree) that every fresh
    plan re-analyzed. A fully UNROLLED arithmetic variant (no arrays,
    codegen-able) was measured 2-6× SLOWER end-to-end: the 8k-node tree
    moves the cost into the optimizer. Dots still fold left-to-right
    per plane via the same zip_with/aggregate, so every sign, bucket,
    candidate set and final ranking is bit-identical (verified
    exceptAll both directions at sf0.01/sf0.1 + oracle hash gate)."""
    v = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    planes = F.lit(
        [_hyperplane(i, dim) for i in range(num_bands * num_planes)]
    )
    dots = F.transform(
        F.sequence(F.lit(0), F.lit(num_bands * num_planes - 1)),
        lambda i: _dot(F.col("v"), F.get(planes, i)),
    )
    vd = v.select("vec_id", dots.alias("ds"))
    band_cols = []
    for band in range(num_bands):
        bucket = None
        for p in range(num_planes):
            bit = F.when(
                F.get("ds", band * num_planes + p) > 0, F.lit(1 << p)
            ).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        band_cols.append(
            F.struct(F.lit(band).alias("band"), bucket.cast("long").alias("bucket"))
        )
    return vd.select(
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
    from graphchi_cpp_spark.operators.dedup import _materialize_postings

    # eager materialization, not lazy cache: the candidate build consumes
    # the buckets table TWICE in one job (probe semi-join + collision
    # self-join) — an unpopulated lazy cache computes it twice (the
    # dual-consumer pattern documented at algos/triangles.py), and disk
    # mode routes heap-rivaling bucket tables to scratch parquet
    buckets = _materialize_postings(
        lsh_sign_buckets(embeddings, num_planes, num_bands, id_col, vec_col, dim),
        "lsh_buckets",
    )
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


# --------------------------------------------------------------------- #
# IVF (inverted-file) ANN — coarse quantizer + probed exact re-rank
# --------------------------------------------------------------------- #
def _unit(vcol: Column, nrmcol: Column) -> Column:
    return F.transform(vcol, lambda x: x / nrmcol)


def _cell_scores(v: Column, nrm: Column, cents: list[list[float]]) -> Column:
    """array<struct<s,nc>> of (rounded centroid dot, -cell) — struct
    ordering then gives argmax with smallest-cell tiebreak for free."""
    structs = []
    for cell, c in enumerate(cents):
        lit = F.array(*[F.lit(float(x)) for x in c])
        score = F.round(_dot(v, lit) / nrm, 6)
        structs.append(
            F.struct(score.alias("s"), F.lit(-cell).cast("int").alias("nc"))
        )
    return F.array(*structs)


def _argmax_cell(v: Column, nrm: Column, cents: list[list[float]]) -> Column:
    return (-F.array_max(_cell_scores(v, nrm, cents)).getField("nc")).cast("int")


# above this many cells, literal expressions stop being the right plan
# (codegen size grows as n_cells × dim) — switch to a broadcast join
EXPR_CELLS_LIMIT = 64


def _cents_df(df_src: DataFrame, cents: list[list[float]]) -> DataFrame:
    spark = df_src.sparkSession
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], ["cell", "c"]
    ).select("cell", F.col("c").cast("array<double>").alias("c"))


def _rank_cells_via_join(
    vecs: DataFrame, cents: list[list[float]], id_col: str, n_keep: int
) -> DataFrame:
    """(id_col, cell) — the n_keep best cells per vector via a broadcast
    join against the centroid table: n × n_cells scored rows, ranked by
    (rounded dot desc, cell asc). The large-n_cells twin of the literal
    expressions (identical scores, same tiebreak)."""
    scored = vecs.crossJoin(F.broadcast(_cents_df(vecs, cents))).select(
        id_col,
        "cell",
        F.round(_dot(F.col("v"), F.col("c")) / F.col("nrm"), 6).alias("s"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("s").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_keep)
        .select(id_col, "cell")
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    iters: int = 0,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train the coarse quantizer; returns the (tiny, n_cells × dim)
    centroid list on the driver — it is broadcast into assignment
    expressions, never joined.

    Seeds are the ``n_cells`` lowest-id vectors of the deterministic
    ``vec_id % sample_mod == 0`` sample, unit-normalized. ``iters``
    rounds of spherical k-means (assign by max cosine → unit-mean
    update) refine them; each round is one distributed pass over the
    sample plus an n_cells × dim collect, so training cost is bounded
    by the sample size, not the corpus — the FAISS convention. Empty
    cells keep their previous centroid."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if sample_mod > 1:
        base = base.filter(F.col("vec_id") % sample_mod == 0)
    base = base.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    seed = (
        base.orderBy("vec_id")
        .limit(n_cells)
        .select(_unit(F.col("v"), F.col("nrm")).alias("c"))
        .collect()
    )
    cents = [list(r["c"]) for r in seed]
    for _ in range(iters):
        if len(cents) > EXPR_CELLS_LIMIT:
            assigned = base.join(
                _rank_cells_via_join(base, cents, "vec_id", 1), "vec_id"
            )
        else:
            assigned = base.withColumn(
                "cell", _argmax_cell(F.col("v"), F.col("nrm"), cents)
            )
        upd = (
            assigned
            .select(
                "cell",
                F.posexplode(_unit(F.col("v"), F.col("nrm"))).alias("pos", "val"),
            )
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for cell, comps in by_cell.items():
            mean = [comps[p] for p in range(len(cents[cell]))]
            nrm = sum(x * x for x in mean) ** 0.5
            if nrm > 0:
                cents[cell] = [x / nrm for x in mean]
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    iters: int = 0,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: assign every base vector to its nearest centroid
    (map-only — centroids are expression literals), probe the ``nprobe``
    best cells per query, exact-cosine re-rank only inside probed cells.
    At scale the candidate join is an equi-join on ``cell`` that touches
    ~nprobe/n_cells of the base; recall < 1 by construction (documented
    ANN semantics), tune (n_cells, nprobe) for the recall/cost point."""
    cents = ivf_centroids(embeddings, n_cells, iters, sample_mod, id_col, vec_col)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnrm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    if n_cells > EXPR_CELLS_LIMIT:
        assign = base.join(
            _rank_cells_via_join(base, cents, "vec_id", 1), "vec_id"
        )
        probes = _rank_cells_via_join(
            q.select("query_id", F.col("qv").alias("v"), F.col("qnrm").alias("nrm")),
            cents,
            "query_id",
            nprobe,
        )
    else:
        assign = base.withColumn(
            "cell", _argmax_cell(F.col("v"), F.col("nrm"), cents)
        )
        # top-nprobe cells: sort (s, nc) asc, reverse → s desc, cell asc
        probes = q.select(
            "query_id",
            F.explode(
                F.transform(
                    F.slice(
                        F.reverse(
                            F.array_sort(
                                _cell_scores(F.col("qv"), F.col("qnrm"), cents)
                            )
                        ),
                        1,
                        nprobe,
                    ),
                    lambda st: (-st.getField("nc")).cast("int"),
                )
            ).alias("cell"),
        )
    scored = (
        probes.join(assign, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(q, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    return top_k_per_key(scored, "query_id", "cosine", k, tiebreak_col="vec_id")


def ivf_topk_sql(
    queries_filter: str,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    sample_mod: int = 1,
    table: str = "embeddings",
) -> str:
    """DuckDB oracle for ``ivf_topk(iters=0)`` — seed centroids involve
    no averaging, so every score is the same left-to-right double dot
    product in both engines (round-6 guarded, cell-asc tiebreaks)."""
    sample = f"vec_id % {sample_mod} = 0" if sample_mod > 1 else "TRUE"
    return f"""
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM {table}
        ),
        cents AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   list_transform(v, x -> x / nrm) AS c
            FROM (SELECT * FROM base WHERE {sample}
                  ORDER BY vec_id LIMIT {n_cells})
        ),
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT b.vec_id, c.cell, row_number() OVER (
                    PARTITION BY b.vec_id
                    ORDER BY round(list_dot_product(b.v, c.c) / b.nrm, 6) DESC,
                             c.cell ASC) AS rn
                FROM base b CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM base
              WHERE {queries_filter}),
        probes AS (
            SELECT query_id, cell FROM (
                SELECT q.query_id, c.cell, row_number() OVER (
                    PARTITION BY q.query_id
                    ORDER BY round(list_dot_product(q.qv, c.c) / q.qnrm, 6) DESC,
                             c.cell ASC) AS rn
                FROM q CROSS JOIN cents c
            ) WHERE rn <= {nprobe}
        ),
        scored AS (
            SELECT p.query_id, a.vec_id,
                   round(list_dot_product(q.qv, b.v) / (q.qnrm * b.nrm), 6) AS cosine
            FROM probes p
            JOIN assign a USING (cell)
            JOIN q ON q.query_id = p.query_id
            JOIN base b ON b.vec_id = a.vec_id
            WHERE a.vec_id != p.query_id
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
            ) AS rank FROM scored
        ) WHERE rank <= {k}
    """
