"""Graph file readers (S1-S6) + id densification (S14) + relabel (S11).

Reference parsers (``src/preprocessing/conversions.hpp``):
- S1 edge list ``src dst [value]`` (tab/comma/space, '#'/'%' comments,
  self-edges dropped): ``:211-288``
- S2 adjacency list ``vertex n nb1 … nbn``: ``:297-347``
- S3 METIS (header ``n m``, line i = neighbors of vertex i): ``:381-440``
- S4 Cassovary: ``vertex n`` then n destination lines: ``:447-516``
- S6 multi-value edges ``src dst v1:v2:…`` → array column: ``:122-142``
- S14 id densification (string/IP → consecutive ints):
  ``toolkits/parsers/consecutive_matrix_market.cpp``, ``ips2ids.cpp``
- S11 degree-ordered relabel: ``src/preprocessing/util/orderbydegree.hpp``

All readers return an edges DataFrame (src long, dst long[, weight
double | values array<double>]). Parsing is pure column expressions over
``spark.read.text``/``csv`` — splittable, predicate-pushdown-friendly,
no Python row loops. The reference's sharder (S9) itself intentionally
has no port: Parquet + shuffle partitioning replaces it (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = r"[\s,]+",
    comment_prefixes: tuple[str, ...] = ("#", "%"),
    has_value: bool = False,
    drop_self_loops: bool = True,
) -> DataFrame:
    """S1: ``src dst [value]`` text → (src, dst[, weight])."""
    lines = spark.read.text(path)
    for p in comment_prefixes:
        lines = lines.filter(~F.col("value").startswith(p))
    lines = lines.filter(F.trim("value") != "")
    parts = F.split(F.trim("value"), sep)
    out = lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
        *( [parts.getItem(2).cast("double").alias("weight")] if has_value else [] ),
    )
    if drop_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    return out


def read_multi_value_edge_list(
    spark: SparkSession, path: str, sep: str = r"\s+", value_sep: str = ":"
) -> DataFrame:
    """S6: ``src dst v1:v2:…`` → (src, dst, values array<double>)."""
    lines = spark.read.text(path).filter(F.trim("value") != "")
    parts = F.split(F.trim("value"), sep)
    return lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
        F.transform(
            F.split(parts.getItem(2), value_sep), lambda v: v.cast("double")
        ).alias("values"),
    )


def read_adjacency_list(spark: SparkSession, path: str) -> DataFrame:
    """S2: ``vertex n nb1 … nbn`` → (src, dst)."""
    lines = spark.read.text(path).filter(F.trim("value") != "")
    parts = F.split(F.trim("value"), r"\s+")
    return (
        lines.select(
            parts.getItem(0).cast("long").alias("src"),
            F.slice(parts, 3, 1_000_000_000).alias("nbrs"),
        )
        .select("src", F.explode("nbrs").alias("d"))
        .select("src", F.col("d").cast("long").alias("dst"))
    )


def read_metis(spark: SparkSession, path: str) -> DataFrame:
    """S3: METIS — first line ``n m [fmt]``, line i (1-based) lists the
    neighbors of vertex i. Line numbers must be recovered, which is a
    sequential notion: zipWithIndex equivalent via a window over a
    monotonic file+offset key (single text file assumed, as in the
    reference converter)."""
    lines = (
        spark.read.text(path)
        .select("value", F.monotonically_increasing_id().alias("_mid"))
        .withColumn("_ln", F.row_number().over(Window.orderBy("_mid")))
    )
    body = lines.filter(F.col("_ln") > 1).filter(F.trim("value") != "")
    return (
        body.select((F.col("_ln") - 1).cast("long").alias("src"),
                    F.split(F.trim("value"), r"\s+").alias("nbrs"))
        .select("src", F.explode("nbrs").alias("d"))
        .filter(F.col("d") != "")
        .select("src", F.col("d").cast("long").alias("dst"))
    )


def read_cassovary(spark: SparkSession, path: str) -> DataFrame:
    """S4: ``vertex n`` header rows followed by n destination rows.
    Sequential-format recovery: tag each row with its line number, assign
    each destination row to the nearest preceding header row (last_value
    over an ordered window) — the relational phrasing of the reference's
    stateful line scanner."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("v"), F.monotonically_increasing_id().alias("_mid"))
        .withColumn("_ln", F.row_number().over(Window.orderBy("_mid")))
        .filter(F.col("v") != "")
    )
    parts = F.split(F.col("v"), r"\s+")
    tagged = lines.select(
        "_ln",
        F.when(F.size(parts) >= 2, parts.getItem(0).cast("long")).alias("hdr_src"),
        F.when(F.size(parts) == 1, parts.getItem(0).cast("long")).alias("dst"),
    )
    w = Window.orderBy("_ln").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tagged.withColumn("src", F.last("hdr_src", ignorenulls=True).over(w))
        .filter(F.col("dst").isNotNull())
        .select("src", "dst")
    )


# --------------------------------------------------------------------- #
# id densification + degree relabel
# --------------------------------------------------------------------- #
def read_binary_edge_list(
    spark: SparkSession,
    path: str,
    value_format: str | None = None,
) -> DataFrame:
    """S5: raw binary edge records, possibly across many files
    (``src/preprocessing/conversions.hpp:523-602`` — ``(uint32 src,
    uint32 dst[, value])`` little-endian, concatenated).

    ``value_format``: None (8-byte records), ``'f4'``/``'f8'``/``'i4'``
    (numpy dtype codes for the trailing value field).

    Spark-first shape: ``binaryFile`` yields one row per file; a
    ``mapInPandas`` decode turns each file's bytes into edge rows with
    numpy ``frombuffer`` (vectorized, no per-record Python). Parallelism
    is per file — matching the reference's multi-file convention; shard
    large datasets across files for more tasks.
    """
    import numpy as np
    import pandas as pd

    has_value = value_format is not None
    if has_value:
        dtype = np.dtype(
            [("src", "<u4"), ("dst", "<u4"), ("val", f"<{value_format}")]
        )
        schema = "src long, dst long, weight double"
    else:
        dtype = np.dtype([("src", "<u4"), ("dst", "<u4")])
        schema = "src long, dst long"

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                n, extra = divmod(len(content), dtype.itemsize)
                if extra:
                    raise ValueError(
                        f"binary edge file length {len(content)} is not a "
                        f"multiple of the {dtype.itemsize}-byte record "
                        f"({extra} trailing bytes — wrong value_format or "
                        "corrupt file)"
                    )
                rec = np.frombuffer(content, dtype=dtype, count=n)
                out = {
                    "src": rec["src"].astype("int64"),
                    "dst": rec["dst"].astype("int64"),
                }
                if has_value:
                    out["weight"] = rec["val"].astype("float64")
                yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema)


def densify_ids(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> tuple[DataFrame, DataFrame]:
    """S14: arbitrary (string or sparse-int) ids → dense 0..V-1 longs.
    Returns (relabeled_edges, mapping(orig, dense_id)). Deterministic:
    dense ids follow sort order of the original ids."""
    ids = (
        edges.select(F.col(src_col).alias("orig"))
        .unionByName(edges.select(F.col(dst_col).alias("orig")))
        .distinct()
    )
    mapping = ids.withColumn(
        "dense_id", F.row_number().over(Window.orderBy("orig")).cast("long") - 1
    )
    others = [c for c in edges.columns if c not in (src_col, dst_col)]
    out = (
        edges.join(
            mapping.select(F.col("orig").alias(src_col), F.col("dense_id").alias("_s")),
            src_col,
        )
        .join(
            mapping.select(F.col("orig").alias(dst_col), F.col("dense_id").alias("_d")),
            dst_col,
        )
        .select(F.col("_s").alias("src"), F.col("_d").alias("dst"), *others)
    )
    return out, mapping


def relabel_by_degree(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S11: renumber vertices by ascending undirected degree (ties by id)
    — the triangle-counting prerequisite (``orderbydegree.hpp``)."""
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    mapping = deg.withColumn(
        "new_id",
        F.row_number().over(Window.orderBy("d", "id")).cast("long") - 1,
    ).select("id", "new_id")
    out = (
        edges.join(mapping.select(F.col("id").alias("src"), F.col("new_id").alias("_s")), "src")
        .join(mapping.select(F.col("id").alias("dst"), F.col("new_id").alias("_d")), "dst")
        .select(F.col("_s").alias("src"), F.col("_d").alias("dst"))
    )
    return out, mapping
