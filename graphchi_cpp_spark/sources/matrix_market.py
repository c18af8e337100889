"""Matrix Market reader/writers (S7/S8) for the CF toolkit.

Reference: ``toolkits/collaborative_filtering/io.hpp`` — banner + size
header parsing ``:53-97``, ``convert_matrixmarket4`` (``row col [time]
val`` entries) ``:252-368``, k-fold cross-validation edge filter
``decide_if_edge_is_active`` ``:144-159``, MM writers for factor
matrices/vectors/scalars ``:162-249``.

Format: '%%MatrixMarket ...' banner, '%' comments, one ``rows cols nnz``
size line, then entries. Users are 1-based rows, items 1-based cols in
the file; emitted 0-based (user, item, rating[, ts]) like the reference's
internal ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_matrix_market(
    spark: SparkSession, path: str, has_time: bool = False
) -> DataFrame:
    """S7 → (user, item, rating[, ts]) with 0-based ids."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("%"))
    lines = lines.filter(F.trim("value") != "")
    parts = F.split(F.trim("value"), r"\s+")
    # the size line is the unique 3-field line whose nnz equals row count-1;
    # robust approach: drop the FIRST non-comment line (the size header)
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    body = (
        lines.withColumn("_ln", F.row_number().over(w)).filter(F.col("_ln") > 1).drop("_ln")
    )
    if has_time:
        return body.select(
            (F.split(F.trim("value"), r"\s+").getItem(0).cast("long") - 1).alias("user"),
            (F.split(F.trim("value"), r"\s+").getItem(1).cast("long") - 1).alias("item"),
            F.split(F.trim("value"), r"\s+").getItem(2).cast("double").alias("ts"),
            F.split(F.trim("value"), r"\s+").getItem(3).cast("double").alias("rating"),
        )
    return body.select(
        (parts.getItem(0).cast("long") - 1).alias("user"),
        (parts.getItem(1).cast("long") - 1).alias("item"),
        parts.getItem(2).cast("double").alias("rating"),
    )


def kfold_split(
    ratings: DataFrame, k: int, fold: int, training: bool = True
) -> DataFrame:
    """K-fold CV filter (S7's ``decide_if_edge_is_active``): fold
    membership by deterministic hash of (user, item) — the reference uses
    sequential edge index; hashing gives the same marginal split without
    an ordering dependency."""
    bucket = F.pmod(F.xxhash64("user", "item"), F.lit(k))
    cond = bucket != fold if training else bucket == fold
    return ratings.filter(cond)


def write_matrix_market(df: DataFrame, path: str, comment: str = "") -> None:
    """S8: write (user, item, rating) as ONE Matrix Market coordinate
    file — driver-side, like the reference's stdio writers (MM is an
    interchange format; at scale persist parquet and export MM only for
    hand-off). Deterministic row order (sorted by user, item)."""
    n_rows = df.agg(F.max("user")).collect()[0][0] + 1
    n_cols = df.agg(F.max("item")).collect()[0][0] + 1
    rows = df.select("user", "item", "rating").orderBy("user", "item").collect()
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            f.write(f"% {comment}\n")
        f.write(f"{n_rows} {n_cols} {len(rows)}\n")
        for r in rows:
            f.write(f"{r['user'] + 1} {r['item'] + 1} {r['rating']}\n")


def write_factors_mm(factors: DataFrame, path: str, id_col: str) -> None:
    """S8: factor matrix (id, factors array<double>) → MM-style rows,
    driver-side single file (reference MMOutputter_mat)."""
    rows = factors.select(id_col, "factors").orderBy(id_col).collect()
    d = len(rows[0]["factors"]) if rows else 0
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n")
        f.write(f"{len(rows)} {d}\n")
        for r in rows:
            f.write(f"{r[id_col]} " + " ".join(str(x) for x in r["factors"]) + "\n")
