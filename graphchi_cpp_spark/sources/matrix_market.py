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
    an ordering dependency. Uses the md5-derived cross-engine hash so a
    DuckDB oracle reproduces the exact same folds (``kfold_bucket_sql``).
    """
    cond = kfold_bucket(k) != fold if training else kfold_bucket(k) == fold
    return ratings.filter(cond)


def kfold_bucket(k: int):
    """Fold bucket expression over (user, item) — cross-engine stable."""
    from graphchi_cpp_spark.operators.text import md5_long

    return F.pmod(md5_long(F.concat_ws("_", "user", "item")), F.lit(k))


def kfold_bucket_sql(k: int) -> str:
    """The DuckDB twin of ``kfold_bucket`` (same md5 primitive)."""
    return (
        "(('0x' || substr(md5(concat(\"user\", '_', item)), 1, 15))::BIGINT"
        f" % {k})"
    )


def write_matrix_market_sharded(
    df: DataFrame, dir_path: str, comment: str = ""
) -> None:
    """S8, the SCALE path: rows are formatted and written BY EXECUTORS as
    sorted text part files (the reference's sharded sink analog,
    ``io.hpp:162-249`` streams too — it never materializes the table).
    The driver computes only three scalars for the size header and writes
    a tiny ``header`` file next to the parts. Global order: orderBy
    range-partitions, so lexicographic part order == row order."""
    mx = df.agg(
        F.max("user").alias("mu"),
        F.max("item").alias("mi"),
        F.count("*").alias("nnz"),
    ).collect()[0]
    (
        df.orderBy("user", "item")
        .select(
            F.format_string(
                "%d %d %s",
                F.col("user") + 1,
                F.col("item") + 1,
                F.col("rating").cast("string"),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(f"{dir_path}/body")
    )
    header = "%%MatrixMarket matrix coordinate real general\n"
    if comment:
        header += f"% {comment}\n"
    header += f"{mx['mu'] + 1} {mx['mi'] + 1} {mx['nnz']}\n"
    with open(f"{dir_path}/header", "w") as f:
        f.write(header)


def write_matrix_market(df: DataFrame, path: str, comment: str = "") -> None:
    """S8: ONE Matrix Market coordinate file. Rows are formatted and
    sorted on executors (write_matrix_market_sharded); the driver then
    stream-concatenates the part FILES — it handles bytes, never rows
    (the r1-flagged full collect is gone)."""
    import glob
    import shutil

    tmp = path + ".mmparts"
    write_matrix_market_sharded(df, tmp, comment)
    with open(path, "w") as out:
        with open(f"{tmp}/header") as hf:
            shutil.copyfileobj(hf, out)
        for part in sorted(glob.glob(f"{tmp}/body/part-*")):
            with open(part) as pf:
                shutil.copyfileobj(pf, out)
    shutil.rmtree(tmp)


def write_factors_mm(factors: DataFrame, path: str, id_col: str) -> None:
    """S8: factor matrix (id, factors array<double>) → MM-style rows
    (reference MMOutputter_mat). Executor-side formatting + driver
    byte-stream assembly, same pattern as write_matrix_market."""
    import glob
    import shutil

    stats = factors.agg(
        F.count("*").alias("n"),
        F.max(F.size("factors")).alias("d"),
    ).collect()[0]
    tmp = path + ".mmparts"
    (
        factors.orderBy(id_col)
        .select(
            F.concat_ws(
                " ",
                F.col(id_col).cast("string"),
                F.array_join(F.transform("factors", lambda x: x.cast("string")), " "),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(tmp)
    )
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n")
        f.write(f"{stats['n']} {stats['d'] or 0}\n")
        for part in sorted(glob.glob(f"{tmp}/part-*")):
            with open(part) as pf:
                shutil.copyfileobj(pf, f)
    shutil.rmtree(tmp)
