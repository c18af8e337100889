"""Specialized text parsers (the reference's ``toolkits/parsers``) —
domain formats re-expressed as declarative Spark text pipelines.

- ``parse_cdr`` — call-detail records (``toolkits/parsers/cdr.cpp:85``):
  ``YYYY-MM-DD HH:MM:SS \\t from \\t to \\t calls \\t duration`` lines →
  a weighted phone-call edge table with parsed event time.
- ``parse_twitter`` — the SNAP-style tweet stream
  (``toolkits/parsers/twitter.cpp:133-215``): stateful ``T``/``U``/``W``
  line triples become a relational carry-forward (``last_value`` over
  the in-file line order), @mentions and ``RT user`` tokens become
  edges, usernames are normalized exactly like ``assign_id``
  (lowercase, ``@`` stripped, rejected if empty, >15 chars, or
  containing ``/``/``:``) and dictionary-encoded via ``densify_ids``.
- ``parse_delimited_with_header`` — header-titled delimited files
  (``toolkits/parsers/nbayes.cpp:70-90``): first line names columns,
  remaining lines split into them; feed the result to ``cf.fm
  .featurize`` for the reference's string→id dictionary encoding.

All three consume a lines DataFrame from ``spark.read.text`` (columns
``value`` and, via ``input_file_name``/``zipWithIndex`` helpers below,
a stable in-file order) — executors parse, nothing funnels through the
driver, which is the scale contract the reference's per-file fork/join
parser pool approximates on one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphchi_cpp_spark.sources.readers import densify_ids


def _with_line_order(lines: DataFrame) -> DataFrame:
    """(file, idx, value): a stable per-file line order. Text splits
    preserve order within a partition; a single text file maps to
    offset-ordered partitions, so monotonically_increasing_id preserves
    in-file line order (its partition-major layout)."""
    return lines.select(
        F.input_file_name().alias("file"),
        F.monotonically_increasing_id().alias("idx"),
        "value",
    )


def parse_cdr(lines: DataFrame) -> DataFrame:
    """CDR lines → (ts, day, src, dst, calls, duration_s). Malformed
    lines are dropped (the reference logs and skips)."""
    parts = F.split(F.col("value"), "\t")
    # try_* forms: ANSI mode would otherwise fail the whole job on one
    # malformed line — the reference logs-and-skips, so NULL-and-filter
    out = lines.select(
        F.try_to_timestamp(F.element_at(parts, 1)).alias("ts"),
        F.element_at(parts, 2).try_cast("long").alias("src"),
        F.element_at(parts, 3).try_cast("long").alias("dst"),
        F.element_at(parts, 4).try_cast("long").alias("calls"),
        F.element_at(parts, 5).try_cast("long").alias("duration_s"),
    ).filter(
        F.col("ts").isNotNull()
        & F.col("src").isNotNull()
        & F.col("dst").isNotNull()
    )
    return out.select(
        "ts", F.to_date("ts").alias("day"), "src", "dst", "calls", "duration_s"
    )


def _norm_user(col):
    """``assign_id``'s normalization: lowercase, strip ``@``; NULL for
    names that are empty, longer than 15 chars, or contain ``/``/``:``."""
    c = F.lower(F.replace(col, F.lit("@"), F.lit("")))
    bad = (
        (F.length(c) == 0) | (F.length(c) > 15) | c.contains("/") | c.contains(":")
    )
    return F.when(~bad, c)


def parse_twitter(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """SNAP tweet stream → (edges(src, dst, ts, weight=1), mapping).

    Record shape (twitter.cpp's per-line state machine):
        T  2009-06-01 00:00:00
        U  http://twitter.com/xlamp
        W  @someone I agree ... RT @other ...
    The T/U state carried across lines becomes ``last(...,
    ignorenulls)`` over the in-file line order; each W line emits one
    edge per valid @mention. Ids are densified (string2nodeid)."""
    src = _with_line_order(lines)
    tag = F.substring("value", 1, 1)
    marked = src.select(
        "file",
        "idx",
        F.when(
            tag == "T",
            F.try_to_timestamp(F.trim(F.substring("value", 2, 10_000))),
        ).alias("t"),
        F.when(
            tag == "U",
            F.regexp_extract("value", r"twitter\.com/([^/\s]+)\s*$", 1),
        ).alias("u"),
        F.when(tag == "W", F.substring("value", 2, 1_000_000)).alias("w"),
    )
    win = Window.partitionBy("file").orderBy("idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tweets = marked.select(
        F.last("t", ignorenulls=True).over(win).alias("ts"),
        F.last("u", ignorenulls=True).over(win).alias("user"),
        "w",
    ).filter(F.col("w").isNotNull() & F.col("user").isNotNull())
    # mentions: @name tokens plus the token after a leading RT
    mentions = tweets.select(
        "ts",
        _norm_user(F.col("user")).alias("src_name"),
        F.explode(
            F.regexp_extract_all("w", F.lit(r"(?:@|\bRT\s+@?)([A-Za-z0-9_]+)"), 1)
        ).alias("dst_raw"),
    )
    edges = (
        mentions.select(
            "ts",
            "src_name",
            _norm_user(F.col("dst_raw")).alias("dst_name"),
        )
        .filter(F.col("src_name").isNotNull() & F.col("dst_name").isNotNull())
        .select(
            F.col("src_name").alias("src"),
            F.col("dst_name").alias("dst"),
            F.unix_timestamp("ts").alias("ts"),
            F.lit(1).alias("weight"),
        )
    )
    return densify_ids(edges)


def parse_delimited_with_header(
    lines: DataFrame, delimiter: str = ","
) -> DataFrame:
    """nbayes-style header-titled files: the first line of each file
    names the columns; every other line splits into them (as strings —
    ``featurize`` downstream does the dictionary encoding the reference
    performs inline)."""
    src = _with_line_order(lines)
    first = src.groupBy("file").agg(F.min("idx").alias("_h"))
    with_h = src.join(first, "file")
    header_rows = with_h.filter(F.col("idx") == F.col("_h")).select(
        "file", F.col("value").alias("_header")
    )
    titles = [
        t.strip()
        for t in header_rows.limit(1).collect()[0]["_header"].split(delimiter)
    ]
    parts = F.split(F.col("value"), delimiter)
    return (
        with_h.filter(F.col("idx") != F.col("_h"))
        .select(
            *[
                F.trim(F.element_at(parts, i + 1)).alias(t)
                for i, t in enumerate(titles)
            ]
        )
    )
