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
- ``parse_texttokens`` / ``count_values`` / ``parse_ips`` /
  ``aggregate_edge_column`` / ``parse_consecutive_longs`` — the rest of
  the parsers toolkit (texttokens/count/ips2ids/aggregator/
  consecutive_longs .cpp): bag-of-words with global-frequency
  thresholds, value histogram over a text source, IPv4→consecutive-id
  edges, per-edge column aggregation, and consecutive relabeling with
  shared or per-side id spaces.

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


# the reference's tokenizer delimiter set (texttokens.cpp:52 /
# aggregator.cpp:71): whitespace plus punctuation, as a regex class
_TOKEN_DELIMS = r"[\s!?@#$%^&*()\-+.,~`'\";:]+"


def parse_texttokens(
    lines: DataFrame,
    min_threshold: int = 1,
    max_threshold: int = 1_234_567_890,
) -> tuple[DataFrame, DataFrame]:
    """texttokens (``toolkits/parsers/texttokens.cpp:54-105``): tokenize
    each line on the punctuation/space delimiter set, drop 1-char
    tokens, dictionary-encode tokens to consecutive ids, and emit the
    per-line bag-of-words. Tokens whose GLOBAL occurrence count falls
    outside [min_threshold, max_threshold] are filtered (the
    reference's stop/rare-word thresholds). Returns
    ((line_id, token_id, count), mapping(orig token, dense_id)).

    Dense ids follow token sort order (the S14 convention) rather than
    first-seen arrival order — arrival order is meaningless under
    parallel parsing."""
    src = _with_line_order(lines).filter(F.length("value") > 1)
    toks = src.select(
        F.col("idx").alias("line_id"),
        F.explode(F.split(F.col("value"), _TOKEN_DELIMS)).alias("token"),
    ).filter(F.length("token") > 1)
    counts = toks.groupBy("line_id", "token").agg(F.count("*").alias("count"))
    totals = (
        counts.groupBy("token")
        .agg(F.sum("count").alias("_tot"))
        .filter(F.col("_tot").between(min_threshold, max_threshold))
    )
    mapping = totals.select(
        F.col("token").alias("orig"),
        (F.row_number().over(Window.orderBy("token")).cast("long") - 1).alias(
            "dense_id"
        ),
    )
    out = counts.join(
        mapping.select(F.col("orig").alias("token"), F.col("dense_id")), "token"
    ).select("line_id", F.col("dense_id").alias("token_id"), "count")
    return out, mapping


def count_values(lines: DataFrame, skip_lines: int = 2) -> DataFrame:
    """count (``toolkits/parsers/count.cpp:51-80``): one integer per
    line, first ``skip_lines`` lines of each file skipped (the MM-ish
    header the reference hardcodes); returns (value, count) — A4 over a
    text source."""
    src = _with_line_order(lines)
    first = src.groupBy("file").agg(F.min("idx").alias("_h"))
    return (
        src.join(first, "file")
        .filter(F.col("idx") >= F.col("_h") + skip_lines)
        .select(F.trim("value").try_cast("long").alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count("*").alias("count"))
    )


_IPV4 = (
    r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
)


def _ip_to_long(col):
    o = F.split(col, r"\.")
    return (
        F.element_at(o, 1).cast("long") * 16777216
        + F.element_at(o, 2).cast("long") * 65536
        + F.element_at(o, 3).cast("long") * 256
        + F.element_at(o, 4).cast("long")
    )


def parse_ips(
    lines: DataFrame, delimiter: str = " "
) -> tuple[DataFrame, DataFrame]:
    """ips2ids (``toolkits/parsers/ips2ids.cpp:54-140``): lines of
    ``caller_ip callee_ip attribute``; rows whose caller/callee fail
    IPv4 validation are skipped (inet_aton semantics), surviving IPs
    are dictionary-encoded to consecutive ids shared across both
    columns. Returns ((src, dst, attribute), mapping(ip, dense_id))."""
    parts = F.split(F.col("value"), delimiter)
    raw = lines.select(
        F.element_at(parts, 1).alias("caller"),
        F.element_at(parts, 2).alias("callee"),
        F.element_at(parts, 3).alias("attribute"),
    ).filter(
        F.col("caller").rlike(_IPV4) & F.col("callee").rlike(_IPV4)
    )
    edges = raw.select(
        _ip_to_long(F.col("caller")).alias("src"),
        _ip_to_long(F.col("callee")).alias("dst"),
        "attribute",
    )
    return densify_ids(edges)


def aggregate_edge_column(lines: DataFrame, col: int = 3) -> DataFrame:
    """aggregator (``toolkits/parsers/aggregator.cpp:76-140``): lines of
    ``from to c3 c4 …`` — sum column ``col`` (1-based, ≥3) over all
    lines sharing (from, to). The reference exploits sorted input to
    aggregate adjacent runs; groupBy gives the same totals without the
    sort precondition. Returns (src, dst, total)."""
    parts = F.split(F.col("value"), _TOKEN_DELIMS)
    return (
        lines.select(
            F.element_at(parts, 1).try_cast("long").alias("src"),
            F.element_at(parts, 2).try_cast("long").alias("dst"),
            F.element_at(parts, col).try_cast("double").alias("_v"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & F.col("_v").isNotNull()
        )
        .groupBy("src", "dst")
        .agg(F.sum("_v").alias("total"))
    )


def parse_consecutive_longs(
    edges: DataFrame, single_domain: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """consecutive_longs (``toolkits/parsers/consecutive_longs.cpp:
    58-134``): arbitrary (string or sparse) src/dst keys → consecutive
    ids. ``single_domain=True`` shares one id space across both columns
    (the reference's flag of the same name); otherwise each side gets
    its own consecutive space (user/item bipartite convention). Returns
    (relabeled_edges, src_mapping, dst_mapping) — identical mappings in
    the single-domain case."""
    if single_domain:
        out, mapping = densify_ids(edges)
        return out, mapping, mapping
    others = [c for c in edges.columns if c not in ("src", "dst")]
    src_map = (
        edges.select(F.col("src").alias("orig"))
        .distinct()
        .withColumn(
            "dense_id",
            F.row_number().over(Window.orderBy("orig")).cast("long") - 1,
        )
    )
    dst_map = (
        edges.select(F.col("dst").alias("orig"))
        .distinct()
        .withColumn(
            "dense_id",
            F.row_number().over(Window.orderBy("orig")).cast("long") - 1,
        )
    )
    out = (
        edges.join(
            src_map.select(F.col("orig").alias("src"), F.col("dense_id").alias("_s")),
            "src",
        )
        .join(
            dst_map.select(F.col("orig").alias("dst"), F.col("dense_id").alias("_d")),
            "dst",
        )
        .select(F.col("_s").alias("src"), F.col("_d").alias("dst"), *others)
    )
    return out, src_map, dst_map


def consecutive_matrix_market(
    spark,
    path: str,
    single_domain: bool = False,
    has_time: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """consecutive_matrix_market (``toolkits/parsers/
    consecutive_matrix_market.cpp:66-180``) as a one-call compose of the
    Matrix Market reader and ``parse_consecutive_longs``: read an MM (or
    MM-headered delimited) file and relabel both id columns into
    consecutive 0-based spaces — per-domain by default, one shared space
    with ``single_domain=True`` (the reference's flag of the same name).
    Returns (edges(src, dst, rating[, ts]), src_mapping, dst_mapping);
    mappings are (orig, dense_id) dictionaries, identical objects in the
    single-domain case."""
    from graphchi_cpp_spark.sources.matrix_market import read_matrix_market

    mm = read_matrix_market(spark, path, has_time=has_time)
    extra = [c for c in mm.columns if c not in ("user", "item")]
    edges = mm.select(
        F.col("user").alias("src"), F.col("item").alias("dst"), *extra
    )
    return parse_consecutive_longs(edges, single_domain=single_domain)
