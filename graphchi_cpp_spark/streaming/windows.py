"""Event-time windowed aggregation over the events stream table.

The reference has NO event-time/windowing surface (SURVEY §2.7 X5) — this
is part of the beyond-reference pipeline set: the same expression works
batch (here, oracle-checkable) and in Structured Streaming
(``readStream`` + ``F.window`` + watermark), since tumbling windows are
deterministic functions of event time.

events.ts has arrived in different physical encodings across testdata
generations (int64 ns via nanosAsLong, parquet timestamp[us] read as
TIMESTAMP / TIMESTAMP_NTZ) — ``ts_us_sql`` below normalizes all of them
to µs-since-epoch so window arithmetic matches DuckDB ``epoch_us(ts)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

US_PER_HOUR = 3_600_000_000


def ts_us_sql(df: DataFrame, col: str = "ts") -> str:
    """SQL expression (string) for ``col`` as µs since epoch, adapted to the
    column's actual type:

    - TIMESTAMP          → ``unix_micros(col)``            (= DuckDB epoch_us)
    - TIMESTAMP_NTZ      → ``unix_micros(cast(col as timestamp))`` — session
      timezone is UTC (session.py), so the naive→instant cast is the identity
      and matches DuckDB ``epoch_us`` over the same naive value
    - int64 (nanosAsLong legacy read of TIMESTAMP(NANOS)) → ``col div 1000``

    Returned as a string, not a Column, so callers can keep integer ``div``
    semantics in composed expressions (no double round-trip)."""
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampType):
        return f"unix_micros({col})"
    if isinstance(dt, TimestampNTZType):
        return f"unix_micros(cast({col} as timestamp))"
    return f"({col} div 1000)"


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """(hour_bucket, event_type, n_events, sum_value, avg_value) tumbling
    1-hour windows keyed by event type. Bucketing at µs precision (the
    cross-engine-comparable resolution; see sessionize)."""
    return (
        events.select(
            F.expr(f"{ts_us_sql(events)} div {US_PER_HOUR}").alias("hour_bucket"),
            "event_type",
            "value",
        )
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def hourly_event_stats_sql() -> str:
    return f"""
        SELECT CAST(epoch_us(ts) // {US_PER_HOUR} AS BIGINT) AS hour_bucket,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               round(avg(value), 4) AS avg_value
        FROM events
        GROUP BY 1, 2
    """


def hourly_event_stats_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Structured Streaming twin of ``hourly_event_stats``: tumbling
    ``F.window`` + watermark for late data, emitting the identical
    (hour_bucket, event_type, n_events, sum_value, avg_value) schema —
    ``window.start`` is epoch-aligned, so ``unix_micros(start) div
    US_PER_HOUR`` equals the batch integer-division bucket exactly.

    ``events`` must carry a timestamp-typed ``ts`` (streams don't go
    through the parquet nanosAsLong legacy path). Works on a static
    DataFrame too (same plan minus the watermark state store).
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            # cast: window.start inherits ts's type, and unix_micros
            # rejects TIMESTAMP_NTZ (session tz is UTC → cast is identity)
            F.expr(
                f"unix_micros(cast(window.start as timestamp)) div {US_PER_HOUR}"
            ).alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize_session_window(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """``sessionize`` via Spark's native ``F.session_window`` — the
    engine-managed merging-session state (streaming-capable with a
    watermark; identical session boundaries to the batch gaps-and-islands
    form, including exact-gap ties — both use half-open semantics where a
    follower at exactly ``prev + gap`` starts a new session).
    Returns (user_id, session_start_us, n_events): session ids are an
    ordinal in the batch variant, so the stable cross-variant key is the
    session start."""
    ts_col = events.schema["ts"].dataType
    src = events
    if not isinstance(ts_col, (TimestampType, TimestampNTZType)):
        src = events.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.expr(
                "unix_micros(cast(session_window.start as timestamp))"
            ).alias("session_start_us"),
            "n_events",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions: a new session starts when the gap since the
    previous event reaches ``gap_minutes`` (classic gaps-and-islands;
    half-open ``>= gap`` boundary to agree bit-exactly with Spark's
    native ``F.session_window`` — [start, start+gap) — even on
    coarse-grained timestamps where exact-gap ties are real).
    Returns (user_id, session_id, session_start_ns, n_events)."""
    from pyspark.sql import Window

    # microsecond precision: DuckDB truncates TIMESTAMP_NS to µs on read,
    # so µs is the cross-engine-comparable resolution
    gap_us = gap_minutes * 60 * 1_000_000
    ev = events.select("user_id", F.expr(ts_us_sql(events)).alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us")
    prev = F.lag("ts_us").over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(prev.isNull(), 1)
        .when((F.col("ts_us") - prev) >= gap_us, 1)
        .otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"), F.count("*").alias("n_events")
    )


def sessionize_sql(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
        WITH marked AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   CASE
                     WHEN lag(epoch_us(ts)) OVER
                          (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
                     WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                          (PARTITION BY user_id ORDER BY ts) >= {gap_us} THEN 1
                     ELSE 0 END AS new_session
            FROM events
        ),
        sess AS (
            SELECT user_id, ts_us,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM marked
        )
        SELECT user_id, session_id,
               min(ts_us) AS session_start_us,
               count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """
