"""Event-time windowed aggregation over the events stream table.

The reference has NO event-time/windowing surface (SURVEY §2.7 X5) — this
is part of the beyond-reference pipeline set: the same expression works
batch (here, oracle-checkable) and in Structured Streaming
(``readStream`` + ``F.window`` + watermark), since tumbling windows are
deterministic functions of event time.

events.ts arrives as int64 nanoseconds (see session.py nanosAsLong);
window id = floor-division — identical arithmetic in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

US_PER_HOUR = 3_600_000_000


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """(hour_bucket, event_type, n_events, sum_value, avg_value) tumbling
    1-hour windows keyed by event type. Bucketing at µs precision (the
    cross-engine-comparable resolution; see sessionize)."""
    return (
        events.select(
            F.expr(f"(ts div 1000) div {US_PER_HOUR}").alias("hour_bucket"),
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


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions: a new session starts when the gap since the
    previous event exceeds ``gap_minutes`` (classic gaps-and-islands —
    the batch analog of Structured Streaming session windows).
    Returns (user_id, session_id, session_start_ns, n_events)."""
    from pyspark.sql import Window

    # microsecond precision: DuckDB truncates TIMESTAMP_NS to µs on read,
    # so µs is the cross-engine-comparable resolution
    gap_us = gap_minutes * 60 * 1_000_000
    # integer division — ts/1000 in doubles loses ULPs above 2^53
    ev = events.select("user_id", F.expr("ts div 1000").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us")
    prev = F.lag("ts_us").over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(prev.isNull(), 1)
        .when((F.col("ts_us") - prev) > gap_us, 1)
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
                          (PARTITION BY user_id ORDER BY ts) > {gap_us} THEN 1
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
