"""Streaming exact dedup — the training-pipeline dedup operator as a
Structured Streaming stage: content-hash dropDuplicates with
watermark-bounded state, so the dedup can run continuously over an
arriving corpus instead of as a batch pass.

State contract: ``dropDuplicatesWithinWatermark`` keeps one state row
per distinct content hash seen within the watermark horizon, then
expires it — the streaming analog of the batch ``exact_duplicates``
groupBy, with the horizon as the explicit memory bound (a true global
dedup over an unbounded stream would need unbounded state; pick the
horizon to cover the duplication window your ingest actually exhibits,
e.g. re-crawl latency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each distinct text (by md5) within the
    watermark horizon survives; later copies are dropped. Emits
    (doc_id, ts, h) append-mode rows."""
    return (
        stream.select(
            "doc_id", F.col(ts_col).alias("ts"), F.md5(F.col(text_col)).alias("h")
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["h"])
    )
