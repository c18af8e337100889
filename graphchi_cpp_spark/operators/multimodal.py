"""Multimodal column plumbing (north-star set).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs; decode / resize / frame-sample are Arrow-batched pandas UDFs
over ``mapInPandas``. The container has no image/audio libraries, so the
actual codec step is STUBBED (deterministic fake features, clearly
marked) — the Spark-side plumbing (schema, batching, partition sizing,
UDF signatures) is real and tested, which is what matters at scale: a
real decoder drops into ``_decode_stub`` unchanged.

Scale notes: binary payloads make rows heavy — keep
``spark.sql.files.maxPartitionBytes`` small for such tables and let
mapInPandas stream Arrow batches (constant memory per batch, no
collect); feature outputs are narrow and shuffle-friendly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 31 + j * 7) % 251) for j in range(64 + (i % 5) * 16))
        rows.append((i, kind, payload, 640, 480, 1000 * (i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """STUB decoder: a real implementation would decode the codec
    (PIL/libav/...) and run feature extraction. Here: deterministic
    bytes→float features so the distributed plumbing is testable.
    Raise NotImplementedError for kinds a deployment hasn't wired up.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder registered for kind={kind!r}")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(dim / max(len(arr), 1)))
    return np.tile(arr, reps)[:dim] / 255.0


def extract_features(media: DataFrame, dim: int = 16, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: streams Arrow batches, one output
    row per media row: (media_id, kind, n_bytes, feature[dim])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, dim).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling plan: one row per sampled timestamp (the
    decode of each frame is the stub). Pure relational explode — shows
    the 1→N row fanout pattern without Python."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Image resize: mapInPandas over image rows, emitting the resized
    payload with updated metadata — the training-pipeline normalize-
    resolution step. The codec is the documented stub (deterministic
    np.interp byte resample to exactly width·height bytes); a real
    PIL/opencv decode-resize-encode drops into the same loop unchanged.
    Output schema matches MEDIA_SCHEMA so resized tables compose with
    every other media operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.float32)
                if len(arr) == 0:
                    # empty payload: np.interp raises on an empty xp; emit
                    # a zero image of the target size instead of failing
                    # the whole mapInPandas task on one corrupt row
                    payloads.append(bytes(n))
                    continue
                idx = np.linspace(0.0, max(len(arr) - 1, 0), n)
                payloads.append(
                    np.interp(idx, np.arange(len(arr)), arr)
                    .astype(np.uint8)
                    .tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation: per kind, count / bytes / dimensions."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).cast("long").alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
