"""Multimodal column plumbing (north-star set).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs; decode / resize / frame-sample are Arrow-batched pandas UDFs
over ``mapInPandas``. Two REAL pure-python codecs are wired end-to-end —
PPM images (``decode_ppm``, P6 binary + P3 ASCII) and PCM WAV audio
(``decode_wav`` via the stdlib ``wave`` module) — so the pipeline
genuinely parses container → samples → features with no native libs.
Other codecs (JPEG/PNG/MP3: the container has no decoders for them)
fall back to a deterministic byte-level fake, clearly marked in
``_decode_stub``'s dispatch, where a PIL/libav call drops in unchanged.

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


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL pure-python image decoder: binary (P6) and ASCII (P3) PPM →
    float32 array (h, w, 3) in [0, 1]. No native libs required."""
    if not payload[:2] in (b"P6", b"P3"):
        raise ValueError("not a PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    w, h, maxval = (int(t) for t in tokens)
    if payload[:2] == b"P6":
        i += 1  # single whitespace byte after maxval
        dt = np.uint8 if maxval < 256 else ">u2"
        arr = np.frombuffer(payload, dtype=dt, offset=i, count=h * w * 3)
    else:
        arr = np.array(payload[i:].split()[: h * w * 3], dtype=np.int64)
    return (arr.astype(np.float32) / maxval).reshape(h, w, 3)


def encode_ppm(img: np.ndarray, maxval: int = 255) -> bytes:
    """(h, w, 3) floats in [0,1] → binary P6 PPM bytes (test round-trip)."""
    h, w, _ = img.shape
    body = (np.clip(img, 0.0, 1.0) * maxval).round().astype(np.uint8).tobytes()
    return f"P6\n{w} {h}\n{maxval}\n".encode() + body


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL pure-python audio decoder via the stdlib ``wave`` module:
    PCM WAV → float32 mono samples in [-1, 1]."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, width, ch = wf.getnframes(), wf.getsampwidth(), wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {width}")
    return x.reshape(-1, ch).mean(axis=1) if ch > 1 else x


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float mono [-1,1] → 16-bit PCM WAV bytes (test round-trip)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        )
    return buf.getvalue()


def _features_from_signal(x: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature vector from any decoded 1-D signal:
    length-dim resample via linear interpolation."""
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    idx = np.linspace(0.0, len(x) - 1, dim)
    return np.interp(idx, np.arange(len(x)), x).astype(np.float32)


def _decode_stub(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Codec dispatch. REAL decoders handle PPM images (``P6``/``P3``
    magic) and PCM WAV audio (``RIFF....WAVE`` magic) end-to-end — parse
    the container, decode samples/pixels, resample to a length-``dim``
    feature vector. Payloads in any OTHER format fall back to the
    documented deterministic byte-level fake (the container has no
    JPEG/PNG/MP3 libraries; a PIL/libav decoder drops into this dispatch
    unchanged). Raises NotImplementedError for unregistered kinds."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder registered for kind={kind!r}")
    if kind == "image" and payload[:2] in (b"P6", b"P3"):
        return _features_from_signal(decode_ppm(payload).reshape(-1), dim)
    if kind == "audio" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _features_from_signal(decode_wav(payload), dim)
    # fallback: deterministic byte-level fake for undecodable codecs
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
