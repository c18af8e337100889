"""Multimodal column plumbing (north-star set).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs; decode / resize / frame-sample are Arrow-batched pandas UDFs
over ``mapInPandas``. Three REAL pure-python codecs are wired
end-to-end — PPM images (``decode_ppm``, P6 binary + P3 ASCII), PNG
images (``decode_png``: stdlib ``zlib`` inflate + all five scanline
filters, 8-bit grey/grey-alpha/RGB/RGBA/palette), and PCM WAV audio
(``decode_wav`` via the stdlib ``wave`` module) — so the pipeline
genuinely parses container → samples → features with no native libs.
Other codecs (JPEG/MP3: the container has no decoders for them) fall
back to a deterministic byte-level fake, clearly marked in
``_decode_stub``'s dispatch, where a PIL/libav call drops in unchanged.

Scale notes: binary payloads make rows heavy — keep
``spark.sql.files.maxPartitionBytes`` small for such tables and let
mapInPandas stream Arrow batches (constant memory per batch, no
collect); feature outputs are narrow and shuffle-friendly.
"""

from __future__ import annotations

import struct
import zlib
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


def synthetic_png_media(spark, n: int = 100, h: int = 4, w: int = 3) -> DataFrame:
    """Media table whose payloads are REAL PNGs of formula-deterministic
    RGB pixels — byte k of image i is ``(i*31 + k*7) % 251`` — so an
    external oracle can recompute the decoded pixel sums exactly without
    a PNG library."""
    rows = []
    k = np.arange(h * w * 3, dtype=np.int64)
    for i in range(n):
        pix = ((i * 31 + k * 7) % 251).astype(np.float32) / 255.0
        rows.append(
            (i, "image", encode_png(pix.reshape(h, w, 3)), w, h, 0)
        )
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


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# IHDR color type -> channels per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    i = len(PNG_SIG)
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        yield ctype, payload[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            return


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (spec §6: None/Sub/Up/Average/Paeth).
    Each scanline is 1 filter byte + w*bpp data bytes; reconstruction is
    sequential down rows (Up/Average/Paeth read the prior recon row) and,
    within Sub/Average/Paeth rows, sequential across pixels — vectorized
    per bpp-strided column block so the inner loop is w, not w*bpp."""
    stride = w * bpp
    raw = raw.reshape(h, 1 + stride)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, line = int(filters[y]), rows[y]
        if f > 4:
            raise ValueError(f"bad PNG filter byte {f} on scanline {y}")
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prior) & 0xFF
        else:  # Sub / Average / Paeth need left-reconstructed bytes
            rec = line.reshape(w, bpp).copy()
            pr = prior.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                if f == 1:  # Sub
                    rec[x] = (rec[x] + left) & 0xFF
                elif f == 3:  # Average
                    rec[x] = (rec[x] + ((left + pr[x]) >> 1)) & 0xFF
                else:  # Paeth
                    ul = pr[x - 1] if x else np.zeros(bpp, dtype=np.int32)
                    p = left + pr[x] - ul
                    pa, pb, pc = abs(p - left), abs(p - pr[x]), abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pr[x], ul)
                    )
                    rec[x] = (rec[x] + pred) & 0xFF
                left = rec[x]
            rec = rec.reshape(stride)
        out[y] = rec
        prior = rec
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """REAL pure-python PNG decoder (stdlib ``zlib`` + numpy): 8-bit
    greyscale / grey+alpha / RGB / RGBA / palette, non-interlaced →
    float32 array (h, w, channels) in [0, 1]. Adam7 interlace and
    16-bit depths raise — this covers the PNGs a training pipeline
    normalizes to, without native image libraries."""
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    idat, plte = [], None
    w = h = depth = ctype_code = None
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, ctype_code, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("Adam7-interlaced PNG")
            if ctype_code not in _PNG_CHANNELS:
                raise ValueError(f"bad PNG color type {ctype_code}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _PNG_CHANNELS[ctype_code]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG scanline data length mismatch")
    img = _png_unfilter(raw, h, w, ch).reshape(h, w, ch)
    if ctype_code == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img.astype(np.float32) / 255.0


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, {1,2,3,4}) floats in [0,1] → 8-bit non-interlaced PNG bytes
    (filter 0 rows; test round-trip + sink for resized tables)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype_code = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    body = (np.clip(img, 0.0, 1.0) * 255).round().astype(np.uint8)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), body.reshape(h, w * ch)], axis=1
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_code, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )


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
    magic), PNG images (8-byte PNG signature) and PCM WAV audio
    (``RIFF....WAVE`` magic) end-to-end — parse the container, decode
    samples/pixels, resample to a length-``dim`` feature vector.
    Payloads in any OTHER format fall back to the documented
    deterministic byte-level fake (the container has no JPEG/MP3
    libraries; a PIL/libav decoder drops into this dispatch unchanged).
    Raises NotImplementedError for unregistered kinds."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder registered for kind={kind!r}")
    if kind == "image" and payload[:2] in (b"P6", b"P3"):
        return _features_from_signal(decode_ppm(payload).reshape(-1), dim)
    if kind == "image" and payload[: len(PNG_SIG)] == PNG_SIG:
        return _features_from_signal(decode_png(payload).reshape(-1), dim)
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


def bilinear_resize(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """(h, w, ch) float image → (height, width, ch) by separable bilinear
    interpolation (pure numpy; the standard normalize-resolution kernel)."""
    h, w, _ = img.shape
    ys = np.linspace(0.0, h - 1, height)
    xs = np.linspace(0.0, w - 1, width)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0).astype(np.float32)[:, None, None]
    fx = (xs - x0).astype(np.float32)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Image resize: mapInPandas over image rows, emitting the resized
    payload with updated metadata — the training-pipeline normalize-
    resolution step. Payloads the codecs can decode (PNG / PPM by magic
    bytes) take the REAL path: decode → bilinear resize → re-encode as
    PNG (the normalized output format). Undecodable payloads keep the
    documented deterministic np.interp byte-resample fallback (exactly
    width·height bytes), where a PIL/opencv call drops in unchanged.
    Output schema matches MEDIA_SCHEMA so resized tables compose with
    every other media operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                try:
                    if p[: len(PNG_SIG)] == PNG_SIG:
                        img = decode_png(p)
                    elif p[:2] in (b"P6", b"P3"):
                        img = decode_ppm(p)
                    else:
                        img = None
                except (ValueError, NotImplementedError, zlib.error):
                    img = None
                if img is not None:
                    payloads.append(
                        encode_png(bilinear_resize(img, height, width))
                    )
                    continue
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


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("height", LongType()),
        StructField("width", LongType()),
        StructField("channels", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode every image payload for REAL (PNG or PPM, by magic bytes)
    and emit its true shape plus the exact integer sum of its 8-bit
    pixel values — the decode-audit step of an ingest pipeline (shape
    filters, corrupt-file triage) and an exactly-recomputable contract
    for the correctness gate. Rows whose payload is neither PNG nor PPM
    are passed through with NULL stats rather than failing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "height", "width", "channels", "pixel_sum")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    if p[: len(PNG_SIG)] == PNG_SIG:
                        img = decode_png(p)
                    elif p[:2] in (b"P6", b"P3"):
                        img = decode_ppm(p)
                    else:
                        raise ValueError("no registered image codec")
                except (ValueError, NotImplementedError, zlib.error):
                    for k in ("height", "width", "channels", "pixel_sum"):
                        out[k].append(None)
                    continue
                h, w, ch = img.shape
                out["height"].append(h)
                out["width"].append(w)
                out["channels"].append(ch)
                out["pixel_sum"].append(int((img * 255).round().astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, IMAGE_STATS_SCHEMA
    )


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
