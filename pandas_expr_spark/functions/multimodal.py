"""Multimodal (image/audio/video) column support.

Media are opaque ``binary`` columns + typed metadata structs; every transform
is an Arrow-batched ``mapInPandas`` over the binary payloads so the heavy
bytes never leave the executors and never cross to the driver.

The actual codec calls (PIL/librosa/ffmpeg) are NOT available in this
container, so the decode kernels are STUBBED: ``decode_stub="fake"`` yields a
deterministic fake decode (so the Spark-side plumbing — schema, batching,
partitioning — is fully testable end-to-end); ``decode_stub="raise"``
raises ``NotImplementedError`` marking the integration point.

Scale design: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` moderate, never ``collect()`` them, and
carry metadata in separate cheap columns so filters/pushdowns (e.g. "only
JPEGs wider than 512px") prune *before* decode.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame as SparkDF, functions as F
from pyspark.sql import types as T

__all__ = ["image_meta_schema", "attach_media_meta", "decode_image_features",
           "resize_images", "sample_video_frames", "audio_features",
           "parse_image_header", "parse_wav_header", "image_header_meta",
           "wav_header_meta"]

IMAGE_FEATURE_DIM = 16


def image_meta_schema() -> T.StructType:
    return T.StructType([
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ])


def attach_media_meta(sdf: SparkDF, binary_col: str = "payload") -> SparkDF:
    """Cheap JVM-side metadata: byte length + magic-byte format sniffing.
    These columns are filterable WITHOUT decoding — the pruning layer."""
    b = F.col(binary_col)
    magic = F.hex(F.substring(b, 1, 4))
    fmt = (F.when(magic.startswith("FFD8"), "jpeg")
           .when(magic.startswith("89504E47"), "png")
           .when(magic.startswith("52494646"), "riff")
           .otherwise("unknown"))
    return (sdf.withColumn("media_format", fmt)
            .withColumn("media_n_bytes", F.length(b).cast("long")))


def _fake_decode(payload: bytes, dim: int = IMAGE_FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature vector from the payload hash — stands in
    for a real decode+CNN-embed kernel so plumbing is testable."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def decode_image_features(sdf: SparkDF, binary_col: str = "payload",
                          id_col: str = "media_id",
                          decode_stub: str = "fake") -> SparkDF:
    """binary → feature array<float>.  Real implementation would decode with
    PIL and run a vision embedder per Arrow batch; the batch shape, schema and
    partition behavior here are exactly what that code would use."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "image decode requires PIL/torch — not in this container")
            feats = [_fake_decode(p).tolist() for p in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return sdf.select(id_col, binary_col).mapInPandas(mapper, schema)


def resize_images(sdf: SparkDF, width: int, height: int,
                  binary_col: str = "payload", id_col: str = "media_id",
                  decode_stub: str = "fake") -> SparkDF:
    """binary → resized binary.  Stub emits a deterministic truncated/padded
    payload of width*height bytes standing in for the resized encoding."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("image resize requires PIL")
            out = [(bytes(p) * (target // max(len(p), 1) + 1))[:target]
                   for p in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out,
                                "width": width, "height": height})

    return sdf.select(id_col, binary_col).mapInPandas(mapper, schema)


def sample_video_frames(sdf: SparkDF, every_n: int = 30,
                        binary_col: str = "payload", id_col: str = "media_id",
                        decode_stub: str = "fake") -> SparkDF:
    """binary video → exploded (frame_idx, frame binary) rows.  Stub slices
    the payload into fixed-size chunks as fake frames."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("video decode requires ffmpeg")
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[binary_col]):
                p = bytes(p)
                chunks = [p[i:i + 64] for i in range(0, len(p), 64)]
                for fi, ch in enumerate(chunks[::every_n] or [b""]):
                    ids.append(mid); idxs.append(fi); frames.append(ch)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return sdf.select(id_col, binary_col).mapInPandas(mapper, schema)


def audio_features(sdf: SparkDF, binary_col: str = "payload",
                   id_col: str = "media_id",
                   decode_stub: str = "fake") -> SparkDF:
    """binary audio → (duration_s, rms) stub features."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("audio decode requires librosa/soundfile")
            durs = [len(bytes(p)) / 16000.0 for p in pdf[binary_col]]
            rms = [float(np.sqrt(np.mean(np.frombuffer(bytes(p), dtype=np.uint8)
                                         .astype(np.float64) ** 2)))
                   if len(bytes(p)) else 0.0 for p in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "duration_s": durs, "rms": rms})

    return sdf.select(id_col, binary_col).mapInPandas(mapper, schema)


# ---------------------------------------------------------------------------
# REAL header parsing — pure-stdlib ``struct``, no codec libraries needed.
# Dimensions / sample rates live in fixed-offset container headers, so
# "how big is this image" and "how long is this clip" are answerable at
# 100 TB WITHOUT decoding pixels: an Arrow-batched pandas_udf reads a few
# dozen bytes per row.  (Pixel/spectrogram decode remains the stubbed
# PIL/librosa integration point above.)
# ---------------------------------------------------------------------------
def parse_image_header(payload: bytes) -> tuple[str | None, int, int]:
    """(format, width, height) from PNG / GIF / BMP / JPEG headers."""
    import struct
    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", w, abs(h)
    if b[:2] == b"\xff\xd8":  # JPEG: scan for a SOFn marker
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", w, h
            seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
            i += 2 + seglen
        return "jpeg", 0, 0
    return None, 0, 0


def parse_wav_header(payload: bytes) -> tuple[int, int, float]:
    """(sample_rate, channels, duration_s) from a RIFF/WAVE header."""
    import struct
    b = payload or b""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return 0, 0, 0.0
    i = 12
    rate, channels, byte_rate, data_len = 0, 0, 0, 0
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        clen = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate, byte_rate = struct.unpack("<HII", b[i + 10:i + 20])
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen % 2)
    dur = (data_len / byte_rate) if byte_rate else 0.0
    return rate, channels, dur


def image_header_meta(sdf: SparkDF, binary_col: str = "payload") -> SparkDF:
    """Real (format, width, height) columns via header parsing — Arrow
    pandas_udf, a few bytes read per row, no codec dependency."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StructType([
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType())]))
    def _hdr(s: pd.Series) -> pd.DataFrame:
        rows = [parse_image_header(v) for v in s]
        return pd.DataFrame(rows, columns=["fmt", "width", "height"])

    out = sdf.withColumn("__h__", _hdr(F.col(binary_col)))
    return (out.withColumn("img_format", F.col("__h__.fmt"))
            .withColumn("img_width", F.col("__h__.width"))
            .withColumn("img_height", F.col("__h__.height"))
            .drop("__h__"))


def wav_header_meta(sdf: SparkDF, binary_col: str = "payload") -> SparkDF:
    """Real (sample_rate, channels, duration_s) via RIFF header parsing."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StructType([
        T.StructField("rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("dur", T.DoubleType())]))
    def _hdr(s: pd.Series) -> pd.DataFrame:
        rows = [parse_wav_header(v) for v in s]
        return pd.DataFrame(rows, columns=["rate", "channels", "dur"])

    out = sdf.withColumn("__h__", _hdr(F.col(binary_col)))
    return (out.withColumn("sample_rate", F.col("__h__.rate"))
            .withColumn("channels", F.col("__h__.channels"))
            .withColumn("duration_s", F.col("__h__.dur"))
            .drop("__h__"))
