"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side design (the part that matters at 100 TB): media bytes live in
a ``binary`` column, all decode / feature-extraction happens batch-wise
inside ``mapInPandas`` on the executors (Arrow both ways, binaries never
reach the driver), frame-sampling fan-out is a JVM-side explode BEFORE
any Python touches bytes, and partitioning by content-size bucket keeps
decode cost per task uniform.

Codecs: UNCOMPRESSED formats are decoded for real, in pure numpy —
24-bit BMP images (``decode_image``) and 16-bit PCM WAV audio
(``decode_audio``) — including real feature extraction (grid-pooled
luminance for images, per-band RMS energy for audio) and nearest-
neighbor image resize. Compressed codecs (PNG/JPEG/MP3/MP4) require
external libraries absent from this environment and raise
``NotImplementedError`` with the format named; ``extract_features``
falls back to a deterministic hash feature for those payloads so the
distributed pipeline is still exercisable end to end.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("payload", T.BinaryType(), False),   # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("codec", T.StringType(), False),   # bmp|wav|opaque
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


# ------------------------------------------------------------------ image

def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → uncompressed 24-bit BMP bytes (BITMAPINFOHEADER)."""
    h, w, _ = pixels.shape
    row_pad = (-(w * 3)) % 4
    row_bytes = w * 3 + row_pad
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    # BMP stores bottom-up BGR rows, 4-byte aligned
    bgr = pixels[::-1, :, ::-1]
    rows = []
    pad = b"\x00" * row_pad
    for r in range(h):
        rows.append(bgr[r].tobytes() + pad)
    return header + info + b"".join(rows)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 RGB array.

    Real decode for uncompressed 24-bit BMP (pure numpy/struct).
    Compressed formats (PNG/JPEG/GIF/WebP) need an external codec —
    raised explicitly, not silently faked."""
    if len(payload) >= 2 and payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"BMP variant not supported (bpp={bpp}, compression={compression})")
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) // 4 * 4
        raw = np.frombuffer(payload, dtype=np.uint8,
                            count=row_bytes * h, offset=data_off)
        rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # BGR → RGB
        return (rgb[::-1] if bottom_up else rgb).copy()
    for magic, name in ((b"\x89PNG", "PNG"), (b"\xff\xd8", "JPEG"),
                        (b"GIF8", "GIF"), (b"RIFF", "RIFF-container image")):
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decoding requires an image codec library")
    raise NotImplementedError("unrecognized image format")


def resize_image(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index sampling)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def image_feature(pixels: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Grid-pooled luminance: resize to a 4x4 grid of mean luminance
    values → dim-vector in [0,1]."""
    lum = pixels.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                               dtype=np.float32)
    side = int(np.sqrt(dim))
    h, w = lum.shape
    ys = np.linspace(0, h, side + 1, dtype=int)
    xs = np.linspace(0, w, side + 1, dtype=int)
    out = np.empty(side * side, dtype=np.float32)
    k = 0
    for i in range(side):
        for j in range(side):
            cell = lum[ys[i]:max(ys[i + 1], ys[i] + 1),
                       xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[k] = float(cell.mean()) / 255.0
            k += 1
    return out


# ------------------------------------------------------------------ audio

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio payload → (int16 sample array, sample_rate).

    Real decode for 16-bit PCM WAV (pure struct/numpy). Compressed audio
    (MP3/OGG/AAC) needs an external codec — raised explicitly."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        off = 12
        fmt = None
        while off + 8 <= len(payload):
            chunk, size = struct.unpack_from("<4sI", payload, off)
            body = payload[off + 8: off + 8 + size]
            if chunk == b"fmt ":
                audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                if audio_fmt != 1 or bits != 16:
                    raise NotImplementedError(
                        f"WAV variant not supported (fmt={audio_fmt}, bits={bits})")
                fmt = (channels, rate)
            elif chunk == b"data":
                if fmt is None:
                    raise ValueError("WAV data chunk before fmt chunk")
                channels, rate = fmt
                samples = np.frombuffer(body, dtype="<i2")
                if channels > 1:
                    samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
                return samples, rate
            off += 8 + size + (size & 1)
        raise ValueError("WAV file has no data chunk")
    for magic, name in ((b"ID3", "MP3"), (b"\xff\xfb", "MP3"),
                        (b"OggS", "OGG")):
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decoding requires an audio codec library")
    raise NotImplementedError("unrecognized audio format")


def audio_feature(samples: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Per-band RMS energy over ``dim`` equal time slices, normalized."""
    if len(samples) == 0:
        return np.zeros(dim, dtype=np.float32)
    x = samples.astype(np.float32) / 32768.0
    bounds = np.linspace(0, len(x), dim + 1, dtype=int)
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        seg = x[bounds[i]:max(bounds[i + 1], bounds[i] + 1)]
        out[i] = float(np.sqrt(np.mean(seg * seg)))
    return out


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic hash feature for payloads with no supported codec —
    keeps the distributed pipeline total over arbitrary bytes."""
    seed = int.from_bytes(blake2b(payload, digest_size=8).digest(), "big")
    v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def payload_feature(payload: bytes, kind: str) -> tuple[str, np.ndarray]:
    """(codec, feature) for one payload: real decode when supported."""
    try:
        if kind == "image":
            return "bmp", image_feature(decode_image(payload))
        if kind == "audio":
            samples, _ = decode_audio(payload)
            return "wav", audio_feature(samples)
    except NotImplementedError:
        pass
    return "opaque", fake_feature(payload)


# ------------------------------------------------------------ distributed

def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media table → (media_id, kind, n_bytes, codec, feature[dim]).

    ``mapInPandas``: one Python worker pass, Arrow both ways; binaries
    never leave the executors. ``codec`` records whether the real decode
    path ran (bmp/wav) or the payload fell back to the hash feature.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            codecs, feats = [], []
            for p, k in zip(b["payload"], b["kind"]):
                codec, v = payload_feature(bytes(p), k)
                codecs.append(codec)
                feats.append(v.tolist())
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(len).astype("int64"),
                    "codec": codecs,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (video containers need external codecs). Shows the
    explode-then-process shape: sampling fan-out happens JVM-side before
    any Python touches bytes."""
    from pyspark.sql import functions as F

    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                                 F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL BMP payloads for images, REAL PCM
    WAV payloads for audio, opaque bytes for video (codec-less)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, mime = encode_bmp(pixels), "image/bmp"
            width, height, dur = w, h, None
        elif kind == "audio":
            n_samp = int(rng.integers(1600, 16000))
            samples = (np.sin(np.arange(n_samp) * float(rng.uniform(0.01, 0.3)))
                       * 20000).astype(np.int16)
            payload, mime = encode_wav(samples), "audio/wav"
            width = height = None
            dur = int(n_samp * 1000 / 16000)
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                   dtype=np.uint8).tobytes()
            mime, width, height = "video/mp4", None, None
            dur = int(rng.integers(1000, 10000))
        rows.append((f"m{i:05d}", kind, bytearray(payload), mime,
                     width, height, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
