"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shapes, UDF
signatures) is real and tested; the actual codec work is STUBBED — the
container has no image/audio libraries — behind ``decode_image`` /
``decode_audio`` raising ``NotImplementedError``, with a deterministic
fake feature extractor so the distributed pipeline is exercisable
end-to-end.

Pattern: ``mapInPandas`` over a media table; each Arrow batch carries the
binary column, Python processes bytes batch-wise, output schema is fixed
(feature vector + metadata). At 100 TB: partition by content-size bucket
so batches have uniform decode cost; never collect binaries to the driver.
"""

from __future__ import annotations

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
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: real implementation needs an image codec (PIL/cv2), absent in
    this environment. The Spark plumbing around it is real."""
    raise NotImplementedError("image decoding requires an image codec library")


def decode_audio(payload: bytes) -> "np.ndarray":
    """STUB: real implementation needs an audio codec (soundfile/ffmpeg)."""
    raise NotImplementedError("audio decoding requires an audio codec library")


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature extractor: hash-seeded unit vector.
    Lets the distributed pipeline (batching, schema, downstream ANN) be
    tested without codecs."""
    seed = int.from_bytes(blake2b(payload, digest_size=8).digest(), "big")
    v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature[dim]).

    ``mapInPandas``: one Python worker pass, Arrow both ways; binaries
    never leave the executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [fake_feature(bytes(p)).tolist() for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (decode stubbed). Shows the explode-then-process shape:
    sampling fan-out happens JVM-side before any Python touches bytes."""
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
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m{i:05d}", kind, bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(1000, 10000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
