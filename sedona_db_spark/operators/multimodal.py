"""Multimodal (image/audio/video) column plumbing.

Design copied from the geometry type decision (SURVEY.md §1.3): opaque
`binary` payload + typed metadata struct riding column metadata.  The
decode kernels are STUBBED (no image/audio libs in this container) behind
deterministic fakes — the Spark-side plumbing (schema, Arrow batching,
mapInPandas shape) is real and tested; swap `_fake_decode` for a
PIL/ffmpeg call in production.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("format", T.StringType()),      # png | wav | mp4 ...
    T.StructField("payload", T.BinaryType()),     # opaque bytes
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

FEATURE_DIM = 64


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract:
    sha256(payload) expanded to a unit-norm float vector.
    Replace with a real decoder (PIL/librosa/ffmpeg) in production —
    signature and batch shape stay identical."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def extract_features(df: DataFrame, payload_col: str = "payload",
                     dim: int = FEATURE_DIM) -> DataFrame:
    """Append `features array<double>` via Arrow-batched mapInPandas.

    At 100 TB: decode runs executor-side over Arrow batches; payload
    bytes never visit the driver; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.DoubleType()))])

    def run(it):
        for pdf in it:
            feats = [None if p is None else list(map(float, _fake_decode(bytes(p), dim)))
                     for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int,
                payload_col: str = "payload") -> DataFrame:
    """Image resize plumbing: passes payload through a mapInPandas stage and
    rewrites the metadata dims (real impl: PIL resize in the same loop)."""
    def run(it):
        for pdf in it:
            pdf = pdf.copy()
            if "width" in pdf:
                pdf["width"] = np.where(pdf[payload_col].isna(), pdf["width"], width)
            if "height" in pdf:
                pdf["height"] = np.where(pdf[payload_col].isna(), pdf["height"], height)
            yield pdf
    return df.mapInPandas(run, schema=df.schema)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000,
                      payload_col: str = "payload") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (explode on computed frame offsets); frame payload stubbed as a
    sliced hash of the source payload."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("frame_ms", T.LongType()),
                                  T.StructField("frame_payload", T.BinaryType())])

    def run(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                dur = r.get("duration_ms") or 0
                payload = r[payload_col]
                if payload is None or dur <= 0:
                    continue
                for ms in range(0, int(dur), every_ms):
                    fake_frame = hashlib.sha256(
                        bytes(payload) + ms.to_bytes(8, "little")).digest()
                    rows.append(tuple(r) + (ms, fake_frame))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def make_demo_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table exercising the schema."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                     payload, 640 if kind == "image" else None,
                     480 if kind == "image" else None,
                     5000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
