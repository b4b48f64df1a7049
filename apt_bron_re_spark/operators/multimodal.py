"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched pandas
UDFs over ``mapInPandas``.  The decode step itself is STUBBED (no imaging
libraries in this container): ``decode_stub`` computes deterministic fake
features from the payload bytes and raises ``NotImplementedError`` when a
real decode is requested — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("payload", T.BinaryType(), True),   # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("payload_sha", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def decode_stub(payload: bytes, kind: str, real_decode: bool = False):
    """Deterministic fake decode.  A production build replaces this with
    PIL/torchaudio/ffmpeg behind the same signature."""
    if real_decode:
        raise NotImplementedError(
            "real image/audio decode requires imaging libraries not "
            "present in this container; plug a decoder in here")
    digest = hashlib.blake2b(payload or b"", digest_size=32).digest()
    return [b / 255.0 for b in digest[:8]]


def synth_assets(spark: SparkSession, n: int, seed: int = 7) -> DataFrame:
    """Deterministic synthetic asset table (payload = seeded bytes)."""
    kinds = ["image", "audio", "video"]

    def make(i: int):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(
            f"{seed}-{i}".encode(), digest_size=64).digest() * (1 + i % 4)
        meta = {
            "width": 64 * (1 + i % 8) if kind == "image" else None,
            "height": 48 * (1 + i % 8) if kind == "image" else None,
            "duration_ms": 1000 * (1 + i % 30) if kind != "image" else None,
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
        }
        return (i, kind, payload, meta)

    rdd = spark.sparkContext.parallelize(range(n), max(2, n // 100)).map(make)
    return spark.createDataFrame(rdd, ASSET_SCHEMA)


def asset_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' + feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                    pdf["asset_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                rows.append({
                    "asset_id": int(asset_id),
                    "kind": kind,
                    "n_bytes": len(raw),
                    "payload_sha": hashlib.sha256(raw).hexdigest(),
                    "feature": decode_stub(raw, kind),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return (assets.select("asset_id", "kind", "payload")
            .mapInPandas(run, FEATURE_SCHEMA))


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) — the
    explode that precedes a per-frame decode UDF (decode itself stubbed)."""
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"),
                           F.lit(every_ms))).alias("frame_ts_ms"))
    )


FRAME_FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("frame_ts_ms", T.IntegerType(), False),
    T.StructField("frame_sha", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def frame_features(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Per-frame feature extraction: frame-sample plan joined back to the
    payload, then one Arrow-batched UDF row per (asset, frame).  The frame
    'decode' is the deterministic stub seeded by (payload, frame_ts) — a
    production build replaces it with an ffmpeg seek+decode behind the
    same signature; the Spark plumbing (explode -> join -> mapInPandas
    batch shape) is the real, scale-relevant part."""
    plan = frame_sample_plan(assets, every_ms)
    frames = plan.join(assets.select("asset_id", "payload"), "asset_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, ts, payload in zip(
                    pdf["asset_id"], pdf["frame_ts_ms"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                seed = raw + int(ts).to_bytes(8, "little")
                rows.append({
                    "asset_id": int(asset_id),
                    "frame_ts_ms": int(ts),
                    "frame_sha": hashlib.sha256(seed).hexdigest(),
                    "feature": decode_stub(seed, "video"),
                })
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FRAME_FEATURE_SCHEMA])

    return frames.mapInPandas(run, FRAME_FEATURE_SCHEMA)
