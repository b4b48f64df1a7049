"""Multimodal columns: opaque binary payloads + typed metadata + REAL
dependency-free decoders.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched pandas
UDFs over ``mapInPandas``.  The decoders are pure python + stdlib
(zlib/struct) so they run anywhere Spark's Python workers run:

  * PNG   — full chunk walk (CRC-checked), IHDR parse, zlib IDAT inflate,
            per-scanline unfilter (all five filter types 0-4 per the PNG
            spec, RFC 2083 §6 / W3C PNG 2nd ed. §9);
  * WAV   — RIFF/WAVE chunk walk, PCM fmt parse, int16 sample extraction
            (Microsoft/IBM RIFF WAVE format, fmt chunk layout);
  * RAWV  — a minimal raw-frame video container (magic + n_frames/w/h/fps
            header + concatenated RGB frames), the shape a training-data
            pipeline uses for pre-decoded tensor shards.

``synth_assets`` generates REAL payloads of all three formats
(deterministic, seeded), so the decode path is exercised end-to-end: the
features in ``asset_features``/``frame_features`` are computed from the
decoded pixels/samples/frames, not from payload hashes.  A production
build swaps the codec table for PIL/torchaudio/ffmpeg behind the same
``decode_features`` signature; the Spark plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is identical.

Scale notes: payloads never shuffle — features are extracted in the same
mapInPandas pass that scans them, and only the (small) feature rows flow
downstream; per-task memory is bounded by Arrow's maxRecordsPerBatch.
Malformed payloads yield an ``err`` row instead of failing the task (the
mention stage's catch-and-log pattern, reference basic.py:300-301).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
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
    T.StructField("err", T.StringType(), True),
])

N_FEATURES = 8

# --------------------------------------------------------------------------
# PNG codec (pure python; RGB8, non-interlaced)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png_encode(pixels: bytes, width: int, height: int) -> bytes:
    """RGB8 pixels (len == width*height*3) -> PNG bytes.  Scanline filters
    alternate None/Sub so decoders must actually unfilter."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    stride = width * 3
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        if y % 2 == 0:
            raw.append(0)                      # filter None
            raw.extend(row)
        else:
            raw.append(1)                      # filter Sub
            prev = b"\x00\x00\x00"
            for x in range(0, stride, 3):
                px = row[x:x + 3]
                raw.extend(((px[i] - prev[i]) & 0xFF) for i in range(3))
                prev = px
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, raw pixel bytes).  Supports
    8-bit greyscale (0), RGB (2) and RGBA (6), non-interlaced; all five
    scanline filters; CRC-checked chunk walk."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype_n)
    if channels is None:
        raise ValueError(f"unsupported color type {ctype_n}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("truncated IDAT")
    # Vectorized unfilter (round-4 perf: decode runs per-asset in the hot
    # mapInPandas path).  None/Sub/Up are whole-row numpy ops — Sub via a
    # uint8 cumsum along the width axis (uint8 accumulation wraps mod 256,
    # exactly the PNG byte arithmetic).  Average/Paeth keep the inherent
    # left-neighbour dependency but iterate per PIXEL with the channel
    # dimension vectorized (w steps instead of w*channels).  Outputs are
    # byte-identical to the scalar reference loop (hand-built scanline
    # fixtures in tests/test_multimodal.py pin all five filters).
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    data = arr[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(ftypes[y])
        line = data[y]
        if ftype == 0:      # None
            cur = line.copy()
        elif ftype == 1:    # Sub: prefix sum per channel column, mod 256
            cur = np.cumsum(line.reshape(-1, channels), axis=0,
                            dtype=np.uint8).reshape(-1)
        elif ftype == 2:    # Up
            cur = line + prev               # uint8 wraps mod 256
        elif ftype == 3:    # Average
            x = line.reshape(-1, channels).astype(np.int16)
            p = prev.reshape(-1, channels).astype(np.int16)
            o = np.empty_like(x)
            o[0] = (x[0] + (p[0] >> 1)) & 0xFF
            for j in range(1, x.shape[0]):
                o[j] = (x[j] + ((o[j - 1] + p[j]) >> 1)) & 0xFF
            cur = o.astype(np.uint8).reshape(-1)
        elif ftype == 4:    # Paeth
            x = line.reshape(-1, channels).astype(np.int16)
            p = prev.reshape(-1, channels).astype(np.int16)
            o = np.empty_like(x)
            # first pixel: a = c = 0 -> predictor reduces to b = prev
            o[0] = (x[0] + p[0]) & 0xFF
            for j in range(1, x.shape[0]):
                a, b, c = o[j - 1], p[j], p[j - 1]
                pa = np.abs(b - c)
                pb = np.abs(a - c)
                pc = np.abs(a + b - 2 * c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                o[j] = (x[j] + pred) & 0xFF
            cur = o.astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = cur
    return width, height, channels, out.tobytes()


# --------------------------------------------------------------------------
# WAV codec (RIFF PCM int16)
# --------------------------------------------------------------------------

def wav_encode(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """WAV bytes -> (sample_rate, channels, int16 sample array)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            pcm = body
        pos += 8 + length + (length & 1)
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, np.frombuffer(pcm, dtype="<i2")


# --------------------------------------------------------------------------
# RAWV codec (raw-frame video container)
# --------------------------------------------------------------------------

_RAWV_MAGIC = b"RAWV"


def rawv_encode(frames: list[bytes], width: int, height: int,
                fps: int) -> bytes:
    if any(len(f) != width * height * 3 for f in frames):
        raise ValueError("frame size mismatch")
    return (_RAWV_MAGIC
            + struct.pack("<HHHB", len(frames), width, height, fps)
            + b"".join(frames))


def rawv_decode(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """RAWV bytes -> (width, height, fps, [RGB frame bytes])."""
    if data[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV container")
    n, width, height, fps = struct.unpack("<HHHB", data[4:11])
    size = width * height * 3
    if len(data) != 11 + n * size:
        raise ValueError("truncated RAWV payload")
    frames = [data[11 + i * size:11 + (i + 1) * size] for i in range(n)]
    return width, height, fps, frames


# --------------------------------------------------------------------------
# feature extraction (decoded content -> fixed 8-float vector)
# --------------------------------------------------------------------------

def decode_features(payload: bytes, kind: str) -> list[float]:
    """Decode the payload with the format's real codec and compute content
    statistics.  Raises ValueError on malformed payloads (callers emit an
    ``err`` row)."""
    if kind == "image":
        w, h, c, pix = png_decode(payload)
        a = np.frombuffer(pix, dtype=np.uint8).astype(np.float64) / 255.0
        chans = a.reshape(-1, c)
        return [float(w), float(h), float(c),
                float(a.mean()), float(a.std()),
                float(chans[:, 0].mean()),
                float(chans[:, min(1, c - 1)].mean()),
                float(chans[:, min(2, c - 1)].mean())]
    if kind == "audio":
        rate, _ch, samples = wav_decode(payload)
        s = samples.astype(np.float64) / 32768.0
        zc = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8)))))
        return [float(len(s)), float(rate),
                float(np.abs(s).mean()),
                float(np.sqrt((s ** 2).mean())),
                float(np.abs(s).max(initial=0.0)),
                zc, float(s.mean()), 0.0]
    if kind == "video":
        w, h, fps, frames = rawv_decode(payload)
        lum = [np.frombuffer(f, dtype=np.uint8).astype(np.float64).mean()
               / 255.0 for f in frames]
        diffs = [float(np.abs(
            np.frombuffer(frames[i + 1], dtype=np.uint8).astype(np.int16)
            - np.frombuffer(frames[i], dtype=np.uint8).astype(np.int16)
        ).mean() / 255.0) for i in range(len(frames) - 1)]
        return [float(len(frames)), float(w), float(h), float(fps),
                float(np.mean(lum)), float(np.std(lum)),
                float(np.mean(diffs)) if diffs else 0.0, 0.0]
    raise ValueError(f"unknown kind {kind!r}")


def feature_csv(feature) -> str:
    """Deterministic 4-dp csv of a float32 feature vector — the CONTRACT
    surface shared by the driver queries and the pure-python gold
    generator (scripts/gen_multimodal_gold.py).  Values pass through
    float32 first (the array<float> storage type Arrow applies on the
    Spark side) so the driver-collected floats and the pure-python
    recompute format to identical strings."""
    return ",".join(repr(round(float(np.float32(x)), 4)) for x in feature)


# --------------------------------------------------------------------------
# synthetic asset source (REAL payloads, deterministic)
# --------------------------------------------------------------------------

def _byte_stream(seed: str, n: int) -> bytes:
    """n deterministic bytes from a keyed blake2b counter stream."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.blake2b(f"{seed}:{i}".encode(),
                                   digest_size=64).digest())
        i += 1
    return bytes(out[:n])


def make_asset(i: int, seed: int = 7) -> tuple:
    """One deterministic (asset_id, kind, payload, meta) row with a real
    PNG / WAV / RAWV payload."""
    kind = ["image", "audio", "video"][i % 3]
    if kind == "image":
        w, h = 16 * (1 + i % 4), 8 * (1 + i % 3)
        payload = png_encode(_byte_stream(f"{seed}-img-{i}", w * h * 3), w, h)
        meta = {"width": w, "height": h, "duration_ms": None,
                "mime": "image/png"}
    elif kind == "audio":
        n, rate = 512 + 7 * (i % 50), 8000
        samples = np.frombuffer(
            _byte_stream(f"{seed}-aud-{i}", n * 2), dtype="<i2")
        payload = wav_encode(samples, rate)
        meta = {"width": None, "height": None,
                "duration_ms": int(n * 1000 / rate), "mime": "audio/wav"}
    else:
        w, h, fps = 16, 8, 5 + i % 10
        n_frames = 3 + i % 3
        frames = [_byte_stream(f"{seed}-vid-{i}-{f}", w * h * 3)
                  for f in range(n_frames)]
        payload = rawv_encode(frames, w, h, fps)
        meta = {"width": w, "height": h,
                "duration_ms": int(n_frames * 1000 / fps),
                "mime": "video/x-raw"}
    return (i, kind, payload, meta)


def synth_assets(spark: SparkSession, n: int, seed: int = 7) -> DataFrame:
    """Deterministic synthetic asset table with REAL codec payloads."""
    rdd = spark.sparkContext.parallelize(range(n), max(2, n // 100)) \
        .map(lambda i: make_asset(i, seed))
    return spark.createDataFrame(rdd, ASSET_SCHEMA)


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------

def asset_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.
    Malformed payloads produce an ``err`` row (feature = zeros) instead of
    failing the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                    pdf["asset_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    feat = decode_features(raw, kind)
                    err = None
                except (ValueError, zlib.error, struct.error) as exc:
                    feat, err = [0.0] * N_FEATURES, f"{type(exc).__name__}: {exc}"[:200]
                rows.append({
                    "asset_id": int(asset_id),
                    "kind": kind,
                    "n_bytes": len(raw),
                    "payload_sha": hashlib.sha256(raw).hexdigest(),
                    "feature": feat,
                    "err": err,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return (assets.select("asset_id", "kind", "payload")
            .mapInPandas(run, FEATURE_SCHEMA))


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (asset, frame_ts) — the
    logical sample set ``frame_features`` produces rows for.  A PLAN VIEW
    only: ``frame_features`` does NOT join this back to the payload (that
    would carry the whole video binary once per sampled frame); it
    attaches the timestamp LIST per asset and explodes after decode."""
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
    T.StructField("err", T.StringType(), True),
])


def frame_features(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Per-frame feature extraction with the payload read EXACTLY ONCE per
    asset: the sampled-timestamp list rides the per-asset row (a sequence
    column — no explode, no join), the RAWV container is decoded once
    inside the Arrow-batched UDF, and one output row per sampled frame is
    emitted from that single decode (index = ts * fps / 1000, clamped).
    Per-frame luminance stats come from the decoded RGB bytes.

    Scale note: the round-3 shape exploded (asset, frame_ts) and joined
    the payload back, shipping payload_bytes x frames_per_video through
    the join — at video scale that dominates the stage.  Here payloads
    never fan out and never shuffle (same property as asset_features).
    Malformed payloads yield one err row per sampled timestamp instead of
    failing the task (asset_features' catch-and-log guard)."""
    vids = (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id", "payload",
            F.sequence(F.lit(0), F.col("meta.duration_ms"),
                       F.lit(every_ms)).alias("ts_list"))
    )

    cols = [f.name for f in FRAME_FEATURE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, ts_list in zip(
                    pdf["asset_id"], pdf["payload"], pdf["ts_list"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, fps, fr = rawv_decode(raw)
                except (ValueError, struct.error) as exc:
                    err = f"{type(exc).__name__}: {exc}"[:200]
                    for ts in ts_list:
                        rows.append({
                            "asset_id": int(asset_id),
                            "frame_ts_ms": int(ts),
                            "frame_sha": "",
                            "feature": [0.0] * N_FEATURES,
                            "err": err,
                        })
                    continue
                for ts in ts_list:
                    idx = min(int(ts) * fps // 1000, len(fr) - 1)
                    frame = fr[idx]
                    a = (np.frombuffer(frame, dtype=np.uint8)
                         .astype(np.float64) / 255.0)
                    rows.append({
                        "asset_id": int(asset_id),
                        "frame_ts_ms": int(ts),
                        "frame_sha": hashlib.sha256(frame).hexdigest(),
                        "feature": [float(idx), float(w), float(h),
                                    float(fps),
                                    float(a.mean()), float(a.std()),
                                    float(a.min()), float(a.max())],
                        "err": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return vids.mapInPandas(run, FRAME_FEATURE_SCHEMA)
