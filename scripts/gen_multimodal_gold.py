"""Generate the checked-in gold parquet for the three driver rows that run
on synthetic inputs (kg_triples, multimodal_meta, multimodal_frames), so
the driver's DuckDB oracle can SELECT the expected table instead of
falling back to the rows-only check.

All three tables are PURE-PYTHON recomputes — no Spark in this script.
Independence tiers (round-6: PNG promoted to fully independent):

* kg_triples — INDEPENDENT (second implementation:
  scripts/ref_interpreter.py, a straight-line interpreter).
* multimodal_meta, image rows — INDEPENDENT (round-5 verdict #4): the
  gold decodes PNG with a SECOND decoder below (_gold_png_decode:
  stdlib zlib inflate + a scalar per-spec unfilter loop, structurally
  nothing like the operator's vectorized numpy unfilter) and computes
  the 8 feature stats in its own _gold_image_features.  Only the
  feature_csv CONTRACT formatter is shared — by design, it defines the
  string surface both sides must produce.
* multimodal_meta audio/video rows + multimodal_frames — these call the
  SAME wav_decode/rawv_decode the operators call (the formats are
  trivial fixed-layout containers); the codecs are pinned separately by
  the hand-built scanline/filter fixtures and random differential tests
  in tests/test_multimodal.py, so this gold verifies the Spark-side
  plumbing (schema, batching, per-row wiring) for those kinds.

* multimodal_meta:   make_asset + decode_features over the deterministic
  200-asset corpus (the same recompute the in-query ``decode_match``
  flag performs), formatted through the shared ``feature_csv`` contract
  formatter;
* multimodal_frames: the RAWV containers of the 60-asset corpus decoded
  once each, one row per sampled timestamp (every_ms=400 — the driver
  query's setting);
* kg_triples:        re-serialization of tests/fixtures/gold_triples.json
  (produced by scripts/ref_interpreter.py, the independent straight-line
  interpreter) with the array column projected to csv — the driver
  query's contract surface.

Rerun after any codec / feature / corpus-parameter change:
    python scripts/gen_multimodal_gold.py
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from apt_bron_re_spark.operators.multimodal import (  # noqa: E402
    decode_features,
    feature_csv,
    make_asset,
    rawv_decode,
)

FIXTURES = REPO / "tests" / "fixtures"


def _gold_png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """SECOND PNG decoder (gold-independence, round-5 verdict #4): stdlib
    zlib inflate + a scalar per-byte unfilter transcribed directly from
    the PNG 1.2 spec (section 6, filter types 0-4).  Shares NO decode
    code with operators/multimodal.png_decode (which walks chunks with
    CRC checks and unfilters via vectorized numpy) — a bug in either
    implementation shows up as a gold mismatch instead of propagating.
    Deliberately skips CRC verification (the operator's CRC path is
    pinned by hand-built fixtures); structure errors raise."""
    import zlib
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("gold: bad PNG signature")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        ct = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if ct == b"IHDR":
            ihdr = body
        elif ct == b"IDAT":
            idat.extend(body)
        elif ct == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("gold: missing IHDR")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype = ihdr[8], ihdr[9]
    if depth != 8:
        raise ValueError("gold: unsupported bit depth")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = bytearray()
    prev = [0] * stride
    p = 0
    for _y in range(h):
        ftype = raw[p]
        line = raw[p + 1:p + 1 + stride]
        p += 1 + stride
        cur = [0] * stride
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0       # left
            b = prev[x]                             # up
            c = prev[x - ch] if x >= ch else 0      # up-left
            v = line[x]
            if ftype == 0:
                r = v
            elif ftype == 1:
                r = (v + a) & 0xFF
            elif ftype == 2:
                r = (v + b) & 0xFF
            elif ftype == 3:
                r = (v + (a + b) // 2) & 0xFF
            elif ftype == 4:
                pp = a + b - c
                pa_, pb_, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = (a if pa_ <= pb_ and pa_ <= pc_
                        else (b if pb_ <= pc_ else c))
                r = (v + pred) & 0xFF
            else:
                raise ValueError(f"gold: bad filter {ftype}")
            cur[x] = r
        out.extend(cur)
        prev = cur
    return w, h, ch, bytes(out)


def _gold_image_features(payload: bytes) -> list[float]:
    """Second implementation of the image feature vector (the 8 stats
    decode_features computes for kind == 'image'), over the second
    decoder's pixels."""
    w, h, c, pix = _gold_png_decode(payload)
    a = np.frombuffer(pix, dtype=np.uint8).astype(np.float64) / 255.0
    chans = a.reshape(-1, c)
    return [float(w), float(h), float(c),
            float(a.mean()), float(a.std()),
            float(chans[:, 0].mean()),
            float(chans[:, min(1, c - 1)].mean()),
            float(chans[:, min(2, c - 1)].mean())]


N_META = 200        # __spark_entry__.multimodal_meta corpus size
N_FRAMES = 60       # __spark_entry__.multimodal_frames corpus size
EVERY_MS = 400      # __spark_entry__.multimodal_frames sampling period


def gen_meta() -> None:
    rows = {"asset_id": [], "kind": [], "n_bytes": [], "payload_sha": [],
            "feature": [], "err": [], "decode_match": []}
    for i in range(N_META):
        asset_id, kind, payload, _meta = make_asset(i)
        rows["asset_id"].append(asset_id)
        rows["kind"].append(kind)
        rows["n_bytes"].append(len(payload))
        rows["payload_sha"].append(hashlib.sha256(payload).hexdigest())
        feats = (_gold_image_features(payload) if kind == "image"
                 else decode_features(payload, kind))
        rows["feature"].append(feature_csv(feats))
        rows["err"].append(None)
        rows["decode_match"].append(True)
    table = pa.table({
        "asset_id": pa.array(rows["asset_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
        "payload_sha": pa.array(rows["payload_sha"], pa.string()),
        "feature": pa.array(rows["feature"], pa.string()),
        "err": pa.array(rows["err"], pa.string()),
        "decode_match": pa.array(rows["decode_match"], pa.bool_()),
    })
    pq.write_table(table, FIXTURES / "gold_multimodal_meta.parquet")
    print(f"gold_multimodal_meta: {table.num_rows} rows")


def gen_frames() -> None:
    rows = {"asset_id": [], "frame_ts_ms": [], "frame_sha": [],
            "feature": [], "err": [], "frame_match": []}
    for i in range(N_FRAMES):
        asset_id, kind, payload, meta = make_asset(i)
        if kind != "video":
            continue
        w, h, fps, frames = rawv_decode(payload)   # decoded ONCE per asset
        for ts in range(0, meta["duration_ms"] + 1, EVERY_MS):
            idx = min(ts * fps // 1000, len(frames) - 1)
            frame = frames[idx]
            a = np.frombuffer(frame, dtype=np.uint8).astype(np.float64) / 255.0
            rows["asset_id"].append(asset_id)
            rows["frame_ts_ms"].append(ts)
            rows["frame_sha"].append(hashlib.sha256(frame).hexdigest())
            rows["feature"].append(feature_csv(
                [float(idx), float(w), float(h), float(fps),
                 float(a.mean()), float(a.std()),
                 float(a.min()), float(a.max())]))
            rows["err"].append(None)
            rows["frame_match"].append(True)
    table = pa.table({
        "asset_id": pa.array(rows["asset_id"], pa.int64()),
        "frame_ts_ms": pa.array(rows["frame_ts_ms"], pa.int64()),
        "frame_sha": pa.array(rows["frame_sha"], pa.string()),
        "feature": pa.array(rows["feature"], pa.string()),
        "err": pa.array(rows["err"], pa.string()),
        "frame_match": pa.array(rows["frame_match"], pa.bool_()),
    })
    pq.write_table(table, FIXTURES / "gold_multimodal_frames.parquet")
    print(f"gold_multimodal_frames: {table.num_rows} rows")


def gen_kg() -> None:
    gold = json.loads((FIXTURES / "gold_triples.json").read_text())
    triples = gold["triples"]
    table = pa.table({
        "subj": pa.array([t["subj"] for t in triples], pa.string()),
        "pred": pa.array([t["pred"] for t in triples], pa.string()),
        "obj": pa.array([t["obj"] for t in triples], pa.string()),
        "sources": pa.array([",".join(t["sources"]) for t in triples],
                            pa.string()),
        "n_sources": pa.array([t["n_sources"] for t in triples], pa.int64()),
        "justification": pa.array([t["justification"] for t in triples],
                                  pa.string()),
        "score": pa.array([round(float(t["score"]), 4) for t in triples],
                          pa.float64()),
        "gold_match": pa.array([True] * len(triples), pa.bool_()),
    })
    pq.write_table(table, FIXTURES / "gold_kg_triples.parquet")
    print(f"gold_kg_triples: {table.num_rows} rows")


if __name__ == "__main__":
    gen_meta()
    gen_frames()
    gen_kg()
