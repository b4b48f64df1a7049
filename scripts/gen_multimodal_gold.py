"""Generate the checked-in gold parquet for the three driver rows that run
on synthetic inputs (kg_triples, multimodal_meta, multimodal_frames), so
the driver's DuckDB oracle can SELECT the expected table instead of
falling back to the rows-only check.

All three tables are PURE-PYTHON recomputes — no Spark in this script.
Independence caveat: the multimodal rows call the SAME
make_asset/decode_features/rawv_decode codec functions the Spark
operators call, so this gold verifies the Spark-side plumbing (schema,
batching, per-row wiring), not the codecs — a codec bug would propagate
identically into the gold.  The codecs are pinned separately by the
hand-built scanline/filter fixtures and random-image differential tests
in tests/test_multimodal.py.  kg_triples IS independent (second
implementation: scripts/ref_interpreter.py).

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
        rows["feature"].append(feature_csv(decode_features(payload, kind)))
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
