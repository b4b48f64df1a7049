"""Per-stage, per-partition lineage + metrics — the resume mechanism.

The reference resumes by skipping files whose outputs already exist
(convert_reports.py:30-32, download_aptnotes.py:42-43 — S5 in SURVEY.md).
The rebuild replaces that with a ``_lineage`` table: every completed stage
appends one row per output bucket

    (stage, fingerprint, bucket, n_rows, wall_s, completed_at)

plus a stage-summary row (bucket = -1).  A stage re-runs only when no
summary row matches its input fingerprint — re-running is always safe
because stage outputs are idempotent overwrites of a deterministic
function of their inputs.

Fingerprints are content-stable hashes of the stage's configuration and
input fingerprint chain, so changing the catalog, the corpus, or an
upstream stage invalidates exactly the downstream stages.
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = ("stage string, fingerprint string, bucket int, "
                  "n_rows long, wall_s double, completed_at double")


def fingerprint(*parts) -> str:
    """Stable hash of arbitrary JSON-serializable parts."""
    payload = json.dumps(parts, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class LineageLog:
    def __init__(self, spark: SparkSession, base_dir: str | Path) -> None:
        self.spark = spark
        self.path = str(Path(base_dir) / "_lineage")
        # appends are serialized: the pipeline records stages from
        # CONCURRENT driver threads (residual write, canon overlap), and
        # two simultaneous append jobs to one parquet dir can collide in
        # the shared _temporary commit directory
        self._append_lock = threading.Lock()

    def _append(self, rows: list[tuple]) -> None:
        with self._append_lock:
            (self.spark.createDataFrame(rows, LINEAGE_SCHEMA)
             .coalesce(1).write.mode("append").parquet(self.path))

    def _read(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return None

    def is_complete(self, stage: str, fp: str) -> bool:
        df = self._read()
        if df is None:
            return False
        return (df.filter((F.col("stage") == stage)
                          & (F.col("fingerprint") == fp)
                          & (F.col("bucket") == -1)).limit(1).count() > 0)

    def record(self, stage: str, fp: str, out: DataFrame,
               wall_s: float, bucket_col: str | None = "pbucket") -> None:
        """Append per-bucket row counts + the stage summary row."""
        now = time.time()
        rows = []
        if bucket_col and bucket_col in out.columns:
            per_bucket = (out.groupBy(bucket_col)
                          .agg(F.count("*").alias("n")).collect())
            rows = [(stage, fp, int(r[bucket_col]), int(r["n"]), wall_s, now)
                    for r in per_bucket]
        total = sum(r[3] for r in rows) if rows else out.count()
        rows.append((stage, fp, -1, int(total), wall_s, now))
        self._append(rows)

    def completed_buckets(self, stage: str, fp: str) -> set[int]:
        """Buckets with a lineage row for this (stage, fingerprint) —
        the per-partition checkpoint set used for mid-stage resume."""
        df = self._read()
        if df is None:
            return set()
        rows = (df.filter((F.col("stage") == stage)
                          & (F.col("fingerprint") == fp)
                          & (F.col("bucket") >= 0))
                .select("bucket").distinct().collect())
        return {r.bucket for r in rows}

    def record_buckets(self, stage: str, fp: str, bucket_counts: dict[int, int],
                       wall_s: float) -> None:
        """Append per-bucket rows only (no summary row) — one chunk of an
        incrementally-executed stage."""
        now = time.time()
        rows = [(stage, fp, int(b), int(n), wall_s, now)
                for b, n in bucket_counts.items()]
        self._append(rows)

    def record_summary(self, stage: str, fp: str, n_rows: int,
                       wall_s: float) -> None:
        now = time.time()
        self._append([(stage, fp, -1, int(n_rows), wall_s, now)])

    def metrics(self) -> DataFrame | None:
        return self._read()
