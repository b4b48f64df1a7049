"""Attribute the driver-bench kg_pipeline wall that is NOT inside a
stage's recorded span (round-6: stage walls summed ~11 s of a ~20-25 s
sf0.1 local[32] run — where do the other seconds go?).

Wraps the Pipeline hooks with wall-clock tracing (method enter/exit
timestamps relative to run() start) and prints a phase timeline plus
the gap accounting.  Read-only tracing — no behavior change; run it
alone on the box (single-Spark-job rule).

Usage: python scripts/profile_kg_overhead.py [sf] [cpus]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from apt_bron_re_spark.session import get_spark  # noqa: E402
from apt_bron_re_spark.catalog.synthetic import build_layer_map  # noqa: E402
from apt_bron_re_spark.plans import pipeline as plmod  # noqa: E402
from apt_bron_re_spark.sources.pages import pages_df  # noqa: E402

EVENTS: list[tuple[float, str]] = []
T0 = [0.0]


def mark(label: str) -> None:
    EVENTS.append((time.time() - T0[0], label))


def traced(cls, name):
    orig = getattr(cls, name)

    def wrap(self, *a, **k):
        mark(f"{name} enter")
        try:
            return orig(self, *a, **k)
        finally:
            mark(f"{name} exit")
    setattr(cls, name, wrap)


for m in ("_run_stage", "_run_link_stage", "_canon_stage", "_write",
          "_read", "_check_layout"):
    traced(plmod.Pipeline, m)

spark = get_spark("kgprof", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
n_pages = max(200, int(40_000 * sf))
wd = tempfile.mkdtemp(prefix="kgprof_")
pp = os.path.join(wd, "pages")
pages_df(spark, n_pages).write.mode("overwrite").parquet(pp)
pages = spark.read.parquet(pp)

pipe = plmod.Pipeline(spark, build_layer_map(), os.path.join(wd, "st"),
                      n_buckets=32, fuse_extract=True)
T0[0] = time.time()
mark("run enter")
triples = pipe.run(pages, resume=False)
n = triples.count()
mark(f"count exit ({n} triples)")
wall = EVENTS[-1][0]

prev = 0.0
for t, label in EVENTS:
    print(f"{t:8.2f}  (+{t - prev:6.2f})  {label}")
    prev = t
stages = {r.stage: round(r.wall_s, 2)
          for r in pipe.log.metrics().filter("bucket = -1").collect()}
print(f"\nwall {wall:.2f}s; lineage stage walls {stages} "
      f"(sum {sum(stages.values()):.2f}s)")
import shutil
shutil.rmtree(wd, ignore_errors=True)
