"""Regenerate the pinned gold fixtures (tests/fixtures/gold_triples.json).

Run ONLY on a conscious semantics change: the fixture freezes the pipeline's
emitted (subj, pred, obj, sources) tuples on the pinned 60-page corpus so
any regression shows up as a P/R drop (BASELINE.json: P/R >= 0.95).
"""
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from apt_bron_re_spark.catalog.synthetic import build_layer_map
from apt_bron_re_spark.plans.pipeline import Pipeline
from apt_bron_re_spark.session import get_spark
from apt_bron_re_spark.sources.pages import pages_df

N_PAGES = 60

spark = get_spark("gen_gold", shuffle_partitions=8)
with tempfile.TemporaryDirectory() as td:
    pipe = Pipeline(spark, build_layer_map(), td, n_buckets=8)
    triples = pipe.run(pages_df(spark, N_PAGES))
    rows = sorted(
        ({"subj": r.subj, "pred": r.pred, "obj": r.obj,
          "sources": sorted(r.sources), "score": r.score}
         for r in triples.collect()),
        key=lambda d: (d["subj"], d["pred"], d["obj"]))
out = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "gold_triples.json"
out.write_text(json.dumps({"n_pages": N_PAGES, "triples": rows}, indent=1))
print(f"wrote {len(rows)} gold triples -> {out}")
