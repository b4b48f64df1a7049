"""Triple P/R vs INDEPENDENT gold fixtures (BASELINE.json: P/R >= 0.95).

The gold file is produced by scripts/ref_interpreter.py — a deliberately
naive straight-line re-implementation of the reference semantics that
shares no transformation code with the pipeline operators — so this is
independent validation, not a regression lock.  Regenerate via
``python scripts/ref_interpreter.py 60`` on a conscious semantics change."""

import json
from pathlib import Path

import pytest

from apt_bron_re_spark.plans.pipeline import Pipeline
from apt_bron_re_spark.sources.pages import pages_df

GOLD = json.loads(
    (Path(__file__).parent / "fixtures" / "gold_triples.json").read_text())


@pytest.fixture(scope="module")
def triples(spark, layer_map, tmp_path_factory):
    pipe = Pipeline(spark, layer_map, tmp_path_factory.mktemp("gold_run"),
                    n_buckets=8)
    return pipe.run(pages_df(spark, GOLD["n_pages"]))


def test_triple_precision_recall(triples):
    gold = {(t["subj"], t["pred"], t["obj"]) for t in GOLD["triples"]}
    got = {(r.subj, r.pred, r.obj) for r in triples.collect()}
    tp = len(gold & got)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(gold) if gold else 0.0
    assert precision >= 0.95, f"precision {precision:.3f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"


def test_sources_and_scores_match_gold(triples):
    gold = {(t["subj"], t["pred"], t["obj"]):
            (tuple(t["sources"]), t["score"], t["n_sources"],
             t["justification"])
            for t in GOLD["triples"]}
    got = {(r.subj, r.pred, r.obj):
           (tuple(sorted(r.sources)), r.score, r.n_sources, r.justification)
           for r in triples.collect()}
    mismatches = {k for k in gold.keys() & got.keys() if gold[k] != got[k]}
    assert not mismatches, f"{len(mismatches)} source/score mismatches"


def test_hub_corpus_exact_match(spark, layer_map, tmp_path_factory):
    """Skew-path SEMANTICS pin (round 5): the hub-heavy corpus
    (hub_rate=0.6 — hub group + fixed hub CVE in ~60% of pages) exercises
    the salted canonicalize/materialize paths with a genuinely dominant
    key; the pipeline must still match the independent straight-line
    interpreter EXACTLY (triples, sources, scores, justifications)."""
    import importlib.util as iu
    spec = iu.spec_from_file_location(
        "ref_interp", Path(__file__).parents[1] / "scripts" /
        "ref_interpreter.py")
    ri = iu.module_from_spec(spec)
    spec.loader.exec_module(ri)

    HUB = 0.6
    want = {(t["subj"], t["pred"], t["obj"]):
            (tuple(sorted(t["sources"])), t["score"], t["n_sources"],
             t["justification"])
            for t in ri.interpret(60, hub_rate=HUB)}
    pipe = Pipeline(spark, layer_map, tmp_path_factory.mktemp("hub_run"),
                    n_buckets=8)
    got = {(r.subj, r.pred, r.obj):
           (tuple(sorted(r.sources)), r.score, r.n_sources, r.justification)
           for r in pipe.run(
               pages_df(spark, 60, hub_rate=HUB)).collect()}
    assert got == want
    # the corpus really is hub-skewed: the fixed hub CVE must dominate
    hub_edges = [k for k in want if k[2] == "CVE-2021-44228"
                 or k[0] == "CVE-2021-44228"]
    assert hub_edges, "hub CVE never materialized — skew stress inert"
