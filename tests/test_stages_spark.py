"""End-to-end Spark checks for stages 1-2 against the pure-Python gold:
the Spark mention stage must emit exactly the rows process_document emits
when run directly (SURVEY.md §5 differential testing)."""

import pytest

from apt_bron_re_spark.operators.doc_core import NerTagger, process_document
from apt_bron_re_spark.operators.extract import extract_docs, extraction_parity
from apt_bron_re_spark.operators.mention import (
    detect_mentions,
    mentions_view,
    residue_view,
)
from apt_bron_re_spark.sources.pages import generate_pages, pages_df

N_PAGES = 30


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_PAGES).cache()


@pytest.fixture(scope="module")
def stage_df(spark, pages, layer_map):
    docs = extract_docs(pages)
    return detect_mentions(docs, layer_map).cache()


def test_extraction_byte_identical(spark, pages):
    bad = extraction_parity(pages).filter("NOT ok").count()
    assert bad == 0


def test_extract_filters_lang(spark, pages):
    docs = extract_docs(pages)
    n_en = pages.filter("lang = 'en'").count()
    assert docs.count() == n_en
    assert docs.columns == ["url", "text"]


def gold_rows(layer_map):
    from apt_bron_re_spark.catalog.build import compile_catalog
    catalog = compile_catalog(layer_map)
    tagger = NerTagger(layer_map)
    mention_rows = set()
    residue_rows = set()
    for i, page in enumerate(generate_pages(N_PAGES)):
        if page["lang"] != "en":
            continue
        results, residue, _dl = process_document(page["text"], catalog, tagger)
        for category, entries in results.items():
            for e in entries:
                mention_rows.add((
                    page["url"], category, e.get("name"), e.get("original_id"),
                    e.get("value"), e.get("index"), e.get("alias"),
                    float(e.get("NER_score", 0.0)), e.get("sentence"),
                ))
        for bucket, values in residue.items():
            for v in values:
                residue_rows.add((page["url"], bucket, v))
    return mention_rows, residue_rows


def test_mentions_match_pure_python_gold(spark, stage_df, layer_map):
    gold_mentions, gold_residue = gold_rows(layer_map)

    got_mentions = {
        (r.url, r.category, r.name, r.original_id, r.value, r["index"],
         r.alias, r.ner_score, r.sentence)
        for r in mentions_view(stage_df).collect()
    }
    assert got_mentions == gold_mentions

    got_residue = {(r.url, r.bucket, r.value)
                   for r in residue_view(stage_df).collect()}
    assert got_residue == gold_residue


def test_cpe_unversioned_dead_code_preserved(stage_df):
    # Reference basic.py:232 tokenizer bug -> cpe_unversioned never emits
    # (SURVEY.md M6); the rebuild preserves the observed behaviour.
    assert stage_df.filter("category = 'cpe_unversioned'").count() == 0


def test_score_mix_present(stage_df):
    scores = {r.ner_score for r in
              mentions_view(stage_df).select("ner_score").distinct().collect()}
    assert 0.0 in scores and 1.0 in scores


def test_boundary_traps_not_matched(stage_df):
    # supersharphound2020 / G0106X9 style traps must not produce hits at
    # those offsets; ensure no mention sentence contains a trap token match
    # for SharpHound at an embedded position: instead just assert no
    # original_id hit has a name equal to the trap strings.
    trap_hits = mentions_view(stage_df).filter(
        "name like 'super%' OR original_id like '%X9'").count()
    assert trap_hits == 0
