"""E2 differential: two independent extraction paths, diffed entity hits.

The reference converts every report twice (txt and md) and diffs the two
hit files (tests/compare_txt_md.py:20-69).  Here the HTMLParser-based
``extract_text`` and the regex-based ``extract_text_md`` (no shared code)
each feed the per-document core; the structured entity identities
(category -> {(name, original_id) | value}) must agree on every page of
the pinned corpus, even though offsets and context sentences differ."""

from apt_bron_re_spark.catalog.build import compile_catalog
from apt_bron_re_spark.catalog.synthetic import build_layer_map
from apt_bron_re_spark.functions.extract_text import extract_text, extract_text_md
from apt_bron_re_spark.operators.doc_core import NerTagger, process_document
from apt_bron_re_spark.sources.pages import generate_pages

N_PAGES = 40


def _identity_sets(results):
    out = {}
    for category, entries in results.items():
        ids = set()
        for ent in entries:
            if ent.get("original_id") is not None:
                ids.add((ent.get("name"), ent["original_id"]))
            else:
                ids.add(ent.get("value"))
        out[category] = ids
    return out


def test_txt_md_differential_hits_agree():
    layer_map = build_layer_map()
    catalog = compile_catalog(layer_map)
    tagger = NerTagger(layer_map)

    diffs = []
    for page in generate_pages(N_PAGES):
        if page["lang"] != "en":
            continue
        t_txt = extract_text(page["html"])
        t_md = extract_text_md(page["html"])
        assert t_txt != t_md, "the two extraction paths must actually differ"
        r_txt, _, _ = process_document(t_txt, catalog, tagger)
        r_md, _, _ = process_document(t_md, catalog, tagger)
        a, b = _identity_sets(r_txt), _identity_sets(r_md)
        if a != b:
            only_a = {k: a.get(k, set()) - b.get(k, set())
                      for k in set(a) | set(b)}
            diffs.append((page["url"], only_a))
    assert not diffs, f"{len(diffs)} pages with txt/md hit differences: " \
                      f"{diffs[:2]}"


def test_md_extractor_strips_boilerplate():
    page = generate_pages(1)[0]
    t_md = extract_text_md(page["html"])
    assert "analytics" not in t_md            # script dropped
    assert "newsletter" not in t_md           # nav dropped
    assert "Copyright" not in t_md            # footer dropped
    assert t_md.startswith("# Threat Report")  # heading marker
