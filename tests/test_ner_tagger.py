"""NerTagger (N1 stand-in) unit tests: surface tagging, original-case
values, normalized emissions, CVE tagging, determinism."""

import pytest

from apt_bron_re_spark.operators.doc_core import NerTagger


@pytest.fixture(scope="module")
def tagger(layer_map):
    return NerTagger(layer_map)


def test_tags_catalog_surfaces_with_original_case(tagger):
    raw = tagger.tag("We observed Mimikatz and obsidian tiger activity.")
    assert "Mimikatz" in raw["PRODUCT"]          # software_type=tool
    assert "obsidian tiger" in raw["THREAT_ACTOR"]  # case as in text


def test_normalized_emission(tagger):
    raw = tagger.tag("Known internally as the Mantids since 2020.")
    assert "mantis-crew" in raw["THREAT_ACTOR"]
    # the raw surface itself is NOT emitted
    assert "the Mantids" not in raw.get("THREAT_ACTOR", [])


def test_cve_tagging(tagger):
    raw = tagger.tag("Exploit of CVE-2021-44228 was seen; cve-2020-1 too.")
    assert raw["OBSERVABLE-CVE"] == ["CVE-2021-44228", "cve-2020-1"]


def test_blacklist_surfaces_tagged_then_filtered_downstream(tagger):
    from apt_bron_re_spark.operators.doc_core import map_ner_results
    raw = tagger.tag("The apt used a tool to exploit the target.")
    mapped = map_ner_results(raw)
    # blacklisted generic strings present in raw but dropped by N2
    flat = [v.lower() for vs in mapped.values() for v in vs]
    assert "apt" not in flat and "tool" not in flat


def test_deterministic(tagger):
    text = "Cobalt Strike and ShadowPad used by Iron Sparrow (G0105)."
    assert tagger.tag(text) == tagger.tag(text)
