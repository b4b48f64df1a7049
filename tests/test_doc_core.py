"""Per-document core semantics: context-sentence equivalence (the
_ContextIndex optimization must be byte-equal to the reference formula at
every index), N2-N4 behaviours."""

from hypothesis import given, settings
from hypothesis import strategies as st

from apt_bron_re_spark.operators.doc_core import (
    _ContextIndex,
    build_ner_lookup,
    context_sentence,
    hit_search_terms,
    map_ner_results,
    ner_score,
)

_alphabet = st.sampled_from(list("ab _-.x1\n"))


@settings(max_examples=300, deadline=None)
@given(text=st.text(alphabet=_alphabet, min_size=0, max_size=120),
       n=st.integers(min_value=1, max_value=15))
def test_context_index_equals_reference_formula(text, n):
    ctx = _ContextIndex(text, n)
    for idx in range(len(text) + 1):
        assert ctx.sentence(idx) == context_sentence(text, idx, n), idx


def test_context_underscore_straddle():
    # '_' is a \w char but a valid M1 boundary: hit at index 2 sits inside
    # the word "x_cobra_y"; the reference truncates it into both halves.
    text = "alpha x_cobra_y omega"
    ctx = _ContextIndex(text, 15)
    assert ctx.sentence(8) == context_sentence(text, 8, 15)


def test_map_ner_results_blacklist_and_buckets():
    raw = {
        "THREAT_ACTOR": ["Lazarus", "apt", "threat group"],
        "OS": ["Windows"],
        "SOMETHING_NEW": ["value"],
        "OBSERVABLE-CVE": ["CVE-2020-1234"],
    }
    mapped = map_ner_results(raw)
    assert mapped["group"] == ["Lazarus"]          # blacklist dropped (ner.py:88)
    assert mapped["others"] == ["Windows", "value"]  # unknown -> others
    assert mapped["cve"] == ["CVE-2020-1234"]


def test_ner_lookup_flattens_lowercase():
    lookup = build_ner_lookup({"group": ["ApT28"], "cve": ["CVE-1-2"]})
    assert lookup == {"all": {"apt28", "cve-1-2"}}


def test_ner_score_group_alias_vs_name():
    lookup = {"all": {"hidden cobra"}}
    hit_alias = {"name": "Crimson Mantis", "original_id": "G0101",
                 "alias": "Hidden Cobra"}
    assert ner_score(hit_alias, "group", lookup, 1.0) == 1.0
    hit_name = {"name": "Crimson Mantis", "original_id": "G0101",
                "alias": None}
    # alias=None -> name variants searched; "hidden cobra" not among them
    assert ner_score(hit_name, "group", lookup, 1.0) == 0.0


def test_hit_search_terms_cve_uses_value():
    terms = hit_search_terms({"value": "CVE-2020-1"}, "cve")
    assert terms == {"cve-2020-1"}
