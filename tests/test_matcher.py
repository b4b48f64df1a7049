"""Unit + property tests for the multi-pattern matcher (M1 semantics,
reference basic.py:114-148): word boundaries, first-occurrence-per-variant,
and exact equivalence to a brute-force scan-every-position oracle."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from apt_bron_re_spark.functions.matcher import (
    Match,
    MultiPatternMatcher,
    _boundaries_ok,
)


def brute_force_oracle(text_lower: str, patterns) -> list[Match]:
    """Scan every position for every pattern (the reference automaton does
    exactly this in O(n)); apply boundary + earliest-occurrence rules."""
    best = {}
    for pat in patterns:
        start = 0
        while True:
            pos = text_lower.find(pat, start)
            if pos < 0:
                break
            if _boundaries_ok(text_lower, pos, pos + len(pat)):
                if pat not in best or pos < best[pat]:
                    best[pat] = pos
                break  # find() is left-to-right: first passing is earliest
            start = pos + 1
    out = [Match(s, s + len(p), p) for p, s in best.items()]
    out.sort(key=lambda m: (m.end, m.pattern))
    return out


def test_simple_hit_with_boundaries():
    m = MultiPatternMatcher(["mimikatz"])
    hits = m.find("the mimikatz tool")
    assert hits == [Match(4, 12, "mimikatz")]


def test_partial_word_rejected():
    m = MultiPatternMatcher(["mimikatz"])
    assert m.find("supermimikatz2020") == []
    assert m.find("mimikatz2020") == []
    assert m.find("supermimikatz") == []


def test_underscore_is_a_boundary():
    # '_' is not alnum -> the reference boundary test passes (basic.py:127-129)
    m = MultiPatternMatcher(["cobra"])
    assert m.find("x_cobra_y") == [Match(2, 7, "cobra")]


def test_first_occurrence_only():
    m = MultiPatternMatcher(["apt"])
    hits = m.find("apt was seen; apt returned")
    assert hits == [Match(0, 3, "apt")]


def test_first_boundary_passing_occurrence():
    # First occurrence fails the boundary test -> second one is recorded.
    m = MultiPatternMatcher(["apt"])
    hits = m.find("aptx then apt alone")
    assert hits == [Match(10, 13, "apt")]


def test_multiword_and_punctuated_patterns():
    pats = ["command line", "command-line", "cve-2021-44228", "t1059.001"]
    m = MultiPatternMatcher(pats)
    text = "use the command-line. see cve-2021-44228 and t1059.001 now"
    got = {h.pattern: h.start for h in m.find(text)}
    assert got == {
        "command-line": 8,
        "cve-2021-44228": 26,
        "t1059.001": 45,
    }


def test_overlapping_patterns_both_found():
    # An alternation regex would miss one of these; Aho-Corasick finds both.
    m = MultiPatternMatcher(["hidden cobra", "cobra"])
    text = "actor hidden cobra struck"
    got = {h.pattern: h.start for h in m.find(text)}
    assert got == {"hidden cobra": 6, "cobra": 13}


def test_irregular_pattern_leading_dot():
    m = MultiPatternMatcher([".net", "c++"])
    text = "built on .net and c++ today"
    got = {h.pattern: h.start for h in m.find(text)}
    assert got == {".net": 9, "c++": 18}


def test_find_all_occurrences():
    m = MultiPatternMatcher(["apt"])
    hits = m.find_all_occurrences("apt and apt and aptx")
    assert [(h.start, h.end) for h in hits] == [(0, 3), (8, 11)]


_alphabet = st.sampled_from(list("ab -_.x1"))


@settings(max_examples=300, deadline=None)
@given(
    text=st.text(alphabet=_alphabet, min_size=0, max_size=80),
    pats=st.lists(
        st.text(alphabet=_alphabet, min_size=1, max_size=6).map(str.lower),
        min_size=1, max_size=8, unique=True,
    ),
)
def test_matcher_equals_bruteforce(text, pats):
    pats = [p for p in pats if p.strip()]
    text_lower = text.lower()
    m = MultiPatternMatcher(pats)
    assert m.find(text_lower) == brute_force_oracle(text_lower, pats)
