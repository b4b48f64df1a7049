"""A5-A9 summary operators over hand-built mention tables."""

import pytest

from apt_bron_re_spark.operators import summaries

DDL = ("url string, category string, name string, original_id string, "
       "value string, bm25_score double")


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        ("u1", "group", "Alpha", "G1", None, 0.2),
        ("u1", "group", "Alpha", "G1", None, 0.3),
        ("u2", "group", "Alpha", "G1", None, 1.5),
        ("u1", "group", "Beta", "G2", None, 2.0),
        ("u2", "group", "Beta", "G2", None, 3.0),
        ("u1", "cve", None, None, "CVE-1-1", None),
    ]
    return spark.createDataFrame(rows, DDL)


def test_per_report_counts(scored):
    got = {(r.url, r.category): r.n_hits
           for r in summaries.per_report_counts(scored).collect()}
    assert got[("u1", "group")] == 3
    assert got[("u1", "cve")] == 1


def test_global_totals(scored):
    got = {r.category: (r.n_hits, r.n_reports)
           for r in summaries.global_totals(scored).collect()}
    assert got["group"] == (5, 2)
    assert got["cve"] == (1, 1)


def test_problematic_names(scored):
    rows = summaries.problematic_names(scored, threshold=1.0).collect()
    # Alpha: 2/3 under 1.0 -> flagged, with the u2 exception collected
    assert len(rows) == 1
    r = rows[0]
    assert r.name == "alpha" and r.under == 2 and r.total == 3
    exc = [e for e in r.exceptions if e is not None]
    assert [e.url for e in exc] == ["u2"]


def test_bm25_statistics(scored):
    rows = {r.name: r for r in summaries.bm25_statistics(scored).collect()}
    # Beta is always above threshold -> excluded; Alpha kept
    assert "beta" not in rows
    a = rows["alpha"]
    assert a.n == 3 and a.above == 1 and a.below == 2
    assert a.mean_score == round((0.2 + 0.3 + 1.5) / 3, 4)


def test_ablation_differences(spark, scored):
    other = spark.createDataFrame(
        [("u1", "group", "Alpha", "G1", None, 0.5),
         ("u1", "group", "Gamma", "G3", None, 0.5)], DDL)
    diff = {(r.url, r.category, r.entity_id, r.side)
            for r in summaries.ablation_differences(scored, other).collect()}
    assert ("u1", "group", "g2", "only_a") in diff
    assert ("u1", "group", "g3", "only_b") in diff
    assert not any(e == "g1" and u == "u1" for u, _, e, _ in diff)


def test_alias_coverage_multiword_phrases(spark):
    """Round-5 verdict #6: multi-word alias terms must match when (and
    only when) their tokens appear CONSECUTIVELY in the sep-split doc."""
    docs = spark.createDataFrame(
        [("d1", "uses hash join always"),        # phrase, consecutive
         ("d2", "hash then a join later"),       # both tokens, NOT adjacent
         ("d3", "alpha attacked again"),         # single-token name
         ("d4", "nothing relevant here")],
        "doc_id string, text string")
    cat = spark.createDataFrame(
        [("G1", "mitre", "hash join"),           # multi-word alias
         ("G1", "name", "alpha"),
         ("G2", "name", "join")],                # single token = a phrase word
        "grp string, kind string, term string")
    got = {r.doc_id: r for r in
           summaries.alias_coverage(docs, cat).collect()}
    assert len(got) == 4                          # every doc gets a row
    # d1: G1 via the phrase alias only (no name) -> alias_without_name,
    #     plus G2's single-token name "join"
    assert got["d1"].mitre_alias_hits == 1
    assert got["d1"].group_name_hits == 1        # G2 "join"
    assert got["d1"].alias_without_name == 1     # G1 matched only by alias
    # d2: tokens present but not consecutive -> NO phrase hit; G2 "join" only
    assert got["d2"].mitre_alias_hits == 0
    assert got["d2"].group_name_hits == 1
    assert got["d2"].alias_without_name == 0
    # d3: single-token name still works
    assert got["d3"].group_name_hits == 1
    assert got["d3"].mitre_alias_hits == 0
    # d4: zero row present
    assert got["d4"].group_name_hits == 0 and got["d4"].alias_without_name == 0


def test_alias_coverage_reference_parity_boundaries(spark):
    """Round-5 ADVICE #4: matching is case-insensitive with ANY non-alnum
    boundary, like the reference's lowercased automaton + non-alnum
    boundary check (compare_groups_and_aliases.py:65-74) — "Spark," must
    hit the term "spark"; "sparkle" must NOT (boundary inside a word)."""
    docs = spark.createDataFrame(
        [("d1", "Uses Alpha.Beta, then (gamma)!"),  # punct boundaries + case
         ("d2", "sparkle is not spark-adjacent"),   # no bare "sparkle" hit
         ("d3", "HASH\tJOIN across\nlines")],       # phrase over any sep
        "doc_id string, text string")
    cat = spark.createDataFrame(
        [("G1", "name", "beta"),
         ("G2", "mitre", "alpha.beta"),   # interior punct -> token sequence
         ("G3", "name", "sparkle"),
         ("G4", "mitre", "hash join")],
        "grp string, kind string, term string")
    got = {r.doc_id: r for r in
           summaries.alias_coverage(docs, cat).collect()}
    assert got["d1"].group_name_hits == 1      # "Beta," -> beta
    assert got["d1"].mitre_alias_hits == 1     # "Alpha.Beta" -> alpha beta
    assert got["d2"].group_name_hits == 1      # "sparkle" literal token
    assert got["d2"].mitre_alias_hits == 0
    assert got["d3"].mitre_alias_hits == 1     # tab/newline are boundaries
