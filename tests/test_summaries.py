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
