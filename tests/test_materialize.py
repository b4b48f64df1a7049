"""Salted two-phase triple materialization: exact k-smallest sources and
exact distinct counts on a skewed hub, identical to a naive single-phase
aggregation."""

from pyspark.sql import functions as F

from apt_bron_re_spark.operators.materialize import materialize_triples

EV_DDL = "url string, label string, canon_id string, score double, sentence string"


def _ev(spark, n_hub=300):
    rows = []
    # hub: G1 co-occurs with T1 in n_hub docs (skewed key)
    for i in range(n_hub):
        rows.append((f"u{i:04d}", "group", "G1", 1.0, f"s{i}"))
        rows.append((f"u{i:04d}", "technique", "T1", 0.5, None))
    # tail: one doc with another pair
    rows.append(("u9999", "group", "G2", 1.0, "tail"))
    rows.append(("u9999", "technique", "T2", 1.0, None))
    return spark.createDataFrame(rows, EV_DDL)


def test_salted_equals_naive_and_bounded(spark):
    ev = _ev(spark)
    out = {(r.subj, r.pred, r.obj): r
           for r in materialize_triples(ev, max_sources=10, n_salts=4).collect()}

    hub = out[("G1", "uses", "T1")]
    assert hub.n_sources == 300
    # exactly the 10 lexicographically-smallest urls
    assert hub.sources == [f"u{i:04d}" for i in range(10)]
    assert hub.score == 0.5  # min(subj, obj) pair score, maxed over docs

    tail = out[("G2", "uses", "T2")]
    assert tail.sources == ["u9999"] and tail.n_sources == 1
    assert tail.justification == "tail"


def test_salted_deterministic(spark):
    ev = _ev(spark, n_hub=97)
    a = materialize_triples(ev, max_sources=7, n_salts=4).collect()
    b = materialize_triples(ev, max_sources=7, n_salts=8).collect()
    ka = {(r.subj, r.pred, r.obj): (tuple(r.sources), r.n_sources) for r in a}
    kb = {(r.subj, r.pred, r.obj): (tuple(r.sources), r.n_sources) for r in b}
    # salt count must not change the result
    assert ka == kb
