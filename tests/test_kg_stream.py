"""Streaming KG construction must equal the batch pipeline.

Two parity pins over the same multi-trigger stream of synthetic pages:

* the foreachBatch micro-batch pipeline (stages 2-5, frozen BM25 globals,
  merge-on-append partials) == single-shot batch pipeline, EXACTLY;
* the live applyInPandasWithState triple view == batch
  materialize_triples(evidence(mentions, None, canon)), EXACTLY.

Plus an exactly-once check: replaying a micro-batch with the same
batch_id leaves the merged result unchanged.
"""

import pytest
from pyspark.sql import functions as F

from apt_bron_re_spark.operators import bm25, linking, materialize, mention
from apt_bron_re_spark.operators.canonicalize import canonical_map
from apt_bron_re_spark.sources.pages import pages_df
from apt_bron_re_spark.streaming.kg_stream import (
    canon_as_dict,
    kg_batch_step,
    merged_triples,
    run_kg_stream,
    stream_evidence_pairs,
    stream_triples_live,
)

N_PAGES = 40


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    """Pages written as 3 separate files so maxFilesPerTrigger=1 forces 3
    micro-batches (urls split across triggers)."""
    path = str(tmp_path_factory.mktemp("kg_pages"))
    pages_df(spark, N_PAGES).repartition(3).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def batch_stage2(spark, layer_map, pages_path):
    pages = spark.read.parquet(pages_path)
    df = mention.detect_mentions(
        pages.filter(F.col("lang") == "en").select("url", "html"),
        layer_map, from_html=True)
    df.persist().count()
    return df


@pytest.fixture(scope="module")
def canon_df(spark, layer_map):
    df = canonical_map(spark, layer_map)
    df.persist().count()
    return df


def _stream_pages(spark, path):
    from apt_bron_re_spark.streaming.mention_stream import PAGE_DDL
    return (spark.readStream.schema(PAGE_DDL).format("parquet")
            .option("maxFilesPerTrigger", 1).load(path))


def _canon_rows(df):
    return sorted(
        (r["subj"], r["pred"], r["obj"], tuple(r["sources"]),
         r["n_sources"], r["justification"], r["score"])
        for r in df.collect())


def test_foreachbatch_pipeline_equals_batch(spark, layer_map, pages_path,
                                            batch_stage2, canon_df,
                                            tmp_path_factory):
    # frozen globals from the full corpus snapshot (the production rule:
    # freeze once, score every increment against the frozen tables)
    stats, df_ = bm25.bm25_global_stats(
        mention.mentions_view(batch_stage2),
        mention.doc_lengths_view(batch_stage2))
    stats.persist().count()
    df_.persist().count()

    # batch truth: the real (unfrozen) stage 3-5 composition
    scored = bm25.add_bm25(mention.mentions_view(batch_stage2),
                           dls=mention.doc_lengths_view(batch_stage2))
    links = linking.build_links(mention.residue_view(batch_stage2), layer_map)
    merged, residual = linking.merge_links(scored, links)
    want = materialize.materialize_triples(
        materialize.evidence(merged, residual, canon_df))

    out = str(tmp_path_factory.mktemp("kg_stream_out"))
    ckpt = str(tmp_path_factory.mktemp("kg_stream_ckpt"))
    q = run_kg_stream(_stream_pages(spark, pages_path), layer_map,
                      stats, df_, canon_df, out, ckpt, available_now=True)
    q.awaitTermination(600)

    # >= 2 micro-batches actually ran (the parity claim needs a real split)
    n_batches = (spark.read.parquet(out)
                 .select("batch_id").distinct().count())
    assert n_batches >= 2

    got = merged_triples(spark, out)
    assert _canon_rows(got) == _canon_rows(want)


def test_batch_step_replay_is_idempotent(spark, layer_map, pages_path,
                                         batch_stage2, canon_df,
                                         tmp_path_factory):
    """foreachBatch replay semantics: running the SAME micro-batch with the
    same batch_id twice rewrites its partition (dynamic partition
    overwrite) instead of appending duplicates."""
    stats, df_ = bm25.bm25_global_stats(
        mention.mentions_view(batch_stage2),
        mention.doc_lengths_view(batch_stage2))
    out = str(tmp_path_factory.mktemp("kg_replay_out"))
    micro = spark.read.parquet(pages_path).filter(
        F.pmod(F.crc32("url"), F.lit(2)) == 0)

    kg_batch_step(micro, 7, layer_map, stats, df_, canon_df, out)
    once = _canon_rows(merged_triples(spark, out))
    n_once = spark.read.parquet(out).count()

    kg_batch_step(micro, 7, layer_map, stats, df_, canon_df, out)  # replay
    assert _canon_rows(merged_triples(spark, out)) == once
    assert spark.read.parquet(out).count() == n_once


def test_live_view_equals_batch_mention_triples(spark, layer_map,
                                                pages_path, batch_stage2,
                                                canon_df,
                                                tmp_path_factory):
    """Live view WITHOUT linking == batch triples over mentions only."""
    want = materialize.materialize_triples(materialize.evidence(
        mention.mentions_view(batch_stage2), None, canon_df))

    canon_map_d = canon_as_dict(spark, layer_map)
    pairs = stream_evidence_pairs(_stream_pages(spark, pages_path),
                                  layer_map, canon_map_d, link=False)
    live = stream_triples_live(pairs)

    ckpt = str(tmp_path_factory.mktemp("live_ckpt"))
    q = (live.writeStream.format("memory").queryName("live_triples")
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)

    # update mode appends one row per key per trigger; the LAST row per
    # key is the final state (n_sources is monotone within a key)
    rows = spark.table("live_triples").collect()
    final = {}
    for r in rows:
        key = (r["subj"], r["pred"], r["obj"])
        cur = final.get(key)
        if cur is None or r["n_sources"] >= cur["n_sources"]:
            final[key] = r
    got = sorted(
        (k[0], k[1], k[2], tuple(r["sources"]), r["n_sources"],
         r["justification"], r["score"])
        for k, r in final.items())
    assert got == _canon_rows(want)


def _drain_live(spark, live, ckpt, name):
    q = (live.writeStream.format("memory").queryName(name)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    final = {}
    for r in spark.table(name).collect():
        key = (r["subj"], r["pred"], r["obj"])
        cur = final.get(key)
        if cur is None or r["n_sources"] >= cur["n_sources"]:
            final[key] = r
    return final


def test_live_view_with_links_equals_batch_linked_triples(
        spark, layer_map, pages_path, batch_stage2, canon_df,
        tmp_path_factory):
    """Live view WITH the row-local L2-L5 link pass == batch triples over
    merged mentions + residual links — on a corpus where the links really
    change the triple set (asserted), the round-3 residual-link parity."""
    links = linking.build_links(
        mention.residue_view(batch_stage2), layer_map)
    merged, residual = linking.merge_links(
        mention.mentions_view(batch_stage2), links)
    want = materialize.materialize_triples(
        materialize.evidence(merged, residual, canon_df))
    base = materialize.materialize_triples(materialize.evidence(
        mention.mentions_view(batch_stage2), None, canon_df))
    # the corpus must exercise the link pass, else this test proves nothing
    assert _canon_rows(want) != _canon_rows(base)
    assert residual.count() > 0

    canon_map_d = canon_as_dict(spark, layer_map)
    pairs = stream_evidence_pairs(_stream_pages(spark, pages_path),
                                  layer_map, canon_map_d, link=True)
    live = stream_triples_live(pairs)
    final = _drain_live(spark, live, str(tmp_path_factory.mktemp(
        "live_link_ckpt")), "live_triples_linked")
    got = sorted(
        (k[0], k[1], k[2], tuple(r["sources"]), r["n_sources"],
         r["justification"], r["score"])
        for k, r in final.items())
    assert got == _canon_rows(want)
    assert all(r["replays_detected"] == 0 for r in final.values())


def test_live_view_replay_guard(spark, layer_map, pages_path, canon_df,
                                tmp_path_factory):
    """A url replayed across micro-batches violates the one-batch-per-url
    contract: the bounded state detects it (the url is in the k-smallest
    sample), surfaces replays_detected > 0, and does NOT double-count
    n_sources."""
    dup_dir = str(tmp_path_factory.mktemp("kg_pages_dup") / "p")
    pages = spark.read.parquet(pages_path).limit(8)
    # the same 8 urls in TWO files -> two triggers see the same urls
    pages.coalesce(1).write.mode("overwrite").parquet(dup_dir)
    pages.coalesce(1).write.mode("append").parquet(dup_dir)

    canon_map_d = canon_as_dict(spark, layer_map)
    pairs = stream_evidence_pairs(_stream_pages(spark, dup_dir),
                                  layer_map, canon_map_d, link=False)
    live = stream_triples_live(pairs)
    final = _drain_live(spark, live, str(tmp_path_factory.mktemp(
        "live_dup_ckpt")), "live_triples_dup")

    want = materialize.materialize_triples(materialize.evidence(
        mention.detect_mentions(
            pages.filter(F.col("lang") == "en").select("url", "html"),
            layer_map, from_html=True)
        .filter("rec_type = 'mention'").drop("rec_type", "bucket"),
        None, canon_df))
    want_n = {(r["subj"], r["pred"], r["obj"]): r["n_sources"]
              for r in want.collect()}
    # no double counting despite every url arriving twice...
    assert {k: r["n_sources"] for k, r in final.items()} == want_n
    # ...and the violation is surfaced
    assert any(r["replays_detected"] > 0 for r in final.values())


def test_row_linker_score_is_max_over_candidates(spark, layer_map):
    """RowLinker must report max(link_ner_score) over ALL of a key's
    candidates — mirroring batch best_links' SEPARATE F.max aggregate —
    not the struct-max winner's own score.  Planted shape (round-4 advice):
    residue {'tactic': ['initial_access'], 'others': ['Initial Access']}
    for TA0001 — the bucket-matching variant candidate scores 1.0 while a
    cross-bucket semantic candidate can win the struct with s=0.5."""
    from apt_bron_re_spark.streaming.kg_stream import RowLinker

    residue = {"tactic": ["initial_access"], "others": ["Initial Access"]}
    url = "https://example.test/p1"
    residues = spark.createDataFrame(
        [(url, b, v) for b, vs in residue.items() for v in vs],
        "url string, bucket string, value string")

    links = linking.build_links(residues, layer_map)
    best = linking.best_links(links)
    empty_keys = spark.createDataFrame(
        [], "url string, category string, oid_l string")
    batch_residuals = {
        (r["category"], r["original_id"]): r["ner_score"]
        for r in linking._residuals(best, empty_keys).collect()}

    linker = RowLinker(layer_map)
    stream_residuals = {(label, oid): score
                       for (label, oid, score) in linker.apply({}, residue)}
    assert stream_residuals == batch_residuals

    # the planted shape must actually exercise the divergence: some key's
    # struct winner carries a lower s than the key's max(s)
    diverging = [key for key, (winner, max_s) in
                 linker._links_for(residue).items() if winner[1] < max_s]
    assert diverging, "corpus no longer exercises winner-s < max-s"

    # mention-fold side: a mention on a diverging key takes max(s), the
    # batch _annotate rule
    label, oid_l = diverging[0]
    winner, max_s = linker._links_for(residue)[(label, oid_l)]
    results = {label: [{"original_id": winner[7], "NER_score": 0.1,
                        "sentence": "s"}]}
    linker.apply(results, residue)
    assert results[label][0]["NER_score"] == max_s
    assert max_s > winner[1]


def test_doc_pairs_pure_function(layer_map):
    """_doc_pairs folds per-url maxima associatively: planted two-entry
    case with a tie on score resolved by sentence order (Spark struct-max
    tie-break)."""
    from apt_bron_re_spark.streaming.kg_stream import _doc_pairs
    results = {
        "group": [
            {"original_id": "G1", "NER_score": 0.5, "sentence": "abc"},
            {"original_id": "G1", "NER_score": 0.5, "sentence": "abd"},
        ],
        "technique": [
            {"original_id": "T1", "NER_score": 0.9, "sentence": "t"},
        ],
    }
    pairs = _doc_pairs(results, {}, {("group", "technique"): "uses"})
    assert pairs == {("G1", "uses", "T1"): (0.5, "abd")}
