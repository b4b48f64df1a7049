"""Per-partition (bucket-chunk) checkpoint/resume of the mention stage:
interrupt after one chunk, resume, and the final table must equal the
single-shot run (SURVEY.md §5 resume test; north-star per-partition
lineage)."""

import pytest
from pyspark.sql import functions as F

from apt_bron_re_spark.plans.pipeline import Pipeline
from apt_bron_re_spark.sources.pages import pages_df

N_PAGES = 40


def rows_of(df):
    return {(r.url, r.rec_type, r.category, r.original_id, r.value, r["index"])
            for r in df.collect()}


def test_interrupt_and_resume_equals_single_shot(spark, layer_map,
                                                 tmp_path_factory):
    pages = pages_df(spark, N_PAGES)

    # single-shot reference
    base_a = tmp_path_factory.mktemp("inc_a")
    pa = Pipeline(spark, layer_map, base_a, n_buckets=8, fuse_extract=True)
    pa.run(pages)
    want = rows_of(spark.read.parquet(str(base_a / "mentions")))

    # incremental with interruption after 1 of 4 chunks
    base_b = tmp_path_factory.mktemp("inc_b")
    pb = Pipeline(spark, layer_map, base_b, n_buckets=8, fuse_extract=True)
    finished = pb.run_mention_incremental(pages, n_chunks=4, max_chunks=1)
    assert finished is False

    partial = spark.read.parquet(str(base_b / "mentions"))
    assert 0 < partial.count() < len(want)
    done = pb.log.completed_buckets(
        "mention",
        _mention_fp(pb))
    assert 0 < len(done) < 8

    # resume: completes only the missing buckets
    finished = pb.run_mention_incremental(pages, n_chunks=4)
    assert finished is True
    got = rows_of(spark.read.parquet(str(base_b / "mentions")))
    assert got == want

    # the stage is now complete: a further resume is a no-op
    lin_rows = pb.log.metrics().count()
    assert pb.run_mention_incremental(pages) is True
    assert pb.log.metrics().count() == lin_rows

    # and the full pipeline picks the stage up from the checkpoint
    triples_b = pb.run(pages, resume=True)
    pa_triples = pa.run(pages, resume=True)
    ta = {(r.subj, r.pred, r.obj) for r in pa_triples.collect()}
    tb = {(r.subj, r.pred, r.obj) for r in triples_b.collect()}
    assert ta == tb


def _mention_fp(pipe):
    from apt_bron_re_spark.config import NER_MATCH_SCORE
    from apt_bron_re_spark.plans.lineage import fingerprint
    fp0 = fingerprint(pipe._catalog_fp, pipe.lang, "extract")
    return fingerprint(fp0, NER_MATCH_SCORE, "mention", "fused")


def test_link_and_materialize_interrupt_resume(spark, layer_map,
                                               tmp_path_factory):
    """Interrupt the link stage mid-chunk and the materialize stage
    mid-chunk; after resume, the triples table (including sources, scores
    and justifications) must equal the single-shot pipeline's output —
    chunked link scores against FROZEN global BM25 stats and chunked
    materialize merges exact partial aggregates."""
    pages = pages_df(spark, N_PAGES)

    base_a = tmp_path_factory.mktemp("lm_a")
    pa = Pipeline(spark, layer_map, base_a, n_buckets=8, fuse_extract=True)
    want = {(r.subj, r.pred, r.obj):
            (tuple(sorted(r.sources)), r.n_sources, r.justification, r.score)
            for r in pa.run(pages).collect()}

    base_b = tmp_path_factory.mktemp("lm_b")
    pb = Pipeline(spark, layer_map, base_b, n_buckets=8, fuse_extract=True)
    assert pb.run_mention_incremental(pages, n_chunks=2) is True

    # link: interrupt after 1 of 4 chunks, then resume
    assert pb.run_link_incremental(n_chunks=4, max_chunks=1) is False
    _fp0, _fp1, fp2, _fp3, fp4 = pb._fps()
    done = pb.log.completed_buckets("link", fp2)
    assert 0 < len(done) < 8
    assert pb.run_link_incremental(n_chunks=4) is True

    # materialize: interrupt after 1 of 4 chunks, then resume
    assert pb.run_materialize_incremental(n_chunks=4, max_chunks=1) is False
    assert pb.run_materialize_incremental(n_chunks=4) is True

    got = {(r.subj, r.pred, r.obj):
           (tuple(sorted(r.sources)), r.n_sources, r.justification, r.score)
           for r in pb.triples().collect()}
    assert got == want

    # the full pipeline recognizes every stage as complete (no rebuild)
    lin_rows = pb.log.metrics().count()
    pb.run(pages, resume=True)
    assert pb.log.metrics().count() == lin_rows
