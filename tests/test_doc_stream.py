"""Streaming training-data operators: per-row signature expressions must
equal the batch groupBy implementations, and streaming exact dedup must
keep exactly one row per distinct text."""

import pytest
from pyspark.sql import functions as F

from apt_bron_re_spark.operators import dedup
from apt_bron_re_spark.streaming.doc_stream import (
    minhash_signature_expr,
    simhash_expr,
    stream_documents,
    stream_exact_dedup,
    stream_text_features,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_expr_signatures_equal_batch_aggs(spark):
    docs = spark.read.parquet(SF_DOCS).limit(100).cache()

    got_min = {r.doc_id: tuple(r.sig) for r in docs.select(
        "doc_id", minhash_signature_expr(F.col("text")).alias("sig")).collect()}
    want_min = {r.doc_id: tuple(r.sig)
                for r in dedup.minhash_signatures(docs).collect()}
    assert got_min == want_min

    got_sim = {r.doc_id: r.sh for r in docs.select(
        "doc_id", simhash_expr(F.col("text")).alias("sh")).collect()}
    want_sim = {r.doc_id: r.simhash60 for r in dedup.simhash(docs).collect()}
    assert got_sim == want_sim


def test_streaming_features_and_dedup(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("docs_stream"))
    docs = (spark.read.parquet(SF_DOCS).limit(60)
            .withColumn("created_at",
                        F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,doc_id)"))
            .cache())
    # two drops; the second re-delivers 20 duplicate texts with new ids
    docs.write.mode("append").parquet(src)
    (docs.limit(20)
     .withColumn("doc_id", F.col("doc_id") + 100000)
     .withColumn("created_at", F.col("created_at") + F.expr("interval 1 minute"))
     .write.mode("append").parquet(src))

    stream = stream_documents(spark, src, max_files_per_trigger=2)

    feats = stream_text_features(stream)
    ckpt1 = str(tmp_path_factory.mktemp("ckpt_f"))
    q1 = (feats.writeStream.format("memory").queryName("doc_feats")
          .outputMode("append").option("checkpointLocation", ckpt1)
          .trigger(availableNow=True).start())
    q1.awaitTermination(300)
    got = spark.table("doc_feats")
    assert got.count() == 80
    # stream features equal batch features for the same doc
    one = got.filter("doc_id = 0").first()
    batch_sig = dedup.minhash_signatures(docs.filter("doc_id = 0")).first()
    assert tuple(one.minhash_sig) == tuple(batch_sig.sig)

    deduped = stream_exact_dedup(stream_documents(spark, src),
                                 watermark="10 days")
    ckpt2 = str(tmp_path_factory.mktemp("ckpt_d"))
    q2 = (deduped.writeStream.format("memory").queryName("doc_dedup")
          .outputMode("append").option("checkpointLocation", ckpt2)
          .trigger(availableNow=True).start())
    q2.awaitTermination(300)
    out = spark.table("doc_dedup")
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert out.count() == n_distinct
    assert out.select("text_hash").distinct().count() == n_distinct
