"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction-shaped query on the
driver's sf0.001 tables; ``queries()``/``oracle_sql()`` expose the operator
registry in apt_bron_re_spark/queries.py (one entry per operator family
from SURVEY.md §2 + the training-data-pipeline operators), each verified
against its DuckDB oracle by tests/test_oracle_parity.py before the driver
ever sees it.  Entries without an oracle are genuinely non-SQL-expressible
(iterative connected components, the full 5-stage pipeline, MinHash-LSH
banding with Python hash UDFs).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from apt_bron_re_spark.queries import ORACLES, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dictionary-mention extraction over the document corpus ->
    doc-level co-occurrence edges (subj, obj, n_sources) — the KG pipeline
    shape (extract -> mention -> materialize) on the driver's tables."""
    from apt_bron_re_spark.queries import q_cooccur_triples
    return q_cooccur_triples(spark, "/root/testdata/sf0.001")


def _non_oracle_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Iterative / UDF-hash operators the DuckDB oracle can't express."""

    def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
        # The full 5-stage KG pipeline on the deterministic synthetic page
        # corpus (independent of sf_dir; scale pinned for the rows-check).
        import tempfile

        from apt_bron_re_spark.catalog.synthetic import build_layer_map
        from apt_bron_re_spark.plans.pipeline import Pipeline
        from apt_bron_re_spark.sources.pages import pages_df

        base = tempfile.mkdtemp(prefix="kg_triples_")
        pipe = Pipeline(spark, build_layer_map(), base, n_buckets=8)
        return pipe.run(pages_df(spark, 60))

    def connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
        # CC over the bipartite user/event-type graph of the events table.
        from pyspark.sql import functions as F

        from apt_bron_re_spark.operators.canonicalize import (
            connected_components as cc,
        )
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        edges = ev.select(
            F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
            F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
        ).distinct()
        return cc(edges)

    def minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        from apt_bron_re_spark.operators.dedup import minhash_candidates
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_candidates(docs)

    def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
        from apt_bron_re_spark.operators.dedup import simhash
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return simhash(docs)

    def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
        from apt_bron_re_spark.operators.multimodal import synth_assets, asset_features
        return asset_features(synth_assets(spark, 200))

    def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from apt_bron_re_spark.operators.similarity import lsh_topk
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries_df = (emb.filter("vec_id < 5")
                      .select(F.col("vec_id").alias("q_id"),
                              F.col("embedding").alias("q_emb")))
        dim = len(emb.select("embedding").first()[0])
        return lsh_topk(emb, queries_df, dim=dim, k=5)

    def shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
        from apt_bron_re_spark.operators.textstats import shared_passage_pairs
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return shared_passage_pairs(docs, min_shared=2)

    def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
        from apt_bron_re_spark.operators.textstats import language_id
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return language_id(docs)

    return {
        "kg_triples": kg_triples,
        "connected_components": connected_components,
        "minhash_dedup": minhash_dedup,
        "simhash_docs": simhash_docs,
        "multimodal_meta": multimodal_meta,
        "ann_lsh_topk": ann_lsh_topk,
        "shared_passages": shared_passages,
        "lang_id_pred": lang_id_pred,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in SPARK_QUERIES.items():
        out[name] = fn
    out.update(_non_oracle_queries())
    return out


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
