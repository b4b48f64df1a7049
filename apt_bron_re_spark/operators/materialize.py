"""Stage 5 — triple materialization (A10 / S10 in SURVEY.md).

Edge shape per the reference's output spec (README.md:47-58):
``{from, to, source[], justification}`` — the rebuild adds a typed ``pred``
(config.PREDICATE_MAP) and a confidence ``score``.

Pipeline:
  1. per-document *evidence* rows: one row per (url, label, canon_id) with
     the best score + sentence (mentions + residual links, canonicalized);
  2. doc-level co-occurrence pairing restricted to the typed label pairs
     (no quadratic all-pairs blowup);
  3. groupBy (subj, pred, obj) with collect_set(url) as sources — the
     partial+final aggregation Catalyst already optimizes.

Scale notes: the pairing self-join is keyed on url (bounded fan-out: a doc
has few entities); the hub-entity skew shows up in the final groupBy,
which is algebraic (set-union/max) and map-side combined; AQE handles the
rest.  The output table should be partitioned by ``pred`` (S10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PREDICATE_MAP


def evidence(mentions_linked: DataFrame,
             residual_links: DataFrame | None,
             canon: DataFrame | None,
             partitions: int | None = None) -> DataFrame:
    """(url, label, canon_id, score, sentence): best evidence per entity
    per document.  CVE mentions (value, no original_id) use the CVE id.

    ``partitions``: hash-partition by url (pinned count) BEFORE the
    groupBy.  HashPartitioning(url) satisfies the (url, label, canon_id)
    clustering, so the groupBy runs exchange-free, the downstream pairing
    self-join on url reuses the same partitioning on both sides, and the
    two identical join branches share ONE physical exchange
    (ReuseExchange) — collapsing what is otherwise up to four data-sized
    shuffles of sentence-bearing rows into one."""
    m = mentions_linked.select(
        "url",
        F.col("category").alias("label"),
        F.coalesce("original_id", "value").alias("entity_id"),
        F.coalesce("ner_score", F.lit(0.0)).alias("score"),
        "sentence",
    )
    if residual_links is not None:
        m = m.unionByName(residual_links.select(
            "url",
            F.col("category").alias("label"),
            F.col("original_id").alias("entity_id"),
            F.coalesce("ner_score", F.lit(0.0)).alias("score"),
            F.lit(None).cast("string").alias("sentence"),
        ))

    if canon is not None:
        m = (
            m.join(F.broadcast(canon),
                   (m.label == canon.label) & (m.entity_id == canon.original_id),
                   "left")
            .select(m.url, m.label,
                    F.coalesce(canon.canon_id, m.entity_id).alias("canon_id"),
                    m.score, m.sentence)
        )
    else:
        m = m.withColumnRenamed("entity_id", "canon_id")

    if partitions:
        m = m.repartition(partitions, F.col("url"))
    return (
        m.groupBy("url", "label", "canon_id")
        .agg(F.max("score").alias("score"),
             F.max(F.struct(F.col("score").alias("s"), "sentence"))
              .getField("sentence").alias("sentence"))
    )


def materialize_triples(ev: DataFrame,
                        predicate_map: dict | None = None,
                        max_sources: int = 64,
                        n_salts: int = 16) -> DataFrame:
    """evidence -> triples(subj, pred, obj, sources, n_sources,
    justification, score).

    Hub-entity skew handling (north_rule "salted skew handling"): at
    10^12-doc scale a hub edge's source set has millions of urls, so a
    plain collect_set explodes one reducer.  The source list is therefore
    aggregated in TWO salted phases, each memory-bounded:

      phase 1: group by (subj, pred, obj, salt=crc32(url)%n_salts), keep
               only the ``max_sources`` lexicographically-smallest urls;
      phase 2: merge the per-salt lists and keep the smallest
               ``max_sources`` again.

    Because the global k smallest urls are each among their own salt's k
    smallest, the result is EXACTLY the k smallest source urls —
    deterministic and bounded.  ``n_sources`` carries the exact distinct
    source count (algebraic, skew-safe).
    """
    predicate_map = predicate_map or PREDICATE_MAP
    spark = ev.sparkSession
    preds = spark.createDataFrame(
        [(a, b, p) for (a, b), p in predicate_map.items()],
        "subj_label string, obj_label string, pred string")

    a = ev.select(F.col("url"), F.col("label").alias("subj_label"),
                  F.col("canon_id").alias("subj"),
                  F.col("score").alias("subj_score"),
                  F.col("sentence").alias("justification"))
    b = ev.select(F.col("url"), F.col("label").alias("obj_label"),
                  F.col("canon_id").alias("obj"),
                  F.col("score").alias("obj_score"))

    # the pairing self-join is forced to a shuffle join: both sides scale
    # with the data, and an AQE runtime broadcast of the b side (observed
    # at bench scale when stats sit near the threshold) serializes the
    # stage on a driver-side hash build — the bench-scale twin of the
    # "never broadcast data-sized sides" rule.
    pairs = (
        a.join(b.hint("shuffle_merge"), "url")
        .join(F.broadcast(preds), ["subj_label", "obj_label"])
        .filter(F.col("subj") != F.col("obj"))
        .withColumn("pair_score",
                    F.least(F.greatest("subj_score", F.lit(0.0)),
                            F.greatest("obj_score", F.lit(0.0))))
    )

    best_j = F.max(F.struct(F.col("pair_score").alias("s"), "justification"))

    per_salt = (
        pairs
        .withColumn("salt", F.pmod(F.crc32("url"), F.lit(n_salts)))
        .groupBy("subj", "pred", "obj", "salt")
        .agg(
            F.slice(F.sort_array(F.collect_set("url")), 1, max_sources)
             .alias("salt_sources"),
            F.countDistinct("url").alias("salt_n"),
            best_j.alias("bj"),
            F.max("pair_score").alias("salt_score"),
        )
    )

    return (
        per_salt.groupBy("subj", "pred", "obj")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(
                    F.flatten(F.collect_list("salt_sources")))),
                1, max_sources).alias("sources"),
            F.sum("salt_n").alias("n_sources"),
            F.max(F.struct(F.col("bj.s").alias("s"),
                           F.col("bj.justification")))
             .getField("justification").alias("justification"),
            F.round(F.max("salt_score"), 4).alias("score"),
        )
    )


def partial_triples(ev: DataFrame,
                    predicate_map: dict | None = None,
                    max_sources: int = 64,
                    n_salts: int = 16) -> DataFrame:
    """Chunk-local partial triple aggregate for merge-on-append incremental
    materialization.  Because chunks partition the corpus BY URL, every
    per-triple statistic here is mergeable exactly:

      part_sources  k-smallest urls within the chunk (the global k smallest
                    are each within their own chunk's k smallest)
      part_n        exact distinct url count (urls disjoint across chunks)
      part_bj       max (pair_score, justification) struct
      part_score    max pair_score (rounded only at merge time)
    """
    predicate_map = predicate_map or PREDICATE_MAP
    spark = ev.sparkSession
    preds = spark.createDataFrame(
        [(a, b, p) for (a, b), p in predicate_map.items()],
        "subj_label string, obj_label string, pred string")

    a = ev.select(F.col("url"), F.col("label").alias("subj_label"),
                  F.col("canon_id").alias("subj"),
                  F.col("score").alias("subj_score"),
                  F.col("sentence").alias("justification"))
    b = ev.select(F.col("url"), F.col("label").alias("obj_label"),
                  F.col("canon_id").alias("obj"),
                  F.col("score").alias("obj_score"))
    # the pairing self-join is forced to a shuffle join: both sides scale
    # with the data, and an AQE runtime broadcast of the b side (observed
    # at bench scale when stats sit near the threshold) serializes the
    # stage on a driver-side hash build — the bench-scale twin of the
    # "never broadcast data-sized sides" rule.
    pairs = (
        a.join(b.hint("shuffle_merge"), "url")
        .join(F.broadcast(preds), ["subj_label", "obj_label"])
        .filter(F.col("subj") != F.col("obj"))
        .withColumn("pair_score",
                    F.least(F.greatest("subj_score", F.lit(0.0)),
                            F.greatest("obj_score", F.lit(0.0))))
    )
    per_salt = (
        pairs
        .withColumn("salt", F.pmod(F.crc32("url"), F.lit(n_salts)))
        .groupBy("subj", "pred", "obj", "salt")
        .agg(
            F.slice(F.sort_array(F.collect_set("url")), 1, max_sources)
             .alias("salt_sources"),
            F.countDistinct("url").alias("salt_n"),
            F.max(F.struct(F.col("pair_score").alias("s"), "justification"))
             .alias("bj"),
            F.max("pair_score").alias("salt_score"),
        )
    )
    return (
        per_salt.groupBy("subj", "pred", "obj")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(
                    F.flatten(F.collect_list("salt_sources")))),
                1, max_sources).alias("part_sources"),
            F.sum("salt_n").alias("part_n"),
            F.max(F.struct(F.col("bj.s").alias("s"),
                           F.col("bj.justification").alias("justification")))
             .alias("part_bj"),
            F.max("salt_score").alias("part_score"),
        )
    )


def merge_partial_triples(partials: DataFrame,
                          max_sources: int = 64) -> DataFrame:
    """Merge chunk-partial aggregates into final triples — identical output
    to a single-shot materialize_triples over the full evidence table."""
    return (
        partials.groupBy("subj", "pred", "obj")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(
                    F.flatten(F.collect_list("part_sources")))),
                1, max_sources).alias("sources"),
            F.sum("part_n").alias("n_sources"),
            F.max(F.struct(F.col("part_bj.s").alias("s"),
                           F.col("part_bj.justification")))
             .getField("justification").alias("justification"),
            F.round(F.max("part_score"), 4).alias("score"),
        )
    )
