"""Summary / analytics operators over the mention tables — A5-A9 in
SURVEY.md (reference src/nodes_extraction/summary_funcs.py).

All pure DataFrame aggregations (partial+final hash agg, window ranks,
anti-joins); the reference's file/PNG sinks become result DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def per_report_counts(mentions: DataFrame) -> DataFrame:
    """A5 (summary_funcs.py:8-24): hit counts per (url, category)."""
    return (mentions.groupBy("url", "category")
            .agg(F.count("*").alias("n_hits")))


def global_totals(mentions: DataFrame) -> DataFrame:
    """A6 (summary_funcs.py:27-63): totals per category across the corpus."""
    return (mentions.groupBy("category")
            .agg(F.count("*").alias("n_hits"),
                 F.countDistinct("url").alias("n_reports")))


def problematic_names(scored: DataFrame, threshold: float = 1.0,
                      max_above_ratio: float = 0.5) -> DataFrame:
    """A7 (summary_funcs.py:118-166): names whose BM25 scores are mostly
    under the threshold, with the above-threshold exceptions collected."""
    base = (
        scored
        .filter(F.col("bm25_score").isNotNull() & F.col("name").isNotNull())
        .select("category",
                F.lower(F.trim(F.col("name"))).alias("name"),
                "url", "bm25_score")
    )
    return (
        base.groupBy("category", "name")
        .agg(
            F.count("*").alias("total"),
            F.count_if(F.col("bm25_score") < threshold).alias("under"),
            F.sort_array(F.collect_list(
                F.when(F.col("bm25_score") >= threshold,
                       F.struct("url", "bm25_score")))).alias("exceptions"),
        )
        .filter((F.col("under") / F.col("total")) >= (1.0 - max_above_ratio))
    )


def bm25_statistics(scored: DataFrame, threshold: float = 1.0) -> DataFrame:
    """A8 (summary_funcs.py:169-250): per (category, name) mean/stddev and
    above/below-threshold counts; names with n>=2 and not always-above."""
    base = (
        scored
        .filter(F.col("bm25_score").isNotNull() & F.col("name").isNotNull())
        .select("category",
                F.lower(F.trim(F.col("name"))).alias("name"), "bm25_score")
    )
    stats = (
        base.groupBy("category", "name")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("bm25_score"), 4).alias("mean_score"),
            F.round(F.stddev_samp("bm25_score"), 4).alias("stddev_score"),
            F.count_if(F.col("bm25_score") >= threshold).alias("above"),
            F.count_if(F.col("bm25_score") < threshold).alias("below"),
        )
        .filter(F.col("n") >= 2)
        .withColumn("ratio_above",
                    F.round(F.col("above") / F.col("n"), 4))
        .filter(F.col("ratio_above") < 1.0)
    )
    w = Window.partitionBy("category").orderBy(F.desc("mean_score"), "name")
    return stats.withColumn("rank_in_category", F.row_number().over(w))


def _alias_norm(col):
    """Reference-parity text normalization for alias matching: lowercase
    and collapse every non-alphanumeric run to a single space, so any
    non-alnum character is a match boundary (compare_groups_and_aliases
    .py:65-74 lowercases and requires non-alnum chars on both sides of a
    hit)."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")


def alias_coverage(docs: DataFrame, alias_catalog: DataFrame) -> DataFrame:
    """Alias-coverage diagnostic — the analog of the reference's
    group/alias comparison harness (tests/compare_groups_and_aliases.py:
    65-104): per document, the number of DISTINCT groups hit via their
    name, via MITRE aliases and via Malpedia aliases, plus the
    alias-without-name flag (1 when some group matched ONLY through its
    aliases — the signal the reference harness surfaces per report).

    ``docs``: (doc_id, text); ``alias_catalog``: (grp, kind, term) with
    kind in {name, mitre, malpedia} — catalog-sized, broadcast.
    Matching is REFERENCE-PARITY (round-5 ADVICE): both sides are
    lowercased and tokenized on non-alphanumeric boundaries, so "Spark,"
    matches the term "spark" exactly as the reference's automaton +
    non-alnum-boundary check does.  Terms may be MULTI-WORD phrases: a
    phrase matches when its (normalized) tokens appear consecutively in
    the normalized document.  One DELIBERATE divergence remains: a term
    with INTERIOR punctuation (e.g. "apt-28") normalizes to its token
    sequence ("apt 28"), so it also matches "apt_28"/"apt 28" in text,
    where the reference would require the literal interior character —
    looser, never tighter.  Every document gets a row (the reference
    writes a summary entry per file), zero counts included.

    Scale notes: one broadcast FIRST-token join prefilters linearly in
    corpus tokens; only the sparse (catalog-selectivity-bounded)
    multi-word candidates rejoin the doc text for the consecutive-token
    verify — never a docs x catalog scan.  distinct() before the
    per-group rollup bounds the shuffle at one row per (doc, group,
    kind)."""
    cat = (alias_catalog
           .select("grp", "kind",
                   F.trim(_alias_norm(F.col("term"))).alias("term"))
           .select(
               "grp", "kind", "term",
               F.element_at(F.split(F.col("term"), " "), 1)
                .alias("first_tok"),
               (F.instr(F.col("term"), " ") > 0).alias("is_multi")))
    docs_n = docs.select("doc_id", _alias_norm(F.col("text")).alias("text"))
    toks = docs_n.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    cand = (toks.join(F.broadcast(cat), toks.token == cat.first_tok)
            .select("doc_id", "grp", "kind", "term", "is_multi").distinct())
    single = cand.filter(~F.col("is_multi")).select("doc_id", "grp", "kind")
    # consecutive-token phrase check: with space-split tokenization of the
    # normalized text, ' '+text+' ' containing ' '+term+' ' <=> the
    # phrase's tokens appear consecutively (normalized text reconstructs
    # exactly as the space-join of its tokens)
    multi = (cand.filter(F.col("is_multi"))
             .join(docs_n, "doc_id")
             .filter(F.instr(F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
                             F.concat(F.lit(" "), F.col("term"), F.lit(" ")))
                     > 0)
             .select("doc_id", "grp", "kind"))
    hits = single.unionByName(multi).distinct()
    per_group = hits.groupBy("doc_id", "grp").agg(
        F.max((F.col("kind") == "name").cast("int")).alias("name_hit"),
        F.max((F.col("kind") == "mitre").cast("int")).alias("mitre_hit"),
        F.max((F.col("kind") == "malpedia").cast("int")).alias("malpedia_hit"))
    per_doc = per_group.groupBy("doc_id").agg(
        F.sum("name_hit").cast("long").alias("group_name_hits"),
        F.sum("mitre_hit").cast("long").alias("mitre_alias_hits"),
        F.sum("malpedia_hit").cast("long").alias("malpedia_alias_hits"),
        F.max(F.when(((F.col("mitre_hit") + F.col("malpedia_hit")) > 0)
                     & (F.col("name_hit") == 0), 1).otherwise(0))
         .cast("long").alias("alias_without_name"))
    return (docs.select("doc_id").distinct()
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("group_name_hits", F.lit(0))
                     .alias("group_name_hits"),
                    F.coalesce("mitre_alias_hits", F.lit(0))
                     .alias("mitre_alias_hits"),
                    F.coalesce("malpedia_alias_hits", F.lit(0))
                     .alias("malpedia_alias_hits"),
                    F.coalesce("alias_without_name", F.lit(0))
                     .alias("alias_without_name")))


def ablation_differences(mentions_a: DataFrame, mentions_b: DataFrame
                         ) -> DataFrame:
    """A9 (summary_funcs.py:66-115): per (url, category), entity ids only
    in pipeline A vs only in pipeline B (two anti-joins, UNION of keys)."""
    def keys(df: DataFrame, side: str) -> DataFrame:
        return (df.select(
            "url", "category",
            F.lower(F.coalesce("original_id", "value", F.lit("")))
            .alias("entity_id"))
            .distinct()
            .withColumn("side", F.lit(side)))

    a, b = keys(mentions_a, "only_a"), keys(mentions_b, "only_b")
    only_a = a.join(b.drop("side"), ["url", "category", "entity_id"],
                    "left_anti")
    only_b = b.join(a.drop("side"), ["url", "category", "entity_id"],
                    "left_anti")
    return only_a.unionByName(only_b)
