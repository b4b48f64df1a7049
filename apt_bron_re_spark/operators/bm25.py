"""BM25 relevance scoring — A3/A4 in SURVEY.md, fully DataFrame-native.

The reference makes two full passes over the corpus + hit files
(src/data_prep/statistics.py:21-77): pass 1 builds doc lengths, term
frequencies and document frequencies; pass 2 rewrites every hit with

    idf   = ln((m - n + 0.5) / (n + 0.5) + 1)                 (:69)
    score = round(idf * f*(k1+1) / (f + k1*(1-b+b*dl/avgdl)), 4)  (:70-71)

with k1=1.5, b=0.75, key = lower(original_id or name) (:46), and
m = number of corpus documents, dl = \\b\\w+\\b token count of the doc.

Spark mapping: dl is a native expression over docs; tf and df are classic
partial+final hash aggregations; (m, avgdl) is a 1-row aggregate broadcast
back via crossJoin — so the whole thing is two shuffles (tf keyed by
(category,url,key); df keyed by (category,key)) and broadcast joins back.
No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, BM25_LABELS

# Java-regex twin of the reference tokenizer r"\b\w+\b" (statistics.py:28).
_TOKEN_PATTERN = r"\b\w+\b"


def doc_lengths(docs: DataFrame) -> DataFrame:
    """docs(url, text) -> (url, dl): token count per document.

    dl = number of \\w+ runs, computed as a length difference of two
    regexp_replace passes.  NOT size(regexp_extract_all(...)) — that
    materializes every token as a JVM string (~1-2k allocations per page)
    and the GC pressure anti-scales with executor threads (regexp_count is
    a RuntimeReplaceable that rewrites to exactly that, so it doesn't help).
    The pipeline itself gets dl for free from the mention stage
    (mention.doc_lengths_view); this function serves standalone use.
    """
    s = F.lower(F.col("text"))
    collapsed = F.length(F.regexp_replace(s, r"\w+", "#"))
    removed = F.length(F.regexp_replace(s, r"\w+", ""))
    return docs.select("url", (collapsed - removed).cast("int").alias("dl"))


def add_bm25(mentions: DataFrame, docs: DataFrame | None = None,
             k1: float = BM25_K1, b: float = BM25_B,
             labels: list[str] | None = None,
             dls: DataFrame | None = None) -> DataFrame:
    """Attach ``bm25_score`` to mention rows of the scored labels.

    Rows of other categories (cve, ...) pass through with NULL score,
    mirroring the reference which only scores BM25_LABELS
    (statistics.py:36).  Pass ``dls(url, dl)`` when doc lengths were
    already computed upstream (the mention stage emits them for free);
    otherwise they are derived from ``docs(url, text)``.
    """
    labels = labels or BM25_LABELS

    if dls is None:
        dls = doc_lengths(docs)

    # 1-row corpus stats; broadcast-crossjoined (never a driver collect, so
    # the plan stays lazy and resumable).
    stats = dls.agg(
        F.count("*").alias("m"),
        F.avg("dl").alias("avgdl"),
    )

    scored = mentions.filter(F.col("category").isin(labels))
    passthrough = mentions.filter(~F.col("category").isin(labels))

    key_expr = F.lower(F.coalesce(F.col("original_id"), F.col("name"), F.lit("")))

    # A3 stats on NARROW projections only — the wide mention rows (which
    # carry context sentences) are never shuffled for stat computation.
    # tf counts hit entries after dedup, exactly like the reference
    # counting entries in the deduped hit files (statistics.py:37-40).
    tf = (scored.select("category", "url", key_expr.alias("bm25_key"))
          .groupBy("category", "url", "bm25_key")
          .agg(F.count("*").alias("f")))
    df_ = (tf.groupBy("category", "bm25_key")
           .agg(F.count("*").alias("n")))          # tf is 1 row per (url,key)

    score_table = (
        tf.join(df_, ["category", "bm25_key"])
        .join(dls, ["url"], "left")
        .crossJoin(F.broadcast(stats))
        .withColumn("dl", F.coalesce(F.col("dl"), F.col("avgdl")))
        .withColumn(
            "idf",
            F.log((F.col("m") - F.col("n") + 0.5) / (F.col("n") + 0.5) + 1.0))
        .withColumn(
            "denom",
            F.col("f") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        .select(
            "category", "url", "bm25_key",
            F.when(F.col("denom") != 0.0,
                   F.round(F.col("idf") * (F.col("f") * (k1 + 1.0)) / F.col("denom"), 4))
            .otherwise(F.lit(0.0)).alias("bm25_score"))
    )

    # ONE join attaches scores to the wide rows.  The score table scales
    # with the data (1 row per distinct (doc, entity)) so it is shuffle-
    # joined, not broadcast — broadcast builds are serial driver work.
    out = (
        scored.withColumn("bm25_key", key_expr)
        .join(score_table, ["category", "url", "bm25_key"], "left")
        .drop("bm25_key")
    )

    return out.unionByName(
        passthrough.withColumn("bm25_score", F.lit(None).cast("double")))


def bm25_global_stats(mentions: DataFrame, dls: DataFrame,
                      labels: list[str] | None = None
                      ) -> tuple[DataFrame, DataFrame]:
    """The corpus-GLOBAL inputs of BM25, materializable once so chunked
    (per-partition incremental) scoring stays exact: naive per-chunk
    scoring would compute df/m/avgdl from the chunk and produce wrong idf.

    Returns (stats, df_table): stats is the 1-row (m, avgdl); df_table is
    (category, bm25_key, n) document frequencies."""
    labels = labels or BM25_LABELS
    stats = dls.agg(F.count("*").alias("m"), F.avg("dl").alias("avgdl"))
    key_expr = F.lower(F.coalesce(F.col("original_id"), F.col("name"), F.lit("")))
    tf = (mentions.filter(F.col("category").isin(labels))
          .select("category", "url", key_expr.alias("bm25_key"))
          .groupBy("category", "url", "bm25_key")
          .agg(F.count("*").alias("f")))
    df_ = tf.groupBy("category", "bm25_key").agg(F.count("*").alias("n"))
    return stats, df_


def add_bm25_frozen_split(mentions: DataFrame, dls: DataFrame,
                          stats: DataFrame, df_table: DataFrame,
                          k1: float = BM25_K1, b: float = BM25_B,
                          labels: list[str] | None = None
                          ) -> tuple[DataFrame, DataFrame]:
    """``add_bm25`` against FROZEN global stats, returning the scored and
    passthrough branches SEPARATELY (both with a ``bm25_score`` column;
    null on passthrough).  Exact on any url-subset of the corpus (tf and
    dl are url-local; df/m/avgdl come frozen), so an interrupted link
    stage resumes per-bucket with identical scores.

    Partitioning contract: when ``mentions`` is hash-partitioned by url,
    EVERY operation here preserves it — tf's groupBy keys include url, the
    df/stats joins are broadcast, and the score join keys include url on
    both sides — so the whole scoring pass adds zero exchanges and the
    caller can keep the two branches separate (a union would erase the
    partitioning, which is why the batch link stage unions only at the
    very end — plans/pipeline.py build_linked)."""
    labels = labels or BM25_LABELS
    scored = mentions.filter(F.col("category").isin(labels))
    passthrough = mentions.filter(~F.col("category").isin(labels))
    key_expr = F.lower(F.coalesce(F.col("original_id"), F.col("name"), F.lit("")))

    tf = (scored.select("category", "url", key_expr.alias("bm25_key"))
          .groupBy("category", "url", "bm25_key")
          .agg(F.count("*").alias("f")))
    score_table = (
        # dl attach is shuffle_hash too (round 4): both sides are narrow
        # and url-co-partitioned (zero exchange either way), but SMJ would
        # SORT both streams; hashing the one-row-per-url dl side is free.
        tf.join(F.broadcast(df_table), ["category", "bm25_key"])
        .join(dls.hint("shuffle_hash"), ["url"], "left")
        .crossJoin(F.broadcast(stats))
        .withColumn("dl", F.coalesce(F.col("dl"), F.col("avgdl")))
        .withColumn(
            "idf",
            F.log((F.col("m") - F.col("n") + 0.5) / (F.col("n") + 0.5) + 1.0))
        .withColumn(
            "denom",
            F.col("f") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        .select(
            "category", "url", "bm25_key",
            F.when(F.col("denom") != 0.0,
                   F.round(F.col("idf") * (F.col("f") * (k1 + 1.0)) / F.col("denom"), 4))
            .otherwise(F.lit(0.0)).alias("bm25_score"))
    )
    # shuffle_hash, not sort-merge: the LEFT stream is the wide mention
    # rows (sentences) — an SMJ would SORT them, a per-partition O(n log n)
    # pass over wide data that dominates link-stage CPU and thread-scales
    # poorly (GC); the build side is the NARROW score table, whose
    # per-partition hash build is bounded by rows/partitions at any scale.
    # Under matching url partitioning the join stays exchange-free either
    # way; the hint only removes the sorts.
    out = (
        scored.withColumn("bm25_key", key_expr)
        .join(score_table.hint("shuffle_hash"),
              ["category", "url", "bm25_key"], "left")
        .drop("bm25_key")
    )
    return out, passthrough.withColumn("bm25_score", F.lit(None).cast("double"))


def add_bm25_frozen(mentions: DataFrame, dls: DataFrame,
                    stats: DataFrame, df_table: DataFrame,
                    k1: float = BM25_K1, b: float = BM25_B,
                    labels: list[str] | None = None) -> DataFrame:
    """``add_bm25_frozen_split`` with the branches unioned back — the
    standalone / chunked-incremental surface."""
    out, passthrough = add_bm25_frozen_split(
        mentions, dls, stats, df_table, k1=k1, b=b, labels=labels)
    return out.unionByName(passthrough)


def bm25_rank(scored: DataFrame) -> DataFrame:
    """Per (url, category) descending-score rank — the Spark form of the
    reference's per-label sort (statistics.py:72-73, A4)."""
    from pyspark.sql import Window
    w = (Window.partitionBy("url", "category")
         .orderBy(F.desc("bm25_score"), F.asc("index")))
    return scored.withColumn("bm25_rank", F.row_number().over(w))
