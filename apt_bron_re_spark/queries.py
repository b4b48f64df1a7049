"""Driver-contract query registry: Spark implementations + DuckDB oracles.

Each entry re-expresses one operator family from SURVEY.md §2 (or a
training-data-pipeline operator) over the driver's TPC-H-ish tables at
``sf_dir`` so the driver can diff the Spark result against ANSI SQL run by
DuckDB (CORRECTNESS_r{N}.json).  Conventions that make the value-hash
comparison deterministic:

  * every aggregate/computed column is aliased identically in both
    implementations;
  * money sums go through exact integer cents
    (``sum(cast(round(x*100) as bigint))``) so FP summation order can't
    flip a digit;
  * cosine similarities / BM25 scores are computed in double precision
    with identical operand order and rounded (3-4 dp);
  * every result has a deterministic ORDER-insensitive row set (the driver
    sorts before hashing) and deterministic tie-breaks where LIMIT is used.

The ``documents`` table stands in for the KG pipeline's ``pages`` corpus
(FIXTURES.md §6); its texts are space-separated word streams, so the
dictionary-mention analogs tokenize by split(' ').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Dictionary terms for the mention-detection analogs (all appear in the
# corpus vocabulary).
DICT_TERMS = ["spark", "join", "window", "scan", "stream", "merge"]
STOPWORDS = ["the", "a"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tokens(col):
    """Split the space-separated corpus text into tokens."""
    return F.split(F.col(col), " ")


def _terms_df(spark):
    return spark.createDataFrame([(t,) for t in DICT_TERMS], "term string")


def _cents(col):
    return F.sum(F.round(F.col(col) * 100).cast("long"))


def _dot(a, b):
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_TERMS_SQL = ", ".join(f"('{t}')" for t in DICT_TERMS)

# DuckDB token table: one row per (doc_id, lang, source, pos, token), pos
# 0-based to match posexplode.
_TOK_CTE = (
    "tok AS (SELECT doc_id, lang, source, "
    "unnest(string_split(text, ' ')) AS token, "
    "generate_subscripts(string_split(text, ' '), 1) - 1 AS pos "
    "FROM documents)"
)


# ==========================================================================
# A. KG-pipeline analogs over the documents corpus
# ==========================================================================

def q_dict_first_mention(spark, sf_dir):
    """M1 analog: dictionary scan with first-occurrence-per-term semantics
    (reference basic.py:124-131) as posexplode + broadcast join + min(pos)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(_tokens("text")).alias("pos", "token"))
    return (
        toks.join(F.broadcast(_terms_df(spark)),
                  toks.token == F.col("term"))
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("first_pos"))
    )


def q_mention_counts(spark, sf_dir):
    """A5/A6 analog: mention totals per (lang, term) — partial+final agg."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(_tokens("text")).alias("token"))
    return (
        toks.join(F.broadcast(_terms_df(spark)), toks.token == F.col("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("n_mentions"))
    )


def q_bm25_terms(spark, sf_dir):
    """A3/A4: BM25 (k1=1.5, b=0.75, reference statistics.py:69-71) for the
    dictionary terms over documents; exact-integer tf/df/dl inputs."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tokens("text")).alias("token"))
    dl = docs.select("doc_id", F.size(_tokens("text")).alias("dl"))
    stats = dl.agg(F.count("*").alias("m"), F.avg("dl").alias("avgdl"))
    tf = (toks.join(F.broadcast(_terms_df(spark)), toks.token == F.col("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("f")))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("n"))
    k1, b = 1.5, 0.75
    return (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term",
            F.round(
                F.log((F.col("m") - F.col("n") + 0.5) / (F.col("n") + 0.5) + 1.0)
                * (F.col("f") * (k1 + 1.0))
                / (F.col("f") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
                4).alias("bm25"),
        )
    )


def q_except_docs(spark, sf_dir):
    """A9 analog: EXCEPT semantics — docs mentioning 'spark' but not
    'stream' (left_anti join, reference summary_funcs.py:66-115)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens("text")).alias("token"))
    has_spark = toks.filter("token = 'spark'").select("doc_id").distinct()
    has_stream = toks.filter("token = 'stream'").select("doc_id").distinct()
    return has_spark.join(has_stream, "doc_id", "left_anti")


def q_union_dedup(spark, sf_dir):
    """M7 analog: union of two hit sources + dedup (basic.py:202-207)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens("text")).alias("token"))
    a = toks.filter("token = 'scan'").select("doc_id")
    b = toks.filter("token = 'merge'").select("doc_id")
    return a.union(b).distinct()


def q_context_window(spark, sf_dir):
    """A2 analog: fixed-radius character context around the first 'spark'
    occurrence (reference basic.py:343-393 string window)."""
    docs = load(spark, sf_dir, "documents")
    pos = F.locate("spark", F.col("text"))
    return (
        docs.filter(pos > 0)
        .select(
            "doc_id",
            (pos - 1).alias("char_pos"),
            F.substring(F.col("text"),
                        F.greatest(pos - 40, F.lit(1)), F.lit(85))
            .alias("context"),
        )
    )


def q_topk_by_lang(spark, sf_dir):
    """A4 analog: per-group descending sort + top-k via row_number."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars",
                    F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


def q_cooccur_triples(spark, sf_dir):
    """A10 analog: doc-level co-occurrence edges between dictionary terms
    (subj < obj), with source count — the triples groupBy shape."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens("text")).alias("token"))
    hits = (toks.join(F.broadcast(_terms_df(spark)), toks.token == F.col("term"))
            .select("doc_id", "term").distinct())
    a = hits.withColumnRenamed("term", "subj")
    b = hits.withColumnRenamed("term", "obj")
    return (
        a.join(b, "doc_id")
        .filter(F.col("subj") < F.col("obj"))
        .groupBy("subj", "obj")
        .agg(F.countDistinct("doc_id").alias("n_sources"))
    )


# ==========================================================================
# B. Embedding / linking analogs
# ==========================================================================

def q_ann_topk(spark, sf_dir):
    """Similarity search: brute-force cosine top-10 neighbours of vec 0
    (L4's θ-join machinery as a top-k; F.zip_with/F.aggregate dot product)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id = 0").select(
        F.col("embedding").alias("q_emb"))
    return (
        emb.filter("vec_id <> 0")
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label",
                F.round(_cosine(F.col("embedding"), F.col("q_emb")), 3)
                .alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def q_theta_join_sim(spark, sf_dir):
    """L4 θ-join: label-0 x label-1 pairs with cosine >= 0.15 (broadcast
    nested loop; not an equi-join)."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.filter("label = 0").select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    b = emb.filter("label = 1").select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"))
    sim = F.round(_cosine(F.col("a_emb"), F.col("b_emb")), 3)
    return (
        a.crossJoin(F.broadcast(b))
        .select("a_id", "b_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.15)
    )


def q_embedding_norms(spark, sf_dir):
    """Array math: mean L2 norm per label (exact-double fold)."""
    emb = load(spark, sf_dir, "embeddings")
    norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return (
        emb.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(F.round(F.avg("nrm"), 4).alias("avg_norm"),
             F.count("*").alias("n_vecs"))
    )


# ==========================================================================
# C. General relational operators (TPC-H-ish)
# ==========================================================================

def q_tpch_q1(spark, sf_dir):
    """Projection+filter+agg (pricing summary; exact cents sums)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            _cents("l_extendedprice").alias("sum_base_cents"),
            F.count("*").alias("count_order"),
        )
    )


def q_orders_by_nation(spark, sf_dir):
    """3-way join + agg: orders per nation (broadcast dims)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"),
             _cents("o_totalprice").alias("revenue_cents"))
    )


def q_anti_join_customers(spark, sf_dir):
    """S5/A9: customers with no orders (left_anti)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


def q_semi_join_revenue(spark, sf_dir):
    """N4 analog: semi-join — revenue of orders whose customer holds a
    positive balance."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter("c_acctbal > 0")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             _cents("o_totalprice").alias("revenue_cents"))
    )


def q_window_running(spark, sf_dir):
    """Window function: per-customer running order count + cents sum."""
    orders = load(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.count("*").over(w).alias("running_n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w)
        .alias("running_cents"),
    )


def q_events_hourly(spark, sf_dir):
    """Streaming-analog batch: tumbling 1h window counts per event_type
    (same plan Structured Streaming produces for the stream variant)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                   "event_type")
        .agg(F.count("*").alias("n"),
             _cents("value").alias("value_cents"))
    )


def q_part_revenue(spark, sf_dir):
    """Fact ⋈ broadcast dim + agg: revenue cents by part brand."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(_cents("l_extendedprice").alias("revenue_cents"),
             F.count("*").alias("n_items"))
    )


# ==========================================================================
# D. Training-data-pipeline operators
# ==========================================================================

def q_fingerprint_exact(spark, sf_dir):
    """Exact-dedup fingerprint: md5(text) groups + multiplicity."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"))
    )


def q_ngram_jaccard_dups(spark, sf_dir):
    """Near-dup detection: word-set Jaccard >= 0.8 between same-source doc
    pairs (n-gram Jaccard dedup, n=1, blocked by source)."""
    docs = load(spark, sf_dir, "documents")
    sets = docs.select(
        "doc_id", "source",
        F.array_sort(F.array_distinct(_tokens("text"))).alias("toks"))
    a = sets.select(F.col("doc_id").alias("a_id"), "source",
                    F.col("toks").alias("a_toks"))
    b = sets.select(F.col("doc_id").alias("b_id"), "source",
                    F.col("toks").alias("b_toks"))
    jac = (F.size(F.array_intersect("a_toks", "b_toks")).cast("double")
           / F.size(F.array_union("a_toks", "b_toks")))
    return (
        a.join(b, "source")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("source", "a_id", "b_id", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


def q_quality_score(spark, sf_dir):
    """Text-quality scoring: token count, distinct ratio, stopword share."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens("text")
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(n_distinct.cast("double") / n_tok, 4).alias("distinct_ratio"),
        F.round(n_stop.cast("double") / n_tok, 4).alias("stopword_share"),
    )


def q_lang_stats(spark, sf_dir):
    """Language-ID downstream stats: docs + mean length per lang."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.round(F.sum("n_chars").cast("double") / F.count("*"), 2)
             .alias("avg_chars"))
    )


# ==========================================================================
# Oracle SQL (DuckDB dialect = ANSI here)
# ==========================================================================

ORACLES: dict[str, str] = {
    "dict_first_mention": f"""
        WITH {_TOK_CTE}
        SELECT doc_id, term, MIN(pos) AS first_pos
        FROM tok JOIN (VALUES {_TERMS_SQL}) AS d(term)
          ON tok.token = d.term
        GROUP BY doc_id, term
    """,
    "mention_counts": f"""
        WITH {_TOK_CTE}
        SELECT lang, term, COUNT(*) AS n_mentions
        FROM tok JOIN (VALUES {_TERMS_SQL}) AS d(term) ON tok.token = d.term
        GROUP BY lang, term
    """,
    "bm25_terms": f"""
        WITH {_TOK_CTE},
        dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        stats AS (SELECT COUNT(*) AS m, AVG(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS f
          FROM tok JOIN (VALUES {_TERMS_SQL}) AS d(term) ON tok.token = d.term
          GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS n FROM tf GROUP BY term)
        SELECT tf.doc_id, tf.term,
               ROUND(LN((stats.m - df.n + 0.5) / (df.n + 0.5) + 1.0)
                     * (tf.f * 2.5)
                     / (tf.f + 1.5 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
                     4) AS bm25
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
    """,
    "except_docs": f"""
        WITH {_TOK_CTE}
        SELECT DISTINCT doc_id FROM tok WHERE token = 'spark'
        AND doc_id NOT IN (SELECT doc_id FROM tok WHERE token = 'stream')
    """,
    "union_dedup": f"""
        WITH {_TOK_CTE}
        SELECT doc_id FROM tok WHERE token = 'scan'
        UNION
        SELECT doc_id FROM tok WHERE token = 'merge'
    """,
    "context_window": """
        SELECT doc_id,
               strpos(text, 'spark') - 1 AS char_pos,
               substring(text, greatest(strpos(text, 'spark') - 40, 1), 85)
                 AS context
        FROM documents WHERE strpos(text, 'spark') > 0
    """,
    "topk_by_lang": """
        SELECT lang, doc_id, n_chars, rnk FROM (
          SELECT lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id ASC) AS rnk
          FROM documents) t
        WHERE rnk <= 3
    """,
    "cooccur_triples": f"""
        WITH {_TOK_CTE},
        hits AS (
          SELECT DISTINCT doc_id, term
          FROM tok JOIN (VALUES {_TERMS_SQL}) AS d(term) ON tok.token = d.term)
        SELECT a.term AS subj, b.term AS obj,
               COUNT(DISTINCT a.doc_id) AS n_sources
        FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY a.term, b.term
    """,
    "ann_topk": """
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label,
               ROUND(list_inner_product(embedding::DOUBLE[], q_emb::DOUBLE[])
                     / (SQRT(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * SQRT(list_inner_product(q_emb::DOUBLE[], q_emb::DOUBLE[]))),
                     3) AS cos_sim
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    "theta_join_sim": """
        SELECT * FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               ROUND(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                     / (SQRT(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                        * SQRT(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                     3) AS cos_sim
        FROM embeddings a, embeddings b
        WHERE a.label = 0 AND b.label = 1) t
        WHERE cos_sim >= 0.15
    """,
    "embedding_norms": """
        SELECT label,
               ROUND(AVG(SQRT(list_inner_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[]))), 4)
                 AS avg_norm,
               COUNT(*) AS n_vecs
        FROM embeddings GROUP BY label
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_base_cents,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "orders_by_nation": """
        SELECT n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "semi_join_revenue": """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
        GROUP BY o_orderpriority
    """,
    "window_running": """
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER w AS running_n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
                 AS running_cents
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events GROUP BY 1, 2
    """,
    "part_revenue": """
        SELECT p_brand,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "fingerprint_exact": """
        SELECT md5(text) AS text_hash, COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "ngram_jaccard_dups": """
        WITH sets AS (
          SELECT doc_id, source,
                 list_sort(list_distinct(string_split(text, ' '))) AS toks
          FROM documents)
        SELECT * FROM (
        SELECT a.source AS source, a.doc_id AS a_id, b.doc_id AS b_id,
               ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                     / (len(a.toks) + len(b.toks)
                        - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
        FROM sets a JOIN sets b
          ON a.source = b.source AND a.doc_id < b.doc_id) t
        WHERE jaccard >= 0.8
    """,
    "quality_score": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents)
        SELECT doc_id,
               len(toks) AS n_tokens,
               ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
                 AS distinct_ratio,
               ROUND(CAST(len(list_filter(toks, t -> t IN ('the', 'a')))
                          AS DOUBLE) / len(toks), 4) AS stopword_share
        FROM t
    """,
    "lang_stats": """
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
        FROM documents GROUP BY lang
    """,
}

SPARK_QUERIES = {
    "dict_first_mention": q_dict_first_mention,
    "mention_counts": q_mention_counts,
    "bm25_terms": q_bm25_terms,
    "except_docs": q_except_docs,
    "union_dedup": q_union_dedup,
    "context_window": q_context_window,
    "topk_by_lang": q_topk_by_lang,
    "cooccur_triples": q_cooccur_triples,
    "ann_topk": q_ann_topk,
    "theta_join_sim": q_theta_join_sim,
    "embedding_norms": q_embedding_norms,
    "tpch_q1": q_tpch_q1,
    "orders_by_nation": q_orders_by_nation,
    "anti_join_customers": q_anti_join_customers,
    "semi_join_revenue": q_semi_join_revenue,
    "window_running": q_window_running,
    "events_hourly": q_events_hourly,
    "part_revenue": q_part_revenue,
    "fingerprint_exact": q_fingerprint_exact,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "quality_score": q_quality_score,
    "lang_stats": q_lang_stats,
}
