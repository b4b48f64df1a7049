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


# Inputs smaller than this get their parquet footers inspected for the
# unsplittable-scan guard below; bigger inputs skip both the metadata
# read and the repartition (web-scale inputs always have enough row
# groups, and footer-listing millions of files is driver-side work the
# guard must never add).
_SPREAD_MAX_BYTES = 256 * 1024 * 1024


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load`` + the optimization guide §2.5 unsplittable-input fix.

    A parquet scan parallelizes across ROW GROUPS, not byte splits: the
    bench's sf tables are single-row-group single files, so every
    downstream per-row expression (md5 shingle hashing, simhash bit
    sums, fingerprint UDFs) runs on ONE task regardless of split math —
    measured as the permanent ``(31 + 1)/32`` straggler that made
    minhash signatures 9 s at sf1.0.  When the driver-side footer
    metadata (milliseconds, and only consulted for inputs under
    _SPREAD_MAX_BYTES) shows fewer row groups than half the session
    cores, repartition once right after the read so the heavy per-row
    stage spreads.  At scale the gate never fires — large inputs carry
    hundreds of row groups and take the plain scan with no extra
    shuffle."""
    df = load(spark, sf_dir, name)
    try:
        import os

        import pyarrow.parquet as pq
        path = f"{sf_dir}/{name}.parquet"
        files = ([os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(".parquet")]
                 if os.path.isdir(path) else [path])
        if sum(os.path.getsize(f) for f in files) > _SPREAD_MAX_BYTES:
            return df
        row_groups = sum(pq.ParquetFile(f).num_row_groups for f in files)
        cores = spark.sparkContext.defaultParallelism
        if row_groups < max(2, cores // 2):
            return df.repartition(cores)
    except Exception:
        pass          # metadata unreadable -> plain scan, never fail
    return df


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
    nested loop; not an equi-join).

    Round 7: executed by similarity.cosine_cross_pairs — the same
    broadcast-nested-loop shape (b-side driver-collected, as
    F.broadcast already did), but the O(|a| x |b|) cosine folds run as
    numpy batch kernels in a mapInPandas over the a-side instead of
    per-row interpreted zip_with/aggregate on the scan's 1-2 file
    splits.  The kernel accumulates in the fold's exact IEEE order and
    round+filter stay in Spark, so the result rows are bit-identical
    (sf1.0 measured 82.7 s -> sub-second; hash-verified unchanged)."""
    from .operators.similarity import cosine_cross_pairs
    emb = load(spark, sf_dir, "embeddings")
    a = emb.filter("label = 0").select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    b = emb.filter("label = 1").select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"))
    return cosine_cross_pairs(a, b, threshold=0.15, round_dp=3)


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
    """FIXTURE-SCALE VERIFIER ONLY — quadratic per source block (5 source
    values), kept as the exhaustive ground-truth for the LSH plans; it
    dies at web scale.  The recommended near-dup plan is
    ``near_dup_pipeline`` (MinHash-LSH candidates -> exact Jaccard
    verify), whose candidate volume is near-linear.

    Near-dup detection: word-set Jaccard >= 0.8 between same-source doc
    pairs (n-gram Jaccard dedup, n=1, blocked by source).

    Round 7: still the exhaustive all-pairs-per-block computation, but
    the per-pair set algebra is vectorized — each source block becomes
    one applyInPandas task that dictionary-encodes its token sets into
    a dense membership matrix B and gets EVERY pair's intersection size
    from one matmul (B @ B.T; counts are exact integers in float64).
    jaccard = i/(na+nb-i) divides the same two exact integers the old
    array_intersect/array_union expressions produced (the toks arrays
    are distinct, so |union| = na+nb-i), so the quotient double is
    bit-identical, and round+threshold stay in Spark.  The Python-side
    gate (raw >= 0.7999) is a strict superset of the rounded >= 0.8
    filter (HALF_UP boundary 0.79995), NaN kept.  The 62.5M JVM
    array-set evaluations at sf1.0 (measured 626 s) collapse to 20
    block matmuls.  The dense B assumes a bounded per-block vocabulary
    (true here; a web-scale corpus uses the LSH plan
    ``near_dup_pipeline`` — this stays the fixture-scale verifier)."""
    import numpy as np
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    # Pin the block layout with REPARTITION_BY_NUM *before* tokenizing:
    # the explicit HashPartitioning(source, 256) satisfies the
    # applyInPandas clustering requirement (no second exchange), AQE
    # cannot coalesce a numbered repartition (the byte-light but
    # compute-heavy blocks otherwise collapse onto ~6 tasks under the
    # 64 MB advisory size), and tokenization runs in the 256-task stage
    # instead of the unsplittable 1-2-split scan.  20 source keys over
    # 256 slots hash near-collision-free; empty partitions are no-ops.
    sets = docs.repartition(256, F.col("source")).select(
        "doc_id", "source",
        F.array_distinct(_tokens("text")).alias("toks"))

    def block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["doc_id"].to_numpy()
        toks = pdf["toks"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=str),
                 "a_id": pd.Series([], dtype=np.int64),
                 "b_id": pd.Series([], dtype=np.int64),
                 "jac": pd.Series([], dtype=np.float64)})
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        codes = np.unique(np.concatenate(toks), return_inverse=True)[1]
        B = np.zeros((n, codes.max() + 1))
        B[np.repeat(np.arange(n), lens), codes] = 1.0
        sizes = lens.astype(np.float64)     # toks are distinct per doc
        a_out, b_out, j_out = [], [], []
        chunk = max(32, 4_000_000 // max(n, 1))   # bound the pair slabs
        for s in range(0, n, chunk):
            inter = B[s:s + chunk] @ B.T
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = inter / (sizes[s:s + chunk, None] + sizes[None, :]
                               - inter)
                keep = ~(jac < 0.7999)      # NaN-inclusive superset
            keep &= ids[s:s + chunk, None] < ids[None, :]
            ii, jj = np.nonzero(keep)
            a_out.append(ids[s:s + chunk][ii])
            b_out.append(ids[jj])
            j_out.append(jac[ii, jj])
        return pd.DataFrame({
            "source": pdf["source"].iat[0],
            "a_id": np.concatenate(a_out),
            "b_id": np.concatenate(b_out),
            "jac": np.concatenate(j_out)})

    raw = sets.groupBy("source").applyInPandas(
        block, "source string, a_id bigint, b_id bigint, jac double")
    return (raw.select("source", "a_id", "b_id",
                       F.round("jac", 4).alias("jaccard"))
            .filter(F.col("jaccard") >= 0.8))


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


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-threshold stratified sampling
    (textstats.stratified_sample): keep 50% of en docs, 20% of de, 10%
    of every other language — reproducibly, via a scan-local filter on
    md5(doc_id) hex buckets (no shuffle, no RNG; the same rows come
    back on every run, engine, and partitioning)."""
    from .operators.textstats import stratified_sample
    docs = load(spark, sf_dir, "documents")
    return (stratified_sample(docs, "doc_id", "lang",
                              {"en": 0.5, "de": 0.2}, default_rate=0.1)
            .select("doc_id", "lang", "sample_bucket"))


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


def q_lang_id_pred(spark, sf_dir):
    """Heuristic language-ID operator (textstats.language_id): argmax
    profile-stopword share per doc."""
    from .operators.textstats import language_id
    return language_id(load(spark, sf_dir, "documents"))


def q_connected_components(spark, sf_dir):
    """L6-CC: iterative min-label connected components over the bipartite
    user/event-type graph of the events table (canonicalize.py).

    Round 7: opts into the size-adaptive driver path — the DISTINCT
    (user, event_type) edge list is dimension-sized (|users| x a handful
    of event types; 75k rows at sf1.0), so after the one distinct
    aggregation Spark must run anyway, union-find resolves it in
    microseconds instead of ~25 shuffle rounds' fixed latencies.  Graphs
    over the 1M-edge cap take the distributed salted path unchanged."""
    from .operators.canonicalize import connected_components as cc
    ev = load(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    return cc(edges, driver_max_edges=1_000_000)


def q_minhash_dedup(spark, sf_dir):
    """MinHash-LSH candidate pairs over documents (dedup.py) — md5-based
    shingle hashes + MLlib-prime permutations, value-matched by the oracle."""
    from .operators.dedup import minhash_candidates
    return minhash_candidates(load_spread(spark, sf_dir, "documents"))


def q_simhash_docs(spark, sf_dir):
    """60-bit SimHash per document (dedup.simhash)."""
    from .operators.dedup import simhash
    return simhash(load_spread(spark, sf_dir, "documents"))


def q_shared_passages(spark, sf_dir):
    """Fingerprint anchors (Rabin-Karp 16-char windows, h%32==0) shared
    between docs (textstats.shared_passage_pairs, min_shared=2)."""
    from .operators.textstats import shared_passage_pairs
    return shared_passage_pairs(load_spread(spark, sf_dir, "documents"),
                                min_shared=2)


def q_ann_lsh_topk(spark, sf_dir):
    """Multi-table OR-amplified LSH ANN: top-5 neighbours of vec_id < 5
    (similarity.lsh_topk; integer-quantized signatures so the bucket
    assignment is engine-exact)."""
    from .operators.similarity import lsh_topk
    emb = load(spark, sf_dir, "embeddings")
    queries_df = (emb.filter("vec_id < 5")
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_emb")))
    return lsh_topk(emb, queries_df, dim=64, k=5)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN: sampled-centroid coarse quantization (every 25th vec_id),
    probe the 5 nearest centroids per query, exact re-rank
    (similarity.ivf_topk; integer-quantized assignment is engine-exact)."""
    from .operators.similarity import ivf_topk
    emb = load(spark, sf_dir, "embeddings")
    queries_df = (emb.filter("vec_id < 5")
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_emb")))
    return ivf_topk(emb, queries_df, k=5, centroid_stride=25, nprobe=5)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs: OR-amplified sign-LSH candidates,
    exact cosine >= 0.4 verify (similarity.embedding_near_pairs).

    Explicit WIDE buckets (20x4) + low threshold because the synthetic
    embeddings are near-uniform (no true near-dups exist): the operator's
    defaults (16x10, cos>=0.9) are the scale regime."""
    from .operators.similarity import embedding_near_pairs
    return embedding_near_pairs(load(spark, sf_dir, "embeddings"),
                                dim=64, threshold=0.4,
                                n_tables=20, n_planes=4)


def q_near_dup_pipeline(spark, sf_dir):
    """The headline near-dup query: LSH candidate generation -> exact
    n-gram-Jaccard verification (scale path; replaces the blocked all-pairs
    ngram_jaccard_dups as the recommended plan)."""
    from .operators.dedup import minhash_candidates, ngram_jaccard_pairs
    docs = load_spread(spark, sf_dir, "documents")
    cands = minhash_candidates(docs).select("a_id", "b_id")
    return ngram_jaccard_pairs(docs, cands, threshold=0.8)


def q_near_dup_clusters(spark, sf_dir):
    """Dedup CLUSTERING — the full production near-dup decision: LSH
    candidates (minhash_candidates) -> exact word-set Jaccard >= 0.8
    verify (ngram_jaccard_pairs) -> connected components over the
    verified-pair graph (canonicalize.connected_components) -> one
    canonical representative per cluster (min doc_id; every other member
    is a drop candidate).  Output: (doc_id, cluster_id,
    is_representative) for every doc in at least one verified pair.

    Scale notes: candidates are LSH-bucketed (never all-pairs); CC is the
    salted pointer-jumping operator (rounds ~ log2 of cluster diameter —
    near-dup clusters are shallow).  doc_ids ride through CC zero-padded
    so the operator's string min-label equals the numeric min."""
    from .operators.canonicalize import connected_components as cc
    from .operators.dedup import minhash_candidates, ngram_jaccard_pairs
    docs = load_spread(spark, sf_dir, "documents")
    cands = minhash_candidates(docs).select("a_id", "b_id")
    verified = ngram_jaccard_pairs(docs, cands, threshold=0.8)
    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
    # partitions=4: the verified-pair graph is tiny relative to the
    # corpus (near-dup clusters are rare), and CC pays its per-round
    # task-launch latency times the shuffle width — size the width to
    # the graph, not the session (the operator docstring's contract; a
    # 100 TB caller passes a larger value).  Round 7: ALSO opts into
    # the driver union-find path — the verified-pair list is the
    # dimension-sized survivor set of the LSH->verify funnel (47 rows
    # at sf0.1), so the driver probe replaces ~5 pointer-jumping rounds
    # of fixed job latency; a >1M-edge pair graph falls back to the
    # distributed path with these same knobs.
    comp = cc(verified.select(pad("a_id").alias("src"),
                              pad("b_id").alias("dst")), partitions=4,
              driver_max_edges=1_000_000)
    return comp.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_representative"))


def q_bm25_rank(spark, sf_dir):
    """A4: per-doc descending BM25 rank of the dictionary terms
    (bm25.bm25_rank shape)."""
    base = q_bm25_terms(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return base.withColumn("rnk", F.row_number().over(w))


def q_problematic_terms(spark, sf_dir):
    """A7 (summaries.problematic_names shape): (lang, term) whose BM25
    scores are mostly under threshold 1.0, with exception counts."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    base = q_bm25_terms(spark, sf_dir).join(docs, "doc_id")
    return (
        base.groupBy("lang", "term")
        .agg(F.count("*").alias("total"),
             F.count_if(F.col("bm25") < 1.0).alias("under"),
             F.count_if(F.col("bm25") >= 1.0).alias("n_exceptions"))
        .filter((F.col("under") / F.col("total")) >= 0.5)
    )


# Alias-coverage diagnostic catalog (reference tests/
# compare_groups_and_aliases.py): synthetic groups whose name / MITRE /
# Malpedia alias terms are drawn from the corpus vocabulary.  APT-DUP's
# name ("dup", ~5% of docs) is much rarer than its Malpedia alias
# ("filter", ~77%), so the alias-without-name flag fires on real rows.
ALIAS_CATALOG = [
    ("APT-SPARK", "name", "spark"),
    ("APT-SPARK", "mitre", "merge"),
    ("APT-SPARK", "malpedia", "vector"),
    ("APT-JOIN", "name", "join"),
    ("APT-JOIN", "mitre", "hash"),
    ("APT-JOIN", "malpedia", "window"),
    ("APT-STREAM", "name", "stream"),
    ("APT-STREAM", "mitre", "batch"),
    ("APT-DUP", "name", "dup"),
    ("APT-DUP", "malpedia", "filter"),
    # multi-word phrase terms (round 5): consecutive-token match
    ("APT-PHRASE", "name", "hash join"),
    ("APT-PHRASE", "mitre", "stream batch"),
]


def q_alias_coverage(spark, sf_dir):
    """Alias-coverage diagnostic (reference tests/
    compare_groups_and_aliases.py:65-104): per document, distinct groups
    hit via name vs MITRE vs Malpedia alias terms + the
    alias-without-name flag."""
    from .operators.summaries import alias_coverage
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cat = spark.createDataFrame(ALIAS_CATALOG,
                                "grp string, kind string, term string")
    return alias_coverage(docs, cat)


def q_bm25_stats(spark, sf_dir):
    """A8 (summaries.bm25_statistics shape): per-term mean/stddev +
    above/below-threshold counts, ranked by mean score."""
    base = q_bm25_terms(spark, sf_dir)
    stats = (
        base.groupBy("term")
        .agg(F.count("*").alias("n"),
             # 3dp, not 4: AVG/STDDEV sum in engine-specific order, so the
             # last ulp can differ between Spark and the DuckDB oracle; a
             # coarser grid makes a boundary flip ~10x less likely (the
             # documented float-tolerance policy; see also lsh/ivf cos_sim)
             F.round(F.avg("bm25"), 3).alias("mean_score"),
             F.round(F.stddev_samp("bm25"), 3).alias("stddev_score"),
             F.count_if(F.col("bm25") >= 1.0).alias("above"),
             F.count_if(F.col("bm25") < 1.0).alias("below"))
        .filter(F.col("n") >= 2)
        .withColumn("ratio_above", F.round(F.col("above") / F.col("n"), 4))
        .filter(F.col("ratio_above") < 1.0)
    )
    w = Window.orderBy(F.desc("mean_score"), F.asc("term"))
    return stats.withColumn("rnk", F.row_number().over(w))


# ==========================================================================
# Oracle SQL (DuckDB dialect = ANSI here)
# ==========================================================================

# --- shared fragments for the hash-parity oracles ------------------------
# Whitespace tokens with Python-str.split() semantics.
_WORDS_SQL = r"list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')"

def _minhash_cte() -> str:
    """CTE chain computing the exact MinHash signatures of dedup.py:
    60-bit md5 shingle hash mod MLlib prime, (a*h+b) mod p permutations."""
    from .operators.dedup import (MINHASH_PRIME, N_PERM, SHINGLE_K,
                                  _perm_params)
    a, b = _perm_params()
    return f"""
        tk AS (SELECT doc_id, {_WORDS_SQL} AS tk FROM documents),
        sh AS (SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, greatest(len(tk)-{SHINGLE_K-1}, 1)),
                   i -> array_to_string(tk[i:i+{SHINGLE_K-1}], ' '))) AS shingle
               FROM tk),
        hh AS (SELECT doc_id,
                 ('0x'||substr(md5(shingle),1,15))::BIGINT % {MINHASH_PRIME} AS hh
               FROM sh),
        perm AS (SELECT unnest(generate_series(0, {N_PERM-1})) AS p),
        acoef AS (SELECT {list(a)}::BIGINT[] AS a, {list(b)}::BIGINT[] AS b),
        sigp AS (SELECT doc_id, p,
                   MIN((hh * a[p+1] + b[p+1]) % {MINHASH_PRIME}) AS v
                 FROM hh CROSS JOIN perm CROSS JOIN acoef
                 GROUP BY doc_id, p)
    """


def _minhash_pairs_cte() -> str:
    from .operators.dedup import ROWS_PER_BAND
    return f"""
        band AS (SELECT doc_id, (p // {ROWS_PER_BAND}) AS band,
                   md5(string_agg(v::VARCHAR, ',' ORDER BY p)) AS bucket
                 FROM sigp GROUP BY doc_id, (p // {ROWS_PER_BAND})),
        pairs AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
                  FROM band x JOIN band y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id)
    """


def _simhash_sql() -> str:
    from .operators.dedup import SIMHASH_BITS
    sums = ", ".join(
        f"SUM(((hh >> {k}) & 1) * 2 - 1) AS b{k}" for k in range(SIMHASH_BITS))
    pack = " + ".join(
        f"CASE WHEN b{k} > 0 THEN {1 << k} ELSE 0 END"
        for k in range(SIMHASH_BITS))
    return f"""
        WITH tk AS (SELECT doc_id, list_distinct({_WORDS_SQL}) AS tk
                    FROM documents),
        h AS (SELECT doc_id,
                ('0x'||substr(md5(unnest(tk)),1,15))::BIGINT AS hh FROM tk),
        bits AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(({pack})::BIGINT, 0) AS simhash60
        FROM documents d LEFT JOIN bits USING (doc_id)
    """


def _ann_lsh_sql() -> str:
    """Signature CTEs with the baked integer hyperplanes of similarity.py:
    quantized-integer dot products make bucket bits engine-exact."""
    from .operators.similarity import N_PLANES, N_TABLES, hyperplanes
    planes = hyperplanes(64, N_TABLES, N_PLANES).astype(int)
    bucket_exprs = []
    for t in range(N_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(qv, {planes[t, i].tolist()}::DOUBLE[])"
            f" > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(N_PLANES))
        bucket_exprs.append(f"({bits}) AS bkt{t}")
    or_clause = " OR ".join(f"s.bkt{t} = q.bkt{t}" for t in range(N_TABLES))
    cos = ("list_inner_product(s.embedding::DOUBLE[], q.q_emb::DOUBLE[]) / "
           "(SQRT(list_inner_product(s.embedding::DOUBLE[], s.embedding::DOUBLE[]))"
           " * SQRT(list_inner_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])))")
    return f"""
        WITH sig AS (
          SELECT vec_id, embedding,
                 list_transform(embedding::DOUBLE[],
                                x -> floor(x * 1000 + 0.5)) AS qv
          FROM embeddings),
        sigb AS (SELECT vec_id, embedding,
                        {", ".join(bucket_exprs)} FROM sig),
        q AS (SELECT vec_id AS q_id, embedding AS q_emb,
                     {", ".join(f"bkt{t}" for t in range(N_TABLES))}
              FROM sigb WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, s.vec_id, ROUND({cos}, 3) AS cos_sim
          FROM sigb s JOIN q ON ({or_clause}))
        SELECT q_id, vec_id, cos_sim, rnk FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY cos_sim DESC, vec_id ASC) AS rnk
          FROM scored) t
        WHERE rnk <= 5
    """


_FP_SQL_CTE = """
        w AS (SELECT doc_id,
                unnest(list_transform(generate_series(1, length(text) - 15),
                       i -> substr(text, i, 16))) AS win
              FROM documents WHERE length(text) >= 16),
        h AS (SELECT doc_id,
                list_reduce(list_transform(generate_series(1, 16),
                            j -> unicode(substr(win, j, 1))::HUGEINT),
                            (a, c) -> (a * 257 + c) % 2305843009213693951)
                  AS hv
              FROM w),
        anch AS (SELECT DISTINCT doc_id, hv FROM h WHERE hv % 32 = 0),
        capped AS (SELECT doc_id, hv FROM (
            SELECT doc_id, hv,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hv) AS rn
            FROM anch) t WHERE rn <= 64)
"""

_BM25_BASE_SQL = f"""
        WITH {_TOK_CTE},
        dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        stats AS (SELECT COUNT(*) AS m, AVG(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS f
          FROM tok JOIN (VALUES {_TERMS_SQL}) AS d(term) ON tok.token = d.term
          GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS n FROM tf GROUP BY term),
        bm AS (
        SELECT tf.doc_id, tf.term,
               ROUND(LN((stats.m - df.n + 0.5) / (df.n + 0.5) + 1.0)
                     * (tf.f * 2.5)
                     / (tf.f + 1.5 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
                     4) AS bm25
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats)
"""

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
    # thresholds = round(rate * 256) as two lowercase hex chars:
    # en 0.5 -> 0x80, de 0.2 -> 0x33, default 0.1 -> 0x1a; lowercase-hex
    # lexicographic compare is engine-identical (see stratified_sample)
    "stratified_sample": """
        SELECT doc_id, lang,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sample_bucket
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
              CASE WHEN lang = 'en' THEN '80'
                   WHEN lang = 'de' THEN '33'
                   ELSE '1a' END
    """,
}


def _lang_id_sql() -> str:
    from .operators.textstats import _LANG_PROFILES
    selects = []
    for lang, words in sorted(_LANG_PROFILES.items()):
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        selects.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_intersect(tk, {lst})) / {len(words)}.0 AS score FROM t")
    union = " UNION ALL ".join(selects)
    return rf"""
        WITH t AS (SELECT doc_id,
                     list_distinct(regexp_split_to_array(lower(trim(text)),
                                                         '\s+')) AS tk
                   FROM documents),
        sc AS ({union})
        SELECT doc_id, lang AS pred_lang, ROUND(score, 4) AS lang_score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, lang DESC) AS rn FROM sc) x
        WHERE rn = 1
    """


ORACLES["lang_id_pred"] = _lang_id_sql()

ORACLES["connected_components"] = """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT 'u:' || user_id AS src, 't:' || event_type AS dst
      FROM events),
    sym AS (SELECT src AS a, dst AS b FROM edges
            UNION SELECT dst AS a, src AS b FROM edges),
    nodes AS (SELECT DISTINCT a FROM sym),
    reach AS (
      SELECT a, a AS b FROM nodes
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
    SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a
"""

ORACLES["minhash_dedup"] = f"""
    WITH {_minhash_cte()}, {_minhash_pairs_cte()}
    SELECT p2.a_id, p2.b_id,
           ROUND(SUM(CASE WHEN sx.v = sy.v THEN 1 ELSE 0 END) / 64.0, 4)
             AS est_jaccard
    FROM pairs p2
    JOIN sigp sx ON sx.doc_id = p2.a_id
    JOIN sigp sy ON sy.doc_id = p2.b_id AND sy.p = sx.p
    GROUP BY p2.a_id, p2.b_id
"""

ORACLES["simhash_docs"] = _simhash_sql()

ORACLES["shared_passages"] = f"""
    WITH {_FP_SQL_CTE}
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
    FROM capped a JOIN capped b ON a.hv = b.hv AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""

ORACLES["ann_lsh_topk"] = _ann_lsh_sql()

def _emb_near_dup_sql() -> str:
    """Pairwise twin of _ann_lsh_sql: same baked integer hyperplanes, OR
    of per-table bucket equality, exact cosine >= 0.4 verify."""
    from .operators.similarity import N_PLANES, N_TABLES, hyperplanes
    planes = hyperplanes(64, N_TABLES, N_PLANES).astype(int)
    bucket_exprs = []
    for t in range(N_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(qv, {planes[t, i].tolist()}::DOUBLE[])"
            f" > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(N_PLANES))
        bucket_exprs.append(f"({bits}) AS bkt{t}")
    or_clause = " OR ".join(f"a.bkt{t} = b.bkt{t}" for t in range(N_TABLES))
    cos = ("list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
           "(SQRT(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
           " * SQRT(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))")
    return f"""
        WITH sig AS (
          SELECT vec_id, embedding,
                 list_transform(embedding::DOUBLE[],
                                x -> floor(x * 1000 + 0.5)) AS qv
          FROM embeddings),
        sigb AS (SELECT vec_id, embedding,
                        {", ".join(bucket_exprs)} FROM sig)
        SELECT a_id, b_id, cos_sim FROM (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 ROUND({cos}, 4) AS cos_sim
          FROM sigb a JOIN sigb b
            ON a.vec_id < b.vec_id AND ({or_clause})) t
        WHERE cos_sim >= 0.4
    """


ORACLES["embedding_near_dups"] = _emb_near_dup_sql()

# IVF: sampled centroids (vec_id % 25 == 0), assignment + probe by
# quantized-integer inner product (exact in both engines; ties -> smallest
# centroid id), exact cosine re-rank of the probed inverted lists.
_IVF_COS = ("list_inner_product(c.embedding::DOUBLE[], q.q_emb::DOUBLE[]) / "
            "(SQRT(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))"
            " * SQRT(list_inner_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])))")
ORACLES["ann_ivf_topk"] = f"""
    WITH qv AS (
      SELECT vec_id, embedding,
             list_transform(embedding::DOUBLE[],
                            x -> floor(x * 1000 + 0.5)) AS vq
      FROM embeddings),
    cent AS (SELECT vec_id AS c_id, vq AS c_q FROM qv
             WHERE vec_id % 25 = 0),
    asg AS (
      SELECT vec_id, embedding, c_id FROM (
        SELECT v.vec_id, v.embedding, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.vq, c.c_q) DESC, c.c_id ASC) rn
        FROM qv v CROSS JOIN cent c) t WHERE rn = 1),
    q AS (SELECT vec_id AS q_id, embedding AS q_emb, vq AS qq
          FROM qv WHERE vec_id < 5),
    probe AS (
      SELECT q_id, q_emb, c_id FROM (
        SELECT q.q_id, q.q_emb, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_dot_product(q.qq, c.c_q) DESC, c.c_id ASC) rn
        FROM q CROSS JOIN cent c) t WHERE rn <= 5),
    scored AS (
      SELECT q.q_id, c.vec_id, ROUND({_IVF_COS}, 3) AS cos_sim
      FROM probe q JOIN asg c ON c.c_id = q.c_id)
    SELECT q_id, vec_id, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored) t
    WHERE rnk <= 5
"""

ORACLES["near_dup_pipeline"] = rf"""
    WITH {_minhash_cte()}, {_minhash_pairs_cte()},
    sets AS (SELECT doc_id,
               list_distinct(regexp_split_to_array(text, '\s+')) AS toks
             FROM documents)
    SELECT a_id, b_id, jaccard FROM (
      SELECT p2.a_id, p2.b_id,
             ROUND(CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE)
                   / (len(sa.toks) + len(sb.toks)
                      - len(list_intersect(sa.toks, sb.toks))), 4) AS jaccard
      FROM pairs p2
      JOIN sets sa ON sa.doc_id = p2.a_id
      JOIN sets sb ON sb.doc_id = p2.b_id) t
    WHERE jaccard >= 0.8
"""

# Clustering twin of near_dup_pipeline: same candidate + verify CTEs, then
# transitive closure (recursive CTE) == the operator's min-label CC, and
# min doc_id per component == the zero-padded string min-label.
ORACLES["near_dup_clusters"] = rf"""
    WITH RECURSIVE {_minhash_cte()}, {_minhash_pairs_cte()},
    sets AS (SELECT doc_id,
               list_distinct(regexp_split_to_array(text, '\s+')) AS toks
             FROM documents),
    verified AS (
      SELECT a_id, b_id FROM (
        SELECT p2.a_id, p2.b_id,
               ROUND(CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE)
                     / (len(sa.toks) + len(sb.toks)
                        - len(list_intersect(sa.toks, sb.toks))), 4)
                 AS jaccard
        FROM pairs p2
        JOIN sets sa ON sa.doc_id = p2.a_id
        JOIN sets sb ON sb.doc_id = p2.b_id) t
      WHERE jaccard >= 0.8),
    sym AS (SELECT a_id AS a, b_id AS b FROM verified
            UNION SELECT b_id AS a, a_id AS b FROM verified),
    nodes AS (SELECT DISTINCT a FROM sym),
    reach AS (
      SELECT a, a AS b FROM nodes
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
    SELECT a AS doc_id, MIN(b) AS cluster_id,
           (a = MIN(b)) AS is_representative
    FROM reach GROUP BY a
"""

ORACLES["bm25_rank"] = f"""
    {_BM25_BASE_SQL}
    SELECT doc_id, term, bm25,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY bm25 DESC, term ASC) AS rnk
    FROM bm
"""

ORACLES["problematic_terms"] = f"""
    {_BM25_BASE_SQL}
    SELECT lang, term, COUNT(*) AS total,
           COUNT(*) FILTER (bm25 < 1.0) AS under,
           COUNT(*) FILTER (bm25 >= 1.0) AS n_exceptions
    FROM bm JOIN documents USING (doc_id)
    GROUP BY lang, term
    HAVING (COUNT(*) FILTER (bm25 < 1.0)) / CAST(COUNT(*) AS DOUBLE) >= 0.5
"""

ORACLES["bm25_stats"] = f"""
    {_BM25_BASE_SQL}
    SELECT term, n, mean_score, stddev_score, above, below, ratio_above,
           ROW_NUMBER() OVER (ORDER BY mean_score DESC, term ASC) AS rnk
    FROM (
      SELECT term, COUNT(*) AS n,
             ROUND(AVG(bm25), 3) AS mean_score,
             ROUND(STDDEV_SAMP(bm25), 3) AS stddev_score,
             COUNT(*) FILTER (bm25 >= 1.0) AS above,
             COUNT(*) FILTER (bm25 < 1.0) AS below,
             ROUND((COUNT(*) FILTER (bm25 >= 1.0))
                   / CAST(COUNT(*) AS DOUBLE), 4) AS ratio_above
      FROM bm GROUP BY term) s
    WHERE n >= 2 AND ratio_above < 1.0
"""

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
    "stratified_sample": q_stratified_sample,
    "lang_stats": q_lang_stats,
    "lang_id_pred": q_lang_id_pred,
    "connected_components": q_connected_components,
    "minhash_dedup": q_minhash_dedup,
    "simhash_docs": q_simhash_docs,
    "shared_passages": q_shared_passages,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "near_dup_pipeline": q_near_dup_pipeline,
    "near_dup_clusters": q_near_dup_clusters,
    "bm25_rank": q_bm25_rank,
    "problematic_terms": q_problematic_terms,
    "bm25_stats": q_bm25_stats,
    "alias_coverage": q_alias_coverage,
}

_ALIAS_CAT_SQL = ", ".join(f"('{g}', '{k}', '{t}')"
                           for g, k, t in ALIAS_CATALOG)

ORACLES["alias_coverage"] = f"""
    WITH cat(grp, kind, term0) AS (VALUES {_ALIAS_CAT_SQL}),
    -- reference-parity normalization (lowercase, non-alnum runs ->
    -- single space) + first-token prefilter + consecutive-token phrase
    -- verify: the same two-stage match as
    -- operators/summaries.alias_coverage
    docs_n AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') AS text
      FROM documents),
    atok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM docs_n),
    cat_x AS (
      SELECT grp, kind, term,
             string_split(term, ' ')[1] AS first_tok,
             instr(term, ' ') > 0 AS is_multi
      FROM (SELECT grp, kind,
                   trim(regexp_replace(lower(term0), '[^a-z0-9]+', ' ',
                                       'g')) AS term
            FROM cat)),
    cand AS (
      SELECT DISTINCT doc_id, grp, kind, term, is_multi
      FROM atok JOIN cat_x ON atok.token = cat_x.first_tok),
    hits AS (
      SELECT doc_id, grp, kind FROM cand WHERE NOT is_multi
      UNION
      SELECT c.doc_id, c.grp, c.kind
      FROM cand c JOIN docs_n d ON c.doc_id = d.doc_id
      WHERE c.is_multi
        AND instr(' ' || d.text || ' ', ' ' || c.term || ' ') > 0),
    per_group AS (
      SELECT doc_id, grp,
             MAX(CASE WHEN kind = 'name' THEN 1 ELSE 0 END) AS name_hit,
             MAX(CASE WHEN kind = 'mitre' THEN 1 ELSE 0 END) AS mitre_hit,
             MAX(CASE WHEN kind = 'malpedia' THEN 1 ELSE 0 END)
               AS malpedia_hit
      FROM hits GROUP BY doc_id, grp),
    per_doc AS (
      SELECT doc_id,
             SUM(name_hit) AS group_name_hits,
             SUM(mitre_hit) AS mitre_alias_hits,
             SUM(malpedia_hit) AS malpedia_alias_hits,
             MAX(CASE WHEN mitre_hit + malpedia_hit > 0 AND name_hit = 0
                 THEN 1 ELSE 0 END) AS alias_without_name
      FROM per_group GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(group_name_hits, 0) AS BIGINT) AS group_name_hits,
           CAST(COALESCE(mitre_alias_hits, 0) AS BIGINT) AS mitre_alias_hits,
           CAST(COALESCE(malpedia_alias_hits, 0) AS BIGINT)
             AS malpedia_alias_hits,
           CAST(COALESCE(alias_without_name, 0) AS BIGINT)
             AS alias_without_name
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN per_doc USING (doc_id)
"""
