"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact; broadcast the (small) query set and
    keep the dot product JVM-side (zip_with/aggregate) so the scan is one
    narrow pass + a top-k aggregation;
  * multi-table LSH ANN — OR-amplified random-hyperplane signatures
    (``n_tables`` independent sign-LSH tables of ``n_planes`` bits each; a
    vector pair is a candidate if it collides in ANY table), candidates
    re-ranked exactly.  The scale path: the candidate join is an equi-join
    on (table, bucket), so the shuffle is O(n x tables), never O(n^2).

Determinism / oracle-checkability: hyperplanes are deterministic integer
vectors (blake2b-seeded, components in [-1000, 1000]) and the embedding is
quantized to integers (floor(x*1000 + 0.5)) before the signature dot
product — integer dot products are EXACT in any engine and any summation
order, so the bucket assignment is bit-identical between the numpy batch
UDF here and the DuckDB oracle SQL in queries.py.

Default (n_tables=20, n_planes=4) is tuned for near-uniform vectors (the
synthetic corpus has 10th-neighbour cosine ~0.28 — the hard case): pytest
gates recall@10 >= 0.9 vs brute force.  Clustered real-world embeddings
reach the same recall with far fewer/narrower tables; both knobs are
per-call.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_TABLES = 20
N_PLANES = 4
QUANT = 1000.0


def _dot(a, b):
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def cosine_expr(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_emb",
                     ) -> DataFrame:
    """Exact top-k neighbours per query (broadcast nested loop + window)."""
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 3)
        .alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def hyperplanes(dim: int, n_tables: int = N_TABLES,
                n_planes: int = N_PLANES) -> np.ndarray:
    """(n_tables, n_planes, dim) deterministic integer hyperplanes,
    components uniform in [-1000, 1000] (sign-LSH is scale-free, so
    integer normals behave like Gaussian ones for these widths)."""
    out = np.empty((n_tables, n_planes, dim), dtype=np.float64)
    for t in range(n_tables):
        for i in range(n_planes):
            seed = hashlib.blake2b(f"ann-plane-{t}-{i}".encode(),
                                   digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(seed, "little"))
            out[t, i] = rng.integers(-1000, 1001, dim).astype(np.float64)
    return out


def lsh_signatures(df: DataFrame, dim: int,
                   n_tables: int = N_TABLES, n_planes: int = N_PLANES,
                   vec_col: str = "embedding") -> DataFrame:
    """Adds ``buckets array<int>`` — one sign-LSH bucket per table.
    Quantized-integer dot products: exact, order-independent."""
    planes = hyperplanes(dim, n_tables, n_planes)
    flat = planes.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        q = np.floor(mat * QUANT + 0.5)            # exact integer grid
        bits = (q @ flat.T) > 0                    # B x (tables*planes)
        bits = bits.reshape(len(mat), len(planes), -1)
        buckets = (bits @ weights).astype(np.int32)
        return pd.Series(list(buckets))

    return df.withColumn("buckets", sig(F.col(vec_col)))


def embedding_near_pairs(vectors: DataFrame, dim: int,
                         threshold: float = 0.9,
                         n_tables: int = 16,
                         n_planes: int = 10,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: OR-amplified sign-LSH bucket
    candidates, then exact cosine verification >= ``threshold``.

    The dedup-family twin of minhash_candidates for dense vectors: the
    self-join is an equi-join on (table, bucket) — shuffle O(n x tables),
    never O(n^2).  Band rows carry IDS ONLY (the vectors re-join once
    after pair dedup, the same shuffle-narrowing as the MinHash band
    join).  Bucket bits are engine-exact (integer-quantized dot products),
    so the DuckDB oracle reproduces the candidate set bit-for-bit.

    Parameter regime matters at scale: sign-LSH collision probability per
    table is (1 - theta/pi)^n_planes, and UNRELATED vectors collide at
    ~2^-n_planes.  The defaults (16 tables x 10 planes) target the
    near-dup regime: recall ~0.98 for cos >= 0.9 pairs while random
    collisions stay at n^2/1024 per table — near-linear candidates.
    WIDE buckets (e.g. the ANN default 20x4) make the candidate set
    approach all-pairs on large corpora: only use them with LOW
    thresholds on small/filtered inputs."""
    bands = (lsh_signatures(vectors, dim, n_tables, n_planes, vec_col)
             .select(id_col, F.posexplode("buckets").alias("tbl", "bucket")))
    a = bands.select(F.col(id_col).alias("a_id"), "tbl", "bucket")
    b = bands.select(F.col(id_col).alias("b_id"), "tbl", "bucket")
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    va = vectors.select(F.col(id_col).alias("a_id"),
                        F.col(vec_col).alias("a_emb"))
    vb = vectors.select(F.col(id_col).alias("b_id"),
                        F.col(vec_col).alias("b_emb"))
    sim = F.round(cosine_expr(F.col("a_emb"), F.col("b_emb")), 4)
    return (pairs.join(va, "a_id").join(vb, "b_id")
            .select("a_id", "b_id", sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def _quant(vec) -> "F.Column":
    """floor(x*1000 + 0.5) as longs — the same exact integer grid as the
    LSH signatures, so every assignment comparison is engine-exact."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * QUANT + 0.5)
                       .cast("long"))


def _idot(a, b):
    """Integer dot product (exact in any engine / summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """(id, c_id): each vector assigned to the centroid maximizing the
    quantized-integer inner product (ties -> smallest centroid id).

    The standard IVF coarse-quantization pass: n x n_centroids dot
    products, centroids broadcast, argmax via an algebraic max(struct)
    aggregation (map-side combined — the shuffle carries ONE row per
    vector per map partition, never the n x k cross join)."""
    v = vectors.select(F.col(id_col), _quant(F.col(vec_col)).alias("v_q"))
    best = (
        v.crossJoin(F.broadcast(centroids))
        .select(id_col,
                F.struct(_idot(F.col("v_q"), F.col("c_q")).alias("ip"),
                         (-F.col("c_id")).alias("neg_c")).alias("s"))
        .groupBy(id_col)
        .agg(F.max("s").alias("s"))
    )
    return best.select(id_col, (-F.col("s.neg_c")).alias("c_id"))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
             centroid_stride: int = 50, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_emb") -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into inverted
    lists (ivf_assign), probe the ``nprobe`` centroids nearest to each
    query, exact-rerank only those lists.

    Centroids are SAMPLED deterministically (every ``centroid_stride``-th
    vector id) — no trained k-means, so the quantizer is engine-exact and
    SQL-expressible end-to-end (the DuckDB oracle reproduces assignment
    bit-for-bit via the same integer grid).  On clustered real-world
    embeddings sampled centroids land inside clusters and recall tracks
    trained IVF closely (pytest gates recall@10 >= 0.9 on a planted
    clustered corpus); on adversarially uniform vectors recall degrades
    toward nprobe/n_centroids like any IVF — use lsh_topk there.

    Scale shape: assignment is a broadcast cross product + algebraic
    argmax (no data-sized shuffle beyond one row per vector); the probe
    join is an equi-join on c_id, so the candidate shuffle is
    O(n x nprobe / n_centroids) per query — never O(n^2)."""
    cent = (vectors.filter(F.pmod(F.col(id_col), F.lit(centroid_stride)) == 0)
            .select(F.col(id_col).alias("c_id"),
                    _quant(F.col(vec_col)).alias("c_q")))
    inv = (ivf_assign(vectors, cent, id_col, vec_col)
           .join(vectors, id_col))

    q = queries.select(F.col(q_id_col), F.col(q_vec_col),
                       _quant(F.col(q_vec_col)).alias("qq"))
    wq = Window.partitionBy(q_id_col).orderBy(
        F.desc("ip"), F.asc("c_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(q_id_col, q_vec_col, "c_id",
                _idot(F.col("qq"), F.col("c_q")).alias("ip"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(q_id_col, q_vec_col, "c_id")
    )

    cands = inv.join(F.broadcast(probes), "c_id").select(
        q_id_col, id_col, vec_col, q_vec_col)
    scored = cands.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 3)
        .alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def lsh_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_tables: int = N_TABLES, n_planes: int = N_PLANES,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_emb") -> DataFrame:
    """Approximate top-k with OR-amplification: score only vectors that
    share >= 1 of n_tables LSH buckets with the query, re-rank exactly."""
    v = (lsh_signatures(vectors, dim, n_tables, n_planes, vec_col)
         .select(id_col, vec_col,
                 F.posexplode("buckets").alias("tbl", "bucket")))
    q = (lsh_signatures(queries, dim, n_tables, n_planes, q_vec_col)
         .select(q_id_col, q_vec_col,
                 F.posexplode("buckets").alias("tbl", "bucket")))
    cands = (
        v.join(F.broadcast(q), ["tbl", "bucket"])
        .select(q_id_col, id_col, vec_col, q_vec_col)
        .dropDuplicates([q_id_col, id_col])
    )
    scored = cands.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 3)
        .alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))
