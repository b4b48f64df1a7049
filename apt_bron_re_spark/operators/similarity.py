"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact; broadcast the (small) query set and
    keep the dot product JVM-side (zip_with/aggregate) so the scan is one
    narrow pass + a top-k aggregation;
  * LSH-bucketed ANN — random-hyperplane signatures (deterministic
    hyperplanes from a stable hash), candidates = bucket collisions,
    re-ranked exactly.  The scale path: shuffle O(n x tables), not O(n x q)
    for large query sets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 4)
        .alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic random hyperplanes (unit-free; sign only matters)."""
    rows = []
    for i in range(n_planes):
        seed = hashlib.blake2b(f"ann-plane-{i}".encode(), digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(seed, "little"))
        rows.append(rng.standard_normal(dim))
    return np.stack(rows)


def lsh_signatures(df: DataFrame, dim: int, n_planes: int = 16,
                   vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature as an int bucket column."""
    planes = _hyperplanes(dim, n_planes)

    @F.pandas_udf(T.IntegerType())
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())            # B x dim
        bits = (mat @ planes.T) > 0                # B x planes
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    return df.withColumn("lsh_bucket", sig(F.col(vec_col)))


def lsh_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_planes: int = 12,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_emb") -> DataFrame:
    """Approximate top-k: only vectors in the query's LSH bucket are scored
    (equi-join on bucket instead of a full cross join)."""
    v = lsh_signatures(vectors, dim, n_planes, vec_col)
    q = lsh_signatures(queries, dim, n_planes, q_vec_col)
    joined = v.join(F.broadcast(q), "lsh_bucket")
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 4)
        .alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))
