"""Large-scale deduplication operators for training-data pipelines.

Beyond the reference's exact per-report dedup (A1, basic.py:304-340), a
100 TB corpus pipeline needs near-duplicate detection.  All operators here
are deterministic (seed-free stable hashing via crc32/md5 column functions
or blake2b in vectorized UDFs) and shuffle-lean:

  * exact_duplicates      — hash-groupBy on md5(text)
  * minhash_candidates    — shingle -> 64-perm MinHash -> LSH banding ->
                            bucket self-join (candidate pairs only; no
                            quadratic blowup)
  * simhash               — 64-bit SimHash per doc (Hamming-ball near-dup)
  * ngram_jaccard         — exact Jaccard verification for candidate pairs
                            (the verify step after LSH)

Scale notes: MinHash signatures are computed in one Arrow batch pass
(numpy, vectorized over shingles); banding explodes to (band, band_hash)
keys so the self-join is an equi-join on bucket — the classic
LSH-candidate plan whose shuffle is O(docs x bands), not O(docs^2).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_PERM = 64          # minhash permutations
N_BANDS = 16         # LSH bands (4 rows/band)
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_docs, doc_ids)."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"),
             F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def _perm_params() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficients for N_PERM universal hashes."""
    a = np.empty(N_PERM, dtype=np.uint64)
    b = np.empty(N_PERM, dtype=np.uint64)
    for i in range(N_PERM):
        da = hashlib.blake2b(f"minhash-a-{i}".encode(), digest_size=8).digest()
        db = hashlib.blake2b(f"minhash-b-{i}".encode(), digest_size=8).digest()
        a[i] = (int.from_bytes(da, "little") % (_MERSENNE - 1)) + 1
        b[i] = int.from_bytes(db, "little") % _MERSENNE
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """crc32 of each k-word shingle (whitespace tokens)."""
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    out = {
        zlib.crc32(" ".join(toks[i:i + k]).encode("utf-8"))
        for i in range(len(toks) - k + 1)
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


_SIG_SCHEMA = T.ArrayType(T.LongType())


@F.pandas_udf(_SIG_SCHEMA)
def _minhash_sig_udf(texts: pd.Series) -> pd.Series:
    a, b = _perm_params()
    out = []
    for text in texts:
        sh = _shingle_hashes(text or "")
        if sh.size == 0:
            out.append([0] * N_PERM)
            continue
        # (perm, shingle) universal hashing, vectorized: min over shingles
        hashed = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
        out.append([int(x) for x in hashed.min(axis=1)])
    return pd.Series(out)


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", _minhash_sig_udf(F.col(text_col)).alias("sig"))


def minhash_candidates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH candidate pairs: docs sharing >= 1 band bucket, with the exact
    signature-similarity estimate for each pair."""
    sigs = minhash_signatures(docs, text_col)

    bands = sigs.select(
        "doc_id", "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda i: F.slice(F.col("sig"),
                                  i * ROWS_PER_BAND + 1, ROWS_PER_BAND),
            )
        ).alias("band", "band_sig"),
    ).select(
        "doc_id", "sig", "band",
        F.md5(F.concat_ws(",", F.col("band_sig"))).alias("bucket"))

    a = bands.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("a_sig"),
                     "band", "bucket")
    b = bands.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("b_sig"),
                     "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .dropDuplicates(["a_id", "b_id"])
    )
    est = (
        F.size(F.filter(F.zip_with("a_sig", "b_sig",
                                   lambda x, y: x == y), lambda v: v))
        .cast("double") / N_PERM
    )
    return pairs.select("a_id", "b_id", F.round(est, 4).alias("est_jaccard"))


@F.pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    out = []
    for text in texts:
        toks = (text or "").split()
        acc = np.zeros(64, dtype=np.int64)
        for tok in set(toks):
            h = np.uint64(int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
                "little"))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        sig = int((acc > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="int64")


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash64): near-dups differ in few bits (Hamming)."""
    return docs.select("doc_id", _simhash_udf(F.col(text_col)).alias("simhash64"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8,
                       text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 16-bit chunks (a pair within
    Hamming distance <= 8 of 64 bits shares at least one exact chunk far
    more often than chance; classic simhash blocking), verify exactly."""
    sh = simhash(docs, text_col)
    chunks = sh.select(
        "doc_id", "simhash64",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash64", k * 16).bitwiseAND(F.lit(0xFFFF))
            for k in range(4)
        ])).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(F.col("doc_id").alias("a_id"),
                      F.col("simhash64").alias("a_sig"), "chunk_idx", "chunk")
    b = chunks.select(F.col("doc_id").alias("b_id"),
                      F.col("simhash64").alias("b_sig"), "chunk_idx", "chunk")
    hamming = F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig")))
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(docs: DataFrame, candidates: DataFrame,
                        threshold: float = 0.8,
                        text_col: str = "text") -> DataFrame:
    """Exact word-set Jaccard verification of candidate (a_id, b_id) pairs
    — the verify stage after LSH candidate generation."""
    sets = docs.select(
        F.col("doc_id"),
        F.array_distinct(F.split(F.col(text_col), r"\s+")).alias("toks"))
    out = (
        candidates
        .join(sets.select(F.col("doc_id").alias("a_id"),
                          F.col("toks").alias("a_toks")), "a_id")
        .join(sets.select(F.col("doc_id").alias("b_id"),
                          F.col("toks").alias("b_toks")), "b_id")
    )
    jac = (F.size(F.array_intersect("a_toks", "b_toks")).cast("double")
           / F.size(F.array_union("a_toks", "b_toks")))
    return (out.select("a_id", "b_id", F.round(jac, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))
