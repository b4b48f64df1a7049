"""Streaming training-data operators over arriving documents.

The dedup/textstats operators are per-document (stateless) or key-local
(stateful-with-watermark), so they run unchanged on a ``readStream``
source — one definition, two modes, like streaming/mention_stream.py:

  * ``stream_documents``   — file-source stream of documents parquet drops
  * ``stream_text_features`` — quality + language-ID + token counts + the
    64-perm MinHash signature and 60-bit SimHash, ALL as per-row column
    expressions (no aggregation state)
  * ``stream_exact_dedup`` — streaming exact dedup: md5(text) fingerprint +
    ``dropDuplicatesWithinWatermark`` so duplicate state is bounded by the
    watermark instead of growing forever (the 100 TB streaming-dedup shape)

``minhash_signature_expr``/``simhash_expr`` are the per-row expression
twins of the batch groupBy implementations in operators/dedup.py —
equivalence is pytest-pinned.  Batch prefers the explode+agg form
(map-side combine, cheaper on huge docs); streams need the stateless form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (MINHASH_PRIME, N_PERM, SIMHASH_BITS,
                               _md5_60, _perm_params, _words,
                               shingle_hash_col)

DOC_DDL = ("doc_id bigint, lang string, source string, n_chars bigint, "
           "created_at timestamp, text string")


def minhash_signature_expr(text_col: Column) -> Column:
    """Per-row MinHash signature: one fold over the shingle-hash array
    with an array<long>[64] accumulator — value-identical to
    operators.dedup.minhash_signatures (pytest-pinned).

    The hash array is bound ONCE as a lambda variable: interpreted
    higher-order lambdas re-evaluate captured outer expressions on every
    use, so the naive '64 separate array_min(transform(hashes, ...))'
    form recomputes the md5 shingle pipeline 64x per row (measured 18x
    slower)."""
    a, b = _perm_params()
    ab = F.array(*[F.struct(F.lit(a[i]).alias("a"), F.lit(b[i]).alias("b"))
                   for i in range(N_PERM)])
    p = F.lit(MINHASH_PRIME)

    def fold(hs: Column) -> Column:
        init = F.array_repeat(p.cast("long"), N_PERM)
        return F.aggregate(
            hs, init,
            lambda acc, h: F.zip_with(
                acc, ab, lambda x, c: F.least(x, (h * c.a + c.b) % p)))

    return F.transform(F.array(shingle_hash_col(text_col)), fold)[0]


def simhash_expr(text_col: Column) -> Column:
    """Per-row 60-bit SimHash: 60 scalar bit-sum folds over the token-hash
    array, packed — value-identical to operators.dedup.simhash
    (pytest-pinned).  The hash array is bound once (same rule as
    minhash_signature_expr); each fold then reads the bound lambda
    variable instead of re-running the md5 token pipeline 60x per row.
    (shiftright's bit count must be a Python int, which rules out a
    single zip_with-over-bit-positions fold.)"""

    def fold(hs: Column) -> Column:
        packed = None
        for k in range(SIMHASH_BITS):
            bit_sum = F.aggregate(
                hs, F.lit(0).cast("long"),
                lambda acc, h: acc + (F.shiftright(h, k)
                                      .bitwiseAND(F.lit(1)) * 2 - 1))
            term = F.when(bit_sum > 0, F.lit(1 << k)).otherwise(F.lit(0))
            packed = term if packed is None else packed + term
        return packed.cast("long")

    hashes = F.transform(F.array_distinct(_words(text_col)),
                         lambda t: _md5_60(t))
    return F.coalesce(F.transform(F.array(hashes), fold)[0], F.lit(0))


def stream_documents(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(DOC_DDL).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_text_features(docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Stateless per-row features on a (streaming or batch) DataFrame."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("text_hash"),
        F.size(toks).alias("n_tokens"),
        minhash_signature_expr(F.col(text_col)).alias("minhash_sig"),
        simhash_expr(F.col(text_col)).alias("simhash60"),
    )


def stream_exact_dedup(docs: DataFrame, watermark: str = "1 hour",
                       time_col: str = "created_at",
                       text_col: str = "text") -> DataFrame:
    """First arrival per distinct text within the watermark horizon —
    bounded-state streaming exact dedup."""
    fp = docs.select(
        "doc_id", time_col,
        F.md5(F.col(text_col)).alias("text_hash"))
    return (fp.withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(["text_hash"]))
