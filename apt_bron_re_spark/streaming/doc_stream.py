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
    """Per-row MinHash signature: array of 64 mins over the shingle-hash
    array — value-identical to operators.dedup.minhash_signatures."""
    hashes = shingle_hash_col(text_col)
    a, b = _perm_params()

    def perm_min(ai: int, bi: int) -> Column:
        return F.array_min(F.transform(
            hashes, lambda h: (h * F.lit(ai) + F.lit(bi)) % MINHASH_PRIME))

    return F.array(*[perm_min(a[i], b[i]) for i in range(N_PERM)])


def simhash_expr(text_col: Column) -> Column:
    """Per-row 60-bit SimHash — value-identical to operators.dedup.simhash."""
    hashes = F.transform(F.array_distinct(_words(text_col)),
                         lambda t: _md5_60(t))
    def bit_sum(k: int) -> Column:
        return F.aggregate(
            hashes, F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, k)
                                  .bitwiseAND(F.lit(1)) * 2 - 1))

    packed = None
    for k in range(SIMHASH_BITS):
        term = F.when(bit_sum(k) > 0, F.lit(1 << k)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return F.coalesce(packed.cast("long"), F.lit(0))


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
