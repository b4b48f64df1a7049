"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All column-expression based (JVM-side, whole-stage-codegen friendly) except
the rolling-hash fingerprint, which is a vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny per-language stopword profiles for the n-gram-free heuristic
# language identifier (score = share of profile words present).
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "was", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "una", "es", "en", "por", "para"],
}

# BPE-ish token estimate: word chars cluster ~3.5 chars/token; punctuation
# and digits tokenize alone.
_WORD_RE = r"\w+"


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate per doc."""
    words = F.regexp_extract_all(F.col(text_col), F.lit(_WORD_RE), F.lit(0))
    n_ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    word_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x)
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[\w\s]", ""))
    bpe_est = (F.ceil(word_chars / 3.5) + n_punct).cast("long")
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        F.size(words).alias("n_word_tokens"),
        bpe_est.alias("n_bpe_est"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length, distinct-token ratio."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(
        toks, lambda t: F.lower(t).isin(_LANG_PROFILES["en"])))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[\w\s]", ""))
    n_chars = F.length(F.col(text_col))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_tok, 4)
        .alias("distinct_ratio"),
        F.round(n_stop.cast("double") / n_tok, 4).alias("stopword_ratio"),
        F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4)
        .alias("punct_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax profile-stopword share per doc."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    scores = F.array(*[
        F.struct(
            (F.size(F.array_intersect(
                toks, F.array(*[F.lit(w) for w in words])))
             .cast("double") / len(words)).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(_LANG_PROFILES.items())
    ])
    best = F.array_max(scores)
    return docs.select(
        "doc_id",
        best.getField("lang").alias("pred_lang"),
        F.round(best.getField("score"), 4).alias("lang_score"),
    )


@F.pandas_udf(T.ArrayType(T.LongType()))
def _rolling_hashes_udf(texts: pd.Series) -> pd.Series:
    """Rabin-Karp rolling hash over 16-char windows, sampled where
    hash % 32 == 0 (content-defined fingerprint anchors)."""
    BASE, MOD, WIN = 257, (1 << 61) - 1, 16
    out = []
    for text in texts:
        t = (text or "").encode("utf-8", errors="replace")
        if len(t) < WIN:
            out.append([])
            continue
        pw = pow(BASE, WIN - 1, MOD)
        h = 0
        for c in t[:WIN]:
            h = (h * BASE + c) % MOD
        anchors = []
        if h % 32 == 0:
            anchors.append(h)
        for i in range(WIN, len(t)):
            h = ((h - t[i - WIN] * pw) * BASE + t[i]) % MOD
            if h % 32 == 0:
                anchors.append(h)
        out.append(sorted(set(anchors))[:64])
    return pd.Series(out)


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content-defined fingerprint anchor sets per doc — overlapping
    anchors across docs indicate shared passages (winnowing-style)."""
    return docs.select(
        "doc_id", _rolling_hashes_udf(F.col(text_col)).alias("anchors"))


def shared_passage_pairs(docs: DataFrame, min_shared: int = 3,
                         text_col: str = "text") -> DataFrame:
    """Doc pairs sharing >= min_shared fingerprint anchors (equi-join on
    anchor, then count per pair — no quadratic scan)."""
    fp = fingerprints(docs, text_col).select(
        "doc_id", F.explode("anchors").alias("anchor"))
    a = fp.select(F.col("doc_id").alias("a_id"), "anchor")
    b = fp.select(F.col("doc_id").alias("b_id"), "anchor")
    return (
        a.join(b, "anchor")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
