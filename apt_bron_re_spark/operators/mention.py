"""Stage 2 — mention detection: docs -> long mentions + NER-residue rows.

M1-M8 + N4-N6 + A1 + A2 in SURVEY.md, all in ONE ``mapInPandas`` pass per
document (the per-doc logic is ``doc_core.process_document``, a faithful
re-expression of reference basic.py:181-301).  Doing NER scoring and
residue filtering inside the same pass costs zero extra shuffles — the only
wide operation this stage triggers downstream is whatever consumes it.

Output is a single union-shaped DataFrame (``rec_type`` ∈ {mention,
residue, error}) so the stage materializes exactly once; the logical
outputs are cheap filters over the stage table (see plans/pipeline.py).
``error`` rows carry per-document failures (the reference's catch-and-log,
basic.py:300-301) so one malformed page never fails a task at scale.

Scale notes:
  * the compiled catalog + tagger ride in the UDF closure — built once on
    the driver, deserialized once per executor (broadcast semantics);
  * per-task cost is pure dict probing over Arrow batches; batch size is
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch so huge pages
    don't blow batch memory (SURVEY.md §4 item 2);
  * output is a narrow long table — explode-on-write, no per-doc maps.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog.build import compile_catalog
from ..config import CONTEXT_LENGTH, CPE_CHAR_RANGE, NER_MATCH_SCORE
from ..functions.extract_text import extract_text
from .doc_core import NerTagger, process_document

MENTION_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("rec_type", T.StringType(), False),
    T.StructField("category", T.StringType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("original_id", T.StringType(), True),
    T.StructField("value", T.StringType(), True),
    T.StructField("index", T.LongType(), True),
    T.StructField("alias", T.StringType(), True),
    T.StructField("software_type", T.StringType(), True),
    T.StructField("product", T.StringType(), True),
    T.StructField("vendor", T.StringType(), True),
    T.StructField("version", T.StringType(), True),
    T.StructField("ner_score", T.DoubleType(), True),
    T.StructField("sentence", T.StringType(), True),
    T.StructField("bucket", T.StringType(), True),
])

_COLS = [f.name for f in MENTION_SCHEMA.fields]


def detect_mentions(docs: DataFrame,
                    layer_map: dict[str, list[dict]],
                    add_ner_score: bool = True,
                    exact_score: float = NER_MATCH_SCORE,
                    char_len: int = CPE_CHAR_RANGE,
                    context_length: int = CONTEXT_LENGTH,
                    event_time_col: str | None = None,
                    from_html: bool = False) -> DataFrame:
    """docs(url, text) -> union table of doc + mention + residue rows.

    ``event_time_col`` (streaming): a timestamp column carried through the
    UDF so windowed aggregations downstream need no stream-stream join.
    ``from_html``: fuse E1 into this pass — input is pages(url, html) and
    the byte-identical ``extract_text`` runs inside the same UDF, skipping
    the materialized docs table entirely (the deployment profile; the
    unfused path keeps the extract checkpoint).
    """
    catalog = compile_catalog(layer_map)
    tagger = NerTagger(layer_map) if add_ner_score else None

    schema = MENTION_SCHEMA
    in_cols = ["url", "html" if from_html else "text"]
    if event_time_col:
        schema = T.StructType(
            MENTION_SCHEMA.fields
            + [T.StructField(event_time_col, T.TimestampType(), True)])
        in_cols.append(event_time_col)
    out_cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            ets = pdf[event_time_col] if event_time_col else None
            payload = pdf["html"] if from_html else pdf["text"]
            for i, (url, text) in enumerate(zip(pdf["url"], payload)):
                extra = {event_time_col: ets.iloc[i]} if event_time_col else {}
                if from_html:
                    text = extract_text(text)
                try:
                    results, residue, dl = process_document(
                        text, catalog, tagger,
                        add_ner_score=add_ner_score,
                        exact_score=exact_score,
                        char_len=char_len,
                        context_length=context_length,
                    )
                except Exception as exc:  # reference basic.py:300-301
                    rows.append({
                        **extra, "url": url, "rec_type": "error",
                        "category": None, "name": None, "original_id": None,
                        "value": f"{type(exc).__name__}: {exc}"[:500],
                        "index": None, "alias": None, "software_type": None,
                        "product": None, "vendor": None, "version": None,
                        "ner_score": None, "sentence": None, "bucket": None,
                    })
                    continue
                # one 'doc' row per document carries dl (BM25 doc length,
                # reference statistics.py:28) — no second pass over text
                rows.append({
                    **extra, "url": url, "rec_type": "doc",
                    "category": None, "name": None, "original_id": None,
                    "value": None, "index": dl, "alias": None,
                    "software_type": None, "product": None, "vendor": None,
                    "version": None, "ner_score": None, "sentence": None,
                    "bucket": None,
                })
                for category, entries in results.items():
                    for ent in entries:
                        rows.append({
                            **extra,
                            "url": url,
                            "rec_type": "mention",
                            "category": category,
                            "name": ent.get("name"),
                            "original_id": ent.get("original_id"),
                            "value": ent.get("value"),
                            "index": ent.get("index"),
                            "alias": ent.get("alias"),
                            "software_type": ent.get("software_type"),
                            "product": ent.get("product"),
                            "vendor": ent.get("vendor"),
                            "version": ent.get("version"),
                            "ner_score": float(ent.get("NER_score", 0.0)),
                            "sentence": ent.get("sentence"),
                            "bucket": None,
                        })
                for bucket, values in residue.items():
                    for val in values:
                        rows.append({
                            **extra,
                            "url": url,
                            "rec_type": "residue",
                            "category": None, "name": None,
                            "original_id": None, "value": val,
                            "index": None, "alias": None,
                            "software_type": None, "product": None,
                            "vendor": None, "version": None,
                            "ner_score": None, "sentence": None,
                            "bucket": bucket,
                        })
            yield pd.DataFrame(rows, columns=out_cols)

    return docs.select(*in_cols).mapInPandas(run, schema)


def doc_lengths_view(stage: DataFrame) -> DataFrame:
    """(url, dl) from the per-document rows — BM25 doc lengths."""
    return (stage.filter(F.col("rec_type") == "doc")
            .select("url", F.col("index").cast("int").alias("dl")))


def mentions_view(stage: DataFrame) -> DataFrame:
    """The mention rows of the stage table (drops residue-only columns)."""
    return stage.filter(F.col("rec_type") == "mention").drop("rec_type", "bucket")


def residue_view(stage: DataFrame) -> DataFrame:
    """The NER-residue rows: (url, bucket, value)."""
    return (stage.filter(F.col("rec_type") == "residue")
            .select("url", "bucket", "value"))


def errors_view(stage: DataFrame) -> DataFrame:
    """Per-document failures: (url, error)."""
    return (stage.filter(F.col("rec_type") == "error")
            .select("url", F.col("value").alias("error")))
