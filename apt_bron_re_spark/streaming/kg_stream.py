"""Streaming KG construction — stages 3-5 over arriving pages.

The reference is a pure batch pipeline (SURVEY.md §1.3), but a
Common-Crawl-scale deployment ingests pages continuously.  Two streaming
execution shapes, both reusing the batch operators:

1. **Exact micro-batch pipeline** (``run_kg_stream``): foreachBatch runs
   the REAL stage 3-5 logic (BM25 scoring against FROZEN global stats,
   variant+semantic linking, evidence, salted partial triple aggregation)
   on every micro-batch and appends an exact partial aggregate partitioned
   by ``batch_id``.  The partials merge associatively
   (operators/materialize.py ``partial_triples``/``merge_partial_triples``
   — correct because a page's url lives in exactly one micro-batch, the
   same url-disjointness that makes the batch incremental chunks exact),
   so ``merged_triples`` equals the single-shot batch pipeline EXACTLY
   (pytest-pinned).  Idempotence: a foreachBatch replay after failure
   reuses the same ``batch_id``; dynamic partition overwrite rewrites that
   partition instead of appending duplicates — the same exactly-once
   mechanism as plans/pipeline.py ``_write_buckets``.

   The BM25 globals (m, avgdl, df) must be frozen from a corpus snapshot
   — the same rule the batch incremental link stage follows
   (plans/pipeline.py run_link_incremental): naive per-batch stats would
   compute wrong idf.

2. **Live triple view** (``stream_evidence_pairs`` + ``stream_triples_live``):
   a fully streaming stateful rollup.  Per-document evidence pairing runs
   row-locally inside one ``mapInPandas`` (a page's mentions never leave
   the task — zero shuffle before the keyed state), then
   ``applyInPandasWithState`` keyed by (subj, pred, obj) maintains BOUNDED
   per-key state: exact distinct-source count, the k lexicographically
   smallest source urls, the best-scored justification, and the max score
   — the same merge algebra as the batch salted aggregation, so on a
   url-disjoint stream the final emitted row per key equals the batch
   ``materialize_triples(evidence(merged, residual, canon))`` row exactly
   (pytest-pinned).  With ``link=True`` the L2-L5 link pass (variant +
   semantic against the FROZEN catalog — neither needs corpus statistics)
   also runs row-locally inside the same UDF, mirroring the batch
   ``build_links``/``merge_links`` per url: mention scores take
   max(mention, link) and link-only keys become sentence-free residual
   evidence.  Only the BM25 annotation (corpus-global df/m/avgdl) is
   inherently batch-shaped; it never feeds evidence scores, so the live
   triple set matches batch even on corpora where links change it.
   Urls must arrive in exactly one micro-batch; proven violations are
   surfaced per key as ``replays_detected`` (see stream_triples_live).

Scale notes: state per key is O(max_sources) regardless of how many pages
mention a hub edge — the streaming twin of the batch salted two-phase
k-smallest design.  The pairing mapInPandas carries the compiled catalog +
canon map in the UDF closure (catalog-sized, broadcast semantics).

Sink note: the live view emits in UPDATE mode, so its sink must support
updates AND checkpoint recovery — foreachBatch (upsert into a key-value /
Iceberg MERGE target) in production.  The memory sink accepts update mode
but cannot recover from a checkpoint (restart-with-state verified against
a foreachBatch sink: counts carry across restarts exactly).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog.build import compile_catalog
from ..config import PREDICATE_MAP
from ..functions.extract_text import extract_text
from ..operators import bm25, linking, materialize, mention
from ..operators.canonicalize import canonical_map
from ..operators.doc_core import NerTagger, process_document

PAIR_SCHEMA = T.StructType([
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("pair_score", T.DoubleType(), False),
    T.StructField("justification", T.StringType(), True),
])

TRIPLE_SCHEMA = T.StructType([
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("sources", T.ArrayType(T.StringType()), False),
    T.StructField("n_sources", T.LongType(), False),
    T.StructField("justification", T.StringType(), True),
    T.StructField("score", T.DoubleType(), False),
    # violations of the one-batch-per-url contract that the bounded state
    # could PROVE (replayed url found in the kept k-smallest sample) — a
    # nonzero value means the source is replaying urls across triggers
    T.StructField("replays_detected", T.LongType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("sources", T.ArrayType(T.StringType())),
    T.StructField("score", T.DoubleType()),
    T.StructField("bj_s", T.DoubleType()),
    T.StructField("bj_has", T.BooleanType()),
    T.StructField("bj_url", T.StringType()),
    T.StructField("bj", T.StringType()),
    T.StructField("replays", T.LongType()),
])


def canon_as_dict(spark: SparkSession,
                  layer_map: dict[str, list[dict]]) -> dict:
    """{(label, original_id): canon_id} — the catalog-sized canonical map
    (stage 4 output), collected once for closure broadcast."""
    return {(r["label"], r["original_id"]): r["canon_id"]
            for r in canonical_map(spark, layer_map).collect()}


def _sent_key(score: float, sentence: str | None) -> tuple:
    """Total order matching Spark's struct(score, sentence) max: null
    sentence sorts below any string.  Used for the EVIDENCE-level argmax
    (best sentence per (url, label, canon_id))."""
    return (score, sentence is not None, sentence or "")


def _doc_pairs(results: dict, canon_map: dict,
               predicate_map: dict,
               residual_links: list[tuple] | None = None) -> dict:
    """Per-document evidence pairing — the row-local twin of
    materialize.evidence_rows + the pairing join in materialize_triples,
    restricted to one url.  Returns {(subj, pred, obj): (pair_score,
    justification)} with the per-url max already folded by the batch
    tie-break order (pair_score, has_sentence, url[=const here],
    subj_label) — associative with the cross-url aggregation in
    ``stream_triples_live``, so the global result is unchanged."""
    # evidence: best (score, sentence) per (label, canon_id)
    ev: dict[tuple[str, str], tuple[float, str | None]] = {}
    for label, entries in results.items():
        for ent in entries:
            # explicit None check == F.coalesce(original_id, value): an
            # empty-string original_id must NOT fall through to value
            entity_id = ent.get("original_id")
            if entity_id is None:
                entity_id = ent.get("value")
            score = float(ent.get("NER_score", 0.0) or 0.0)
            sentence = ent.get("sentence")
            canon_id = canon_map.get((label, entity_id), entity_id)
            key = (label, canon_id)
            cur = ev.get(key)
            if cur is None:
                ev[key] = (score, sentence)
            else:
                best_sent = max((_sent_key(*cur), cur),
                                (_sent_key(score, sentence),
                                 (score, sentence)))[1][1]
                ev[key] = (max(cur[0], score), best_sent)

    # residual-link evidence (label, original_id, score) — sentence-free,
    # exactly like the batch residual_links branch of evidence_rows
    for (label, entity_id, score) in (residual_links or ()):
        canon_id = canon_map.get((label, entity_id), entity_id)
        key = (label, canon_id)
        cur = ev.get(key)
        if cur is None:
            ev[key] = (float(score or 0.0), None)
        else:
            best_sent = max((_sent_key(*cur), cur),
                            (_sent_key(float(score or 0.0), None),
                             (float(score or 0.0), None)))[1][1]
            ev[key] = (max(cur[0], float(score or 0.0)), best_sent)

    by_label: dict[str, list[tuple[str, float, str | None]]] = {}
    for (label, canon_id), (score, sentence) in ev.items():
        by_label.setdefault(label, []).append((canon_id, score, sentence))

    # within one url the batch best-justification struct (s, has_s, url,
    # subj_label) reduces to (s, has_s, subj_label)
    pairs: dict[tuple[str, str, str], tuple[float, str | None]] = {}
    cand_keys: dict[tuple[str, str, str], tuple] = {}
    for (subj_label, obj_label), pred in predicate_map.items():
        for subj, s_score, s_sent in by_label.get(subj_label, ()):
            for obj, o_score, _o_sent in by_label.get(obj_label, ()):
                if subj == obj:
                    continue
                pair_score = min(max(s_score, 0.0), max(o_score, 0.0))
                key = (subj, pred, obj)
                # first key component is pair_score, so the winner also
                # carries the max pair_score for the (triple, url) fold
                ck = (pair_score, s_sent is not None, subj_label)
                if key not in pairs or ck > cand_keys[key]:
                    pairs[key] = (pair_score, s_sent)
                    cand_keys[key] = ck
    return pairs


class RowLinker:
    """Frozen-catalog entity linking (L2-L5) for ONE document at a time —
    the row-local twin of ``linking.build_links`` + the best-link rule of
    ``linking.best_links``.  Neither the variant table nor the node
    embeddings depend on the corpus, so the pass is exact inside a
    streaming UDF; only BM25 (corpus df/m/avgdl) cannot move here.

    Built once on the driver, shipped in the UDF closure (catalog-sized,
    broadcast semantics)."""

    def __init__(self, layer_map: dict[str, list[dict]],
                 semantic: bool = True,
                 threshold: float | None = None) -> None:
        from ..config import SIM_THRESHOLD
        from ..functions.embedder import embed_batch
        from ..operators.linking import (node_embedding_rows,
                                         node_variant_rows)
        self.threshold = SIM_THRESHOLD if threshold is None else threshold
        self.semantic = semantic
        self.variants: dict[str, list[tuple]] = {}
        for label, variant, oid, name in node_variant_rows(layer_map):
            self.variants.setdefault(variant, []).append((label, oid, name))
        if semantic:
            rows = node_embedding_rows(layer_map)
            self.emb_matrix = embed_batch([r["text"] for r in rows])
            self.emb_nodes = [(r["label"], r["original_id"], r["name"])
                              for r in rows]
        self._embed = embed_batch

    def _links_for(self, residue: dict) -> dict[tuple, tuple]:
        """residue {bucket: [values]} -> {(label, oid_l): (best link tuple,
        max_s)} where the best link follows the batch struct-max order
        (semantic over variant, then score, then semantic score, then max
        ner...) and ``max_s`` is max(link_ner_score) over ALL candidates
        for the key — mirroring batch ``best_links``' SEPARATE
        ``F.max(link_ner_score)`` aggregate (linking.py:233), which is
        independent of the struct-max winner: a bucket-matching
        variant-only candidate (s=1.0) must supply the merged score even
        when a cross-bucket semantic candidate (s=0.5) wins the struct."""
        cands: dict[tuple, list] = {}
        sem_values = []
        for bucket, values in residue.items():
            for value in values:
                for (label, oid, name) in self.variants.get(
                        value.lower(), ()):
                    s = 1.0 if bucket == label else 0.5
                    cands.setdefault(
                        (label, (oid or "").lower()), []).append(
                        (False, s, -1.0, value.lower(), "variant",
                         None, name, oid))
                if self.semantic:
                    sem_values.append((bucket, value))
        if self.semantic and sem_values:
            vecs = self._embed([v for _b, v in sem_values])
            sims = vecs @ self.emb_matrix.T
            for (bucket, value), row in zip(sem_values, sims):
                for k in (row >= self.threshold).nonzero()[0]:
                    label, oid, name = self.emb_nodes[int(k)]
                    s = 1.0 if bucket == label else 0.5
                    ss = round(float(row[k]), 4)
                    cands.setdefault(
                        (label, (oid or "").lower()), []).append(
                        (True, s, ss, value, "semantic", ss, name, oid))

        def ordkey(c):
            # mirror of linking.best_links struct-max: null sorts lowest
            (is_sem, s, ss, ner, mt, sem, name, oid) = c
            return (is_sem, s, ss, ner, mt,
                    sem is not None, sem or 0.0,
                    name is not None, name or "",
                    oid is not None, oid or "")

        return {key: (max(cs, key=ordkey), max(c[1] for c in cs))
                for key, cs in cands.items()}

    def apply(self, results: dict, residue: dict) -> list[tuple]:
        """Fold links into ``results`` IN PLACE (NER_score = max(mention,
        link) on every matching mention entry — batch merge_links) and
        return the residual-link evidence [(label, original_id, score)]
        for keys with no mention."""
        best = self._links_for(residue)
        if not best:
            return []
        mention_keys = set()
        for category, entries in results.items():
            for ent in entries:
                oid = ent.get("original_id")
                key = (category, (oid if oid is not None else "").lower())
                mention_keys.add(key)
                hit = best.get(key)
                if hit is not None:
                    # max_s, NOT the winner's s: batch _annotate folds the
                    # separate F.max(link_ner_score) aggregate
                    ent["NER_score"] = max(
                        float(ent.get("NER_score", 0.0) or 0.0), hit[1])
        return [(label, winner[7], max_s)
                for (label, oid_l), (winner, max_s) in best.items()
                if (label, oid_l) not in mention_keys]


def stream_evidence_pairs(pages_stream: DataFrame,
                          layer_map: dict[str, list[dict]],
                          canon_map: dict,
                          predicate_map: dict | None = None,
                          lang: str = "en",
                          link: bool = True,
                          semantic: bool = True,
                          threshold: float | None = None) -> DataFrame:
    """pages stream -> (subj, pred, obj, url, pair_score, justification):
    extract + mention + frozen-catalog linking + canonicalize + per-doc
    pairing in ONE row-local mapInPandas pass (works identically on a
    batch DataFrame).  ``link=False`` restores the mentions-only view."""
    predicate_map = predicate_map or PREDICATE_MAP
    catalog = compile_catalog(layer_map)
    tagger = NerTagger(layer_map)
    linker = RowLinker(layer_map, semantic=semantic,
                       threshold=threshold) if link else None
    out_cols = [f.name for f in PAIR_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text(html)
                try:
                    results, residue, _dl = process_document(
                        text, catalog, tagger)
                except Exception:  # reference catch-and-log per doc
                    continue
                residuals = linker.apply(results, residue) if linker else []
                for (subj, pred, obj), (s, j) in _doc_pairs(
                        results, canon_map, predicate_map,
                        residuals).items():
                    rows.append({"subj": subj, "pred": pred, "obj": obj,
                                 "url": url, "pair_score": s,
                                 "justification": j})
            yield pd.DataFrame(rows, columns=out_cols)

    filtered = pages_stream.filter(F.col("lang") == lang) \
        if lang is not None else pages_stream
    return filtered.select("url", "html").mapInPandas(run, PAIR_SCHEMA)


def stream_triples_live(pairs: DataFrame,
                        max_sources: int = 64) -> DataFrame:
    """Stateful streaming rollup of evidence pairs into live triples.

    Keyed by (subj, pred, obj); per-key state is bounded: (exact distinct
    source count, k-smallest source urls, max score, best justification).
    Assumes each url arrives in exactly one micro-batch (file-drop / log
    semantics — the same url-disjointness the batch incremental chunks
    rely on); duplicate urls *within* a batch are deduped exactly.
    Emits the updated triple row per key per trigger (update mode)."""

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, sources, score, bj_s, bj_has, bj_url, bj, replays = state.get
            sources = list(sources)
        else:
            n, sources, score = 0, [], 0.0
            bj_s, bj_has, bj_url, bj = float("-inf"), False, "", None
            replays = 0

        prior = set(sources)
        seen_urls: set[str] = set()
        for pdf in pdfs:
            for url, s, j in zip(pdf["url"], pdf["pair_score"],
                                 pdf["justification"]):
                j = None if pd.isna(j) else j
                s = float(s)
                if url not in seen_urls:
                    seen_urls.add(url)
                    if url in prior:
                        # PROVEN replay of a url counted in an earlier
                        # trigger (it survives in the k-smallest sample):
                        # surface the contract violation, do not recount.
                        # Replays of urls OUTSIDE the sample are
                        # undetectable with bounded state (documented).
                        replays += 1
                    else:
                        n += 1
                score = max(score, s)
                # cross-url best-justification order — the streaming twin
                # of the batch argmax key struct(s, has_sentence, url)
                # (materialize._bj; subj_label already folded per url)
                if (s, j is not None, url) > (bj_s, bj_has, bj_url):
                    bj_s, bj_has, bj_url, bj = s, j is not None, url, j
            sources = sorted(set(sources) | seen_urls)[:max_sources]

        state.update((n, sources, score, bj_s, bj_has, bj_url, bj, replays))
        subj, pred, obj = key
        yield pd.DataFrame([{
            "subj": subj, "pred": pred, "obj": obj,
            "sources": sources, "n_sources": n,
            "justification": bj, "score": round(score, 4),
            "replays_detected": replays,
        }])

    return pairs.groupBy("subj", "pred", "obj").applyInPandasWithState(
        update, TRIPLE_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


# --------------------------------------------------------------------------
# Shape 1: exact micro-batch pipeline (stages 3-5 in foreachBatch)
# --------------------------------------------------------------------------

def kg_batch_step(pages_batch: DataFrame, batch_id: int,
                  layer_map: dict[str, list[dict]],
                  stats: DataFrame, df_table: DataFrame,
                  canon: DataFrame, out_path: str,
                  semantic: bool = True,
                  threshold: float | None = None,
                  lang: str = "en") -> None:
    """One exact micro-batch of stages 2-5: mention -> frozen-stats BM25 ->
    link -> evidence -> PARTIAL triple aggregate, appended under
    ``batch_id=<id>`` with dynamic partition overwrite (replaying the same
    batch_id rewrites its partition — exactly-once)."""
    from ..config import SIM_THRESHOLD
    threshold = SIM_THRESHOLD if threshold is None else threshold

    filtered = (pages_batch.filter(F.col("lang") == lang)
                if lang is not None else pages_batch)
    stage2 = mention.detect_mentions(
        filtered.select("url", "html"), layer_map, from_html=True).persist()
    batch_mentions = mention.mentions_view(stage2)
    scored = bm25.add_bm25_frozen(
        batch_mentions,
        mention.doc_lengths_view(stage2), stats, df_table)
    links = linking.build_links(
        mention.residue_view(stage2), layer_map,
        semantic=semantic, threshold=threshold)
    keys = (batch_mentions.select(
        "url", "category",
        F.lower(F.coalesce("original_id", F.lit(""))).alias("oid_l"))
        .distinct())
    merged, residual = linking.merge_links(scored, links, mention_keys=keys)
    ev = materialize.evidence_rows(merged, residual, canon)
    part = (materialize.partial_triples(ev)
            .withColumn("batch_id", F.lit(int(batch_id))))
    # NOT repartition(batch_id): batch_id is constant per micro-batch, so
    # hashing it funnels every row into ONE task — the serial-tail class
    # pipeline._write pins against.  partitionBy alone yields the one dir
    # per batch; the partial aggregate's existing distribution sets the
    # task count.
    (part.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(out_path))
    stage2.unpersist()


def run_kg_stream(pages_stream: DataFrame,
                  layer_map: dict[str, list[dict]],
                  stats: DataFrame, df_table: DataFrame,
                  canon: DataFrame, out_path: str,
                  checkpoint: str,
                  semantic: bool = True,
                  threshold: float | None = None,
                  lang: str = "en",
                  available_now: bool = False):
    """Start the exact micro-batch KG pipeline over a pages stream.
    Returns the StreamingQuery; read the result with ``merged_triples``."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        kg_batch_step(batch_df, batch_id, layer_map, stats, df_table,
                      canon, out_path, semantic=semantic,
                      threshold=threshold, lang=lang)

    writer = (pages_stream.writeStream.foreachBatch(step)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_triples(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the streamed per-batch partials into final triples —
    identical output to the single-shot batch materialize (tested)."""
    partials = spark.read.parquet(out_path).drop("batch_id")
    return materialize.merge_partial_triples(partials)
