"""Physical-plan audit -> PLANS.md.

Captures .explain("formatted") for the headline queries and pipeline
stages and checks the plan properties the 100 TB design relies on:

  * column pruning / predicate pushdown reach the parquet scan
    (ReadSchema excludes unused columns; PushedFilters non-empty);
  * small dimension joins are BroadcastHashJoin, fact-fact joins are
    shuffle joins (SortMergeJoin/ShuffledHashJoin);
  * relational expressions sit inside WholeStageCodegen spans;
  * the mention/extract UDF stages are single narrow projections
    (no shuffle before the stage write).

Writes PLANS.md with the verdicts + plan excerpts.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import os
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pyspark.sql import functions as F

    from apt_bron_re_spark.catalog.synthetic import build_layer_map
    from apt_bron_re_spark.operators import bm25 as bm25_mod
    from apt_bron_re_spark.operators.extract import extract_docs
    from apt_bron_re_spark.operators.mention import detect_mentions
    from apt_bron_re_spark.queries import SPARK_QUERIES
    from apt_bron_re_spark.session import get_spark
    from apt_bron_re_spark.sources.pages import pages_df

    spark = get_spark("explain_audit", shuffle_partitions=8)
    layers = build_layer_map()
    checks: list[tuple[str, str, list[str], list[str]]] = []

    # 1. extract stage: lang filter pushed, only url+html read
    pages = pages_df(spark, 50)
    pages_path = "/tmp/_audit_pages"
    pages.write.mode("overwrite").parquet(pages_path)
    pages_pq = spark.read.parquet(pages_path)
    p = plan_of(extract_docs(pages_pq))
    checks.append((
        "extract stage (pages parquet -> docs)", p,
        # lang filter pushed to the scan; ReadSchema pruned to url+html
        # (never reads the gold text or warc_ts columns)
        ["PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]",
         "ReadSchema: struct<url:string,html:binary,lang:string>"],
        [],
    ))

    # 2. mention stage: narrow mapInPandas, no shuffle
    docs = extract_docs(pages_pq)
    p = plan_of(detect_mentions(docs, layers))
    checks.append((
        "mention stage (docs -> mentions)", p,
        ["MapInPandas"],
        ["Exchange"],
    ))

    # 3. BM25: expect shuffle aggs + a broadcast of the 1-row stats
    li_m = SPARK_QUERIES["bm25_terms"](spark, SF_DIR)
    p = plan_of(li_m)
    checks.append((
        "bm25_terms", p,
        ["BroadcastHashJoin", "HashAggregate"],
        [],
    ))

    # 4. tpch_q1: pruned scan + partial/final agg in codegen
    p = plan_of(SPARK_QUERIES["tpch_q1"](spark, SF_DIR))
    checks.append((
        "tpch_q1", p,
        # AQE plans print codegen ids only after execution, so the
        # codegen check is done on the non-AQE doc_lengths plan below
        ["PushedFilters", "HashAggregate"],
        ["l_comment"],
    ))

    # 5. orders_by_nation: broadcast dim join
    p = plan_of(SPARK_QUERIES["orders_by_nation"](spark, SF_DIR))
    checks.append((
        "orders_by_nation", p,
        ["BroadcastHashJoin"],
        [],
    ))

    # 6. anti join
    p = plan_of(SPARK_QUERIES["anti_join_customers"](spark, SF_DIR))
    checks.append((
        "anti_join_customers", p,
        ["LeftAnti"],
        [],
    ))

    # 7. theta join (round 7): the broadcast-nested-loop SHAPE survives —
    # b-side driver-collected, a-side streamed — but the per-pair cosine
    # folds run as numpy batch kernels in ONE MapInPandas node
    # (bit-identical accumulation order; similarity.cosine_cross_pairs),
    # so the plan must carry MapInPandas and neither a JVM BNLJ nor a
    # cartesian product
    p = plan_of(SPARK_QUERIES["theta_join_sim"](spark, SF_DIR))
    checks.append((
        "theta_join_sim", p,
        ["MapInPandas"],
        ["BroadcastNestedLoopJoin", "CartesianProduct", "BatchEvalPython"],
    ))

    # 8. doc_lengths: regexp_count stays in codegen, no array blowup
    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .selectExpr("cast(doc_id as string) as url", "text")
    p = plan_of(bm25_mod.doc_lengths(docs_df))
    checks.append((
        "bm25 doc_lengths", p,
        # token counting must not materialize token arrays
        ["regexp_replace", "codegen id"],
        ["regexp_extract_all"],
    ))

    # 9. minhash: pure JVM (no Python eval nodes), partial+final agg over
    # the exploded shingles, candidate equi-join on (band, bucket)
    p = plan_of(SPARK_QUERIES["minhash_dedup"](spark, SF_DIR))
    checks.append((
        "minhash_dedup (LSH candidates)", p,
        ["HashAggregate", "Generate"],
        ["ArrowEvalPython", "BatchEvalPython", "CartesianProduct"],
    ))

    # 10. simhash: pure JVM bit-count aggregation
    p = plan_of(SPARK_QUERIES["simhash_docs"](spark, SF_DIR))
    checks.append((
        "simhash_docs", p,
        ["HashAggregate"],
        ["ArrowEvalPython", "BatchEvalPython"],
    ))

    # 11. near-dup pipeline: LSH candidates then exact verify — still no
    # Python and no cartesian blowup anywhere
    p = plan_of(SPARK_QUERIES["near_dup_pipeline"](spark, SF_DIR))
    checks.append((
        "near_dup_pipeline (LSH -> Jaccard verify)", p,
        ["HashAggregate"],
        ["ArrowEvalPython", "BatchEvalPython", "CartesianProduct"],
    ))

    # 11b. near_dup_clusters: the iterative CC truncates its lineage per
    # round (localCheckpoint), so the FINAL plan must be a flat
    # checkpoint scan + projection — a growing per-round lineage (the
    # failure mode checkpointing prevents) would show the whole join
    # pyramid here.  Round-internal caching of the verified-pair graph
    # (the edge persist) is pinned by the wall-clock regression test in
    # the bench record instead (20 s -> 12.7 s at sf0.1, NOTES_r4).
    p = plan_of(SPARK_QUERIES["near_dup_clusters"](spark, SF_DIR))
    checks.append((
        "near_dup_clusters (LSH -> verify -> CC -> representative)", p,
        ["Scan ExistingRDD"],
        ["ArrowEvalPython", "BatchEvalPython", "CartesianProduct",
         "SortMergeJoin"],
    ))

    # 11b. alias_coverage (round-5 multi-word shape): both match stages
    # join the catalog BROADCAST (first-token prefilter, then the sparse
    # multi-word candidates rejoin the doc text for the consecutive-token
    # verify) — never a docs x catalog cross/cartesian scan
    p = plan_of(SPARK_QUERIES["alias_coverage"](spark, SF_DIR))
    checks.append((
        "alias_coverage (first-token prefilter + phrase verify)", p,
        ["BroadcastHashJoin", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ))

    # 12. ANN multi-table LSH: the signature UDF is the one intended
    # Arrow-batched Python node; candidates join on (table, bucket) with a
    # broadcast of the (tiny) query side — never a cross join
    p = plan_of(SPARK_QUERIES["ann_lsh_topk"](spark, SF_DIR))
    checks.append((
        "ann_lsh_topk (multi-table LSH ANN)", p,
        ["ArrowEvalPython", "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ))

    # 13. shared_passages: Arrow-batched fingerprint UDF + anchor equi-join
    # + count agg; no cross join
    p = plan_of(SPARK_QUERIES["shared_passages"](spark, SF_DIR))
    checks.append((
        "shared_passages (fingerprint anchors)", p,
        ["ArrowEvalPython", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ))

    # 14. evidence pairing: a row-local double explode over per-url entity
    # arrays — NO self-join at all (rounds 1-2 used a forced-SMJ self-join;
    # AQE sporadically broadcast its data-sized side), and the sentence
    # string must be ABSENT from the pairing branch (argmax-first
    # justification: only (url, label, canon_id, score, has_sentence)
    # shuffles; the sentence attaches after aggregation)
    from apt_bron_re_spark.operators.materialize import materialize_triples
    # label must VARY: a constant label constant-folds the preds equi-join
    # into a degenerate BNLJ and the check would flag an artifact
    ev = docs_df.selectExpr(
        "url",
        "CASE WHEN length(url) % 2 = 0 THEN 'group' ELSE 'technique' END"
        " as label",
        "substr(url, 1, 2) as canon_id",
        "0.5 as score", "text as sentence")
    p = plan_of(materialize_triples(ev))
    checks.append((
        "materialize pairing (row-local explode, argmax-first sentence)", p,
        ["Generate", "HashAggregate", "collect_list"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ))

    # 15. IVF ANN (round 7): centroid assignment is ONE ArrowEvalPython
    # projection (integer-exact numpy matmul argmax per Arrow batch —
    # similarity.ivf_assign; replaces the n x k BNLJ + max(struct)
    # aggregation that was 120 of ann_ivf_topk's 120 s at sf1.0); the
    # query-probe crossJoin keeps its tiny broadcast BNLJ.  No cartesian
    # product, no row-at-a-time Python.
    p = plan_of(SPARK_QUERIES["ann_ivf_topk"](spark, SF_DIR))
    checks.append((
        "ann_ivf_topk (sampled-centroid IVF)", p,
        ["ArrowEvalPython", "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "BatchEvalPython"],
    ))

    # 16. embedding near-dup (round 7): the registry row runs the
    # WIDE-bucket regime (20x4 — candidates ~ all pairs), which now takes
    # the dense MapInPandas candidate kernel + the unchanged exact JVM
    # verify joins; the narrow-bucket LSH equi-join path (the 100 TB
    # regime) is pinned separately by the dense-vs-join parity test in
    # tests/test_r07_vectorized.py.  Never a cartesian product or BNLJ.
    p = plan_of(SPARK_QUERIES["embedding_near_dups"](spark, SF_DIR))
    checks.append((
        "embedding_near_dups (sign-LSH + exact verify)", p,
        ["MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ))

    # 17/18. link + materialize stage plans over REAL stage tables: one
    # url hash-partitioning per stage.  A regression of the subset
    # co-partition reuse re-shuffles the score/merge joins onto their full
    # key sets — visible as an ENSURE_REQUIREMENTS exchange keyed
    # "hashpartitioning(category" (the score join) — and a regression of
    # argmax-first justification puts "sentence" back into the pairing
    # branch.  Built on a tiny fused mention stage in a temp dir.
    import re
    import shutil
    import tempfile

    from apt_bron_re_spark.operators import bm25 as _bm25
    from apt_bron_re_spark.operators import linking as _linking
    from apt_bron_re_spark.operators import materialize as _mat
    from apt_bron_re_spark.operators import mention as _mention
    from apt_bron_re_spark.plans.pipeline import Pipeline as _Pipeline

    td = tempfile.mkdtemp(prefix="_audit_stage_")
    lm = build_layer_map()
    pipe = _Pipeline(spark, lm, td, n_buckets=8, fuse_extract=True)
    pipe.run(pages_df(spark, 80), resume=False)
    stage2 = spark.read.parquet(f"{td}/mentions")
    m = _mention.mentions_view(stage2).repartition(8, F.col("url"))
    r = _mention.residue_view(stage2).repartition(8, F.col("url"))
    dls = _mention.doc_lengths_view(stage2)
    _stats_a, _df_a = _bm25.bm25_global_stats(m, dls)
    scored, passthrough = _bm25.add_bm25_frozen_split(
        m, dls, _stats_a, _df_a)
    links = _linking.build_links(r, lm)
    keys = m.select("url", "category", F.lower(
        F.coalesce("original_id", F.lit(""))).alias("oid_l")).distinct()
    ms_, mp_, _res = _linking.merge_links_split(
        scored, passthrough, links, keys)
    merged = pipe._bucketed(ms_).unionByName(pipe._bucketed(mp_))
    p = plan_of(merged)
    # a regression of subset co-partition reuse re-shuffles the score /
    # merge joins onto their FULL key sets — an exchange keyed on both
    # category and url.  (An exchange keyed on category alone is fine:
    # the catalog-bounded df aggregation inside the broadcast build.)
    bad_exchange = any(
        "hashpartitioning(category" in ln and ", url#" in ln
        for ln in p.splitlines() if "Arguments: hashpartitioning" in ln)
    checks.append((
        "link stage (one url partitioning; score+merge joins exchange-free)",
        p + ("" if bad_exchange else " NO_FULLKEY_RESHUFFLE"),
        # shuffle_hash joins: the wide mention stream is never SORTED
        ["REPARTITION_BY_NUM", "ShuffledHashJoin", "Union",
         "NO_FULLKEY_RESHUFFLE"],
        [],
    ))

    linked = spark.read.parquet(f"{td}/linked")
    residual = spark.read.parquet(f"{td}/links_residual")
    canon = spark.read.parquet(f"{td}/canon")
    tri = _mat.materialize_triples(
        _mat.evidence_rows(linked, residual, canon), partitions=8)
    p = plan_of(tri)
    n_repart = len(re.findall(r"REPARTITION_BY_NUM", p))
    checks.append((
        "materialize stage (single narrow url shuffle, explode pairing)",
        p,
        # ShuffledHashJoin pins the justification-attach join shape: the
        # LEFT-side shuffle_hash build on a LEFT OUTER join is honored
        # only on Spark >= 3.5 (SPARK-36612) — an older planner silently
        # falls back to SortMergeJoin and this marker catches it
        ["Generate", "REPARTITION_BY_NUM", "ShuffledHashJoin"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ))
    checks.append((
        f"materialize stage: exactly one pinned url repartition "
        f"(found {n_repart})",
        f"(derived from the plan above: {n_repart} REPARTITION_BY_NUM "
        f"exchange(s))" + (" ONE_PINNED_OK" if n_repart == 1 else ""),
        ["ONE_PINNED_OK"],
        [],
    ))
    shutil.rmtree(td, ignore_errors=True)

    # 23. stratified_sample: scan-local hash-threshold filter — the whole
    # query must be one codegen span with the schema pruned to the two
    # consumed columns (the text column never read) and zero exchanges
    p = plan_of(SPARK_QUERIES["stratified_sample"](spark, SF_DIR))
    checks.append((
        "stratified_sample (deterministic hash-threshold sampling)", p,
        ["ReadSchema: struct<doc_id:bigint,lang:string>", "Filter"],
        ["Exchange", "text#"],
    ))

    lines = ["# PLANS — physical-plan audit (explain(\"formatted\"))", "",
             "Generated by scripts/explain_audit.py; each section lists the "
             "properties the plan MUST have for the 100 TB design point, "
             "the verdict, and the plan.", ""]
    ok_all = True
    for name, plan, must, must_not in checks:
        missing = [m for m in must if m not in plan]
        present = [m for m in must_not if m in plan]
        ok = not missing and not present
        ok_all &= ok
        lines.append(f"## {name} — {'OK' if ok else 'VIOLATION'}")
        lines.append("")
        lines.append(f"- required markers: {must} -> "
                     f"{'all present' if not missing else f'MISSING {missing}'}")
        if must_not:
            lines.append(f"- forbidden markers: {must_not} -> "
                         f"{'none present' if not present else f'PRESENT {present}'}")
        lines.append("")
        lines.append("```")
        lines.append(plan.strip()[:4000])
        lines.append("```")
        lines.append("")

    (REPO / "PLANS.md").write_text("\n".join(lines))
    print(f"PLANS.md written; all checks {'OK' if ok_all else 'FAILED'}")


if __name__ == "__main__":
    main()
