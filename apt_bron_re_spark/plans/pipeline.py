"""The 5-stage KG-construction pipeline over staged parquet tables.

    pages -> extract -> mention -> link -> canonicalize -> materialize

Each stage writes an idempotent parquet table under ``base_dir`` (bucketed
by ``pbucket = pmod(murmur3(url), n_buckets)`` — exactly Spark's
HashPartitioning partition id, so url-partitioned plans write with no
extra shuffle; the parquet stand-in for Iceberg's ``bucket(url)``
partition transform — a production deployment swaps the writer for
``df.writeTo(...).partitionedBy(bucket(N, "url"))`` with zero logic
changes) and appends per-bucket lineage rows.  ``run(resume=True)``
skips stages whose fingerprint already completed — kill the job at any
stage boundary and re-running continues where it stopped.

Stage-table layout (versioned stage tables replace the reference's
in-place file rewrites — SURVEY.md §3):
    docs/            url, text (+ pbucket column; batch writes carry no
    mentions/        partition dirs — the UDF output streams straight to
                     parquet with NO shuffle; incremental writers lay
                     out pbucket=N dirs for per-bucket resume/pruning)
    linked/          mention rows + bm25 + link annotations, pbucket=N
    links_residual/  dirs written SHUFFLE-FREE (partitions are
                     pbucket-pure by construction)
    canon/           (label, original_id, canon_id)
    triples/         subj, pred, obj, sources[], justification, score
                     partitioned by pred (S10)
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import NER_MATCH_SCORE, SIM_THRESHOLD
from ..operators import bm25, canonicalize, linking, materialize, mention
from ..operators.extract import extract_docs
from .lineage import LineageLog, fingerprint

# Bucket-layout identity of a base_dir.  pbucket was crc32(url) % n in
# round 2 and pmod(murmur3(url), n) since round 3 — a silent layout change
# would make per-bucket incremental resume re-process urls whose OLD
# bucket completed and skip urls that moved into completed buckets
# (duplicated/missing rows).  A marker file pins the layout at first
# write; a mismatched resume fails fast instead of mis-bucketing.
LAYOUT_ID = "pbucket=pmod(murmur3_hash(url),n_buckets)"


class Pipeline:
    def __init__(self, spark: SparkSession,
                 layer_map: dict[str, list[dict]],
                 base_dir: str | Path,
                 n_buckets: int = 32,
                 semantic: bool = True,
                 sim_threshold: float = SIM_THRESHOLD,
                 lang: str | None = "en",
                 fuse_extract: bool = False,
                 canon_cache_dir: str | Path | None = None,
                 catalog: str | None = None) -> None:
        """``fuse_extract=True`` runs E1 inside the mention UDF and skips
        materializing the docs table (half the stage-table IO; the same
        byte-identical extractor).  The unfused default keeps the extract
        checkpoint for stage-level resume granularity.

        ``canon_cache_dir``: reuse the canonical map ACROSS pipeline runs
        keyed by the catalog fingerprint.  The canon table is a
        catalog-derived dimension (stage 4 depends only on the alias
        graph, never on the corpus) — the same precompute-once shape as
        the reference's node-embedding cache (embeddings.py) — so
        recomputing the connected-components job per corpus run is pure
        fixed latency; with a cache it is a parquet read.

        ``catalog``: the Iceberg one-line swap (S7/S8 proper).  When set
        (e.g. ``"ice.db"``), every stage table becomes the Iceberg table
        ``<catalog>.<name>`` written via ``writeTo(...).partitionedBy(
        bucket(n_buckets, url))`` — the real partition transform the
        parquet ``pbucket`` column emulates — and incremental chunks use
        ``overwritePartitions()`` (Iceberg's native dynamic overwrite,
        same exactly-once semantics as the parquet path).  Requires an
        Iceberg runtime on the session (tests/test_iceberg_optional.py
        runs the full pipeline this way when ``SPARK_ICEBERG_JAR`` is
        set; the sandbox has no jars, so it skips explicitly)."""
        self.spark = spark
        self.layer_map = layer_map
        self.base = Path(base_dir)
        self.n_buckets = n_buckets
        self.semantic = semantic
        self.sim_threshold = sim_threshold
        self.lang = lang
        self.fuse_extract = fuse_extract
        self.canon_cache_dir = canon_cache_dir
        self.catalog = catalog
        self.log = LineageLog(spark, base_dir)
        self._catalog_fp = fingerprint(layer_map)
        self._record_threads: list = []   # deferred lineage-record scans
        if not catalog:
            self._check_layout()

    def _check_layout(self) -> None:
        """Pin the base_dir's bucket layout (LAYOUT_ID + n_buckets): a
        resume against a base_dir written under a different layout fails
        fast instead of silently mixing bucket assignments.  Iceberg-mode
        skips this — the bucket transform lives in table metadata."""
        marker = self.base / "_layout.json"
        want = {"layout": LAYOUT_ID, "n_buckets": self.n_buckets}
        if marker.exists():
            got = json.loads(marker.read_text())
            if got != want:
                raise RuntimeError(
                    f"base_dir {self.base} was written with layout {got}, "
                    f"this build uses {want}; use a fresh base_dir (or "
                    "matching n_buckets) — resuming would mis-bucket")
        else:
            # A base_dir that already holds stage output but NO marker
            # predates the marker scheme (pre-round-3 crc32 pbuckets) or
            # lost it — stamping the CURRENT layout would silently
            # grandfather unknown-layout data and a resume could
            # mis-bucket, the exact failure this guard exists to prevent.
            existing = ([] if not self.base.exists() else
                        [p.name for p in self.base.iterdir()
                         if p.name != marker.name])
            if existing:
                raise RuntimeError(
                    f"base_dir {self.base} contains stage output "
                    f"({sorted(existing)[:5]}...) but no _layout.json — "
                    "its bucket layout is unknown; use a fresh base_dir "
                    "(resuming unmarked data could mis-bucket)")
            self.base.mkdir(parents=True, exist_ok=True)
            marker.write_text(json.dumps(want))

    def _canon_stage(self, resume: bool = True) -> DataFrame:
        """Stage 4 with the optional cross-run cache (constructor doc).
        ``resume=False`` (the documented full-recompute path) rebuilds the
        stage table; an already-PUBLISHED cache (dir with ``_SUCCESS``) is
        kept as-is — cache content is a pure function of the catalog
        fingerprint, so a rebuild would republish identical bytes.  A
        cache dir WITHOUT ``_SUCCESS`` (half-written by a legacy
        non-atomic writer, or a crashed copy) is treated as ABSENT and
        replaced (rename-away + rename-in), so a stale husk never blocks
        publication.  Publication is atomic (write to a temp dir, rename
        into place) so concurrent pipelines sharing ``canon_cache_dir``
        never read a half-written cache."""
        fp3 = self._fp3()
        if self.canon_cache_dir is not None:
            cache = Path(self.canon_cache_dir) / f"canon_{fp3[:16]}"
            if resume and (cache / "_SUCCESS").exists():
                if not self.log.is_complete("canonicalize", fp3):
                    t0 = time.time()
                    if self.catalog:
                        self._write(self.spark.read.parquet(str(cache)),
                                    "canon")
                    else:
                        # the published cache IS the stage table's parquet
                        # layout — a filesystem copy is byte-identical and
                        # skips a whole Spark read->write job (several
                        # fixed job latencies on a catalog-sized table,
                        # paid on every fresh-base-dir run that hits a
                        # warm shared cache).  tmp + rename keeps the
                        # stage-dir publication atomic, same as the
                        # cache's own.
                        dst = Path(self._path("canon"))
                        tmp = dst.with_name(
                            f"canon.tmp-{os.getpid()}-{time.time_ns()}")
                        try:
                            shutil.copytree(cache, tmp)
                            if dst.exists():
                                shutil.rmtree(str(dst), ignore_errors=True)
                            tmp.rename(dst)
                        except OSError:
                            # don't orphan a canon.tmp-* inside base_dir on
                            # a mid-copy/rename failure; fall back to the
                            # Spark read->write path (slower, same bytes)
                            shutil.rmtree(str(tmp), ignore_errors=True)
                            self._write(
                                self.spark.read.parquet(str(cache)),
                                "canon")
                    self.log.record("canonicalize", fp3,
                                    self._read("canon"), time.time() - t0)
                return self._read("canon")
            out = self._run_stage(
                "canonicalize", fp3,
                lambda: canonicalize.canonical_map(self.spark, self.layer_map),
                "canon", resume=resume)
            tmp = cache.with_name(
                f"{cache.name}.tmp-{os.getpid()}-{time.time_ns()}")
            out.write.mode("overwrite").parquet(str(tmp))
            try:
                if cache.exists() and not (cache / "_SUCCESS").exists():
                    # half-written husk (legacy non-atomic writer / crash):
                    # rename it away so the fresh build can publish — a
                    # rename, not an in-place delete, so a concurrent
                    # reader of the husk (already wrong) can't see a
                    # partially-deleted tree.  The exists/_SUCCESS check
                    # is NOT atomic against a concurrent publication at
                    # the same path, so re-check AFTER the rename: if the
                    # grabbed dir turns out to hold _SUCCESS we raced a
                    # concurrent publisher and stole a VALID cache — put
                    # it back (or drop our copy if a third publisher
                    # already refilled the slot; content is a pure
                    # function of the fingerprint, so any published copy
                    # is interchangeable).
                    husk = cache.with_name(
                        f"{cache.name}.husk-{os.getpid()}-{time.time_ns()}")
                    try:
                        cache.rename(husk)
                    except OSError:
                        pass  # lost a rename race; fall through to the
                        # cache.exists() checks below
                    else:
                        if (husk / "_SUCCESS").exists():
                            try:
                                husk.rename(cache)
                            except OSError:
                                shutil.rmtree(str(husk),
                                              ignore_errors=True)
                        else:
                            shutil.rmtree(str(husk), ignore_errors=True)
                if cache.exists():
                    # a concurrent run already published an identical cache
                    # (content is a pure function of the fingerprint)
                    shutil.rmtree(str(tmp), ignore_errors=True)
                else:
                    tmp.rename(cache)
            except OSError:
                shutil.rmtree(str(tmp), ignore_errors=True)
            return out
        return self._run_stage(
            "canonicalize", fp3,
            lambda: canonicalize.canonical_map(self.spark, self.layer_map),
            "canon", resume=resume)

    # -- helpers ----------------------------------------------------------
    def _path(self, name: str) -> str:
        return str(self.base / name)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        # "pbucket" (partition bucket) — distinct from the NER residue
        # "bucket" column of the mention stage table.  Defined as
        # pmod(murmur3(url), n) — EXACTLY Spark's HashPartitioning(url, n)
        # partition-id expression (same hash, same seed 42) — so a plan
        # that is repartition(n, url)-partitioned has pbucket-PURE
        # partitions and can be written partitionBy("pbucket") with no
        # further shuffle (one file per bucket dir per branch).
        return df.withColumn(
            "pbucket", F.pmod(F.hash(F.col("url")), F.lit(self.n_buckets)).cast("int"))

    def _write(self, df: DataFrame, name: str, partition_by: list[str] | None = None,
               pre_partitioned: bool = False) -> None:
        if self.catalog:
            w = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
            if partition_by == ["pbucket"]:
                # the REAL bucket transform the parquet pbucket emulates
                w = w.partitionedBy(F.bucket(self.n_buckets, F.col("url")))
            elif partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        if pre_partitioned:
            # the builder guarantees the plan is already
            # HashPartitioning(url, n_buckets)-clustered (or a union of
            # such branches): every task holds exactly one pbucket value
            # (see _bucketed), so partitionBy writes one file per dir per
            # branch with NO write-side shuffle.
            pass
        elif partition_by == ["pbucket"]:
            # WIDE bucketed stage tables: pin the partition COUNT
            # (REPARTITION_BY_NUM).  A bare repartition(col) is
            # AQE-coalescible, and AQE's 64MB advisory size collapses the
            # zstd parquet encode to 1-2 tasks — a data-sized SERIAL tail
            # that capped the link stage at ~1.3x on 4 cores (measured at
            # 256k pages; the encode is CPU-bound, not IO).  pbucket is
            # uniform (pmod(murmur3(url), n) — see _bucketed), so pinning
            # loses no skew handling.
            df = df.repartition(self.n_buckets, F.col("pbucket"))
        elif partition_by:
            # low-cardinality partition columns (pred): ALSO pinned.  A
            # rebalance hint was tried here and AQE's 64MB advisory
            # re-serialized the triples encode into 1 task on most runs
            # (materialize stage 31 s <-> 132 s across identical reps);
            # hashing the ~11 preds into n_buckets partitions gives ~8-10
            # stable write tasks (measured: materialize 66.8 -> 36.2 s at
            # 256k pages, local[4]).
            df = df.repartition(self.n_buckets, *[F.col(c) for c in partition_by])
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def _read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def _run_stage(self, stage: str, fp: str, build, name: str,
                   partition_by: list[str] | None = None,
                   resume: bool = True,
                   pre_partitioned: bool = False,
                   record_async: bool = False) -> DataFrame:
        """``record_async=True`` moves the lineage record's per-bucket
        count scan (a full extra pass over the just-written table) off
        the serial path onto a background thread, so the NEXT stage
        starts immediately — the data write is already committed, which
        is the only ordering the resume invariant needs (a crash before
        the deferred append just re-runs the stage idempotently on
        resume).  Appends are lock-serialized in LineageLog; the thread
        is joined in _join_records() before run() returns."""
        if resume and self.log.is_complete(stage, fp):
            return self._read(name)
        t0 = time.time()
        df = build()
        self._write(df, name, partition_by, pre_partitioned=pre_partitioned)
        out = self._read(name)
        wall = time.time() - t0
        if record_async:
            self._spawn_record(stage, lambda: self.log.record(
                stage, fp, out, wall))
        else:
            self.log.record(stage, fp, out, wall)
        return out

    def _spawn_record(self, stage: str, fn) -> None:
        """Run a deferred lineage record on a background thread, capturing
        any exception so _join_records can surface it (ADVICE r6: a
        silently-failed record leaves the stage's summary row missing —
        run() would report success while the next resume re-runs the
        stage and bench stage-wall attribution comes up short)."""
        import threading
        box: list[BaseException] = []

        def _run() -> None:
            try:
                fn()
            except BaseException as exc:
                box.append(exc)

        th = threading.Thread(target=_run, name=f"lineage-record-{stage}")
        th.start()
        self._record_threads.append((th, box))

    def _join_records(self) -> None:
        import warnings
        while self._record_threads:
            th, box = self._record_threads.pop()
            th.join()
            if box:
                warnings.warn(
                    f"deferred lineage record {th.name!r} failed: "
                    f"{box[0]!r} — the stage's summary row is missing, so "
                    "the next resume will re-run that stage (idempotent) "
                    "and its per-stage wall is absent from metrics()")

    def _run_link_stage(self, fp: str, build, resume: bool = True
                        ) -> DataFrame:
        """Link stage runner: writes the linked table and the residual
        side table as CONCURRENT jobs (the reference's thread-parallel
        driver, L7/E3, applied at the job level — Spark's FIFO scheduler
        interleaves their tasks).  The residual job is latency-dominated
        (narrow anti-join + small write), so overlapping it under the
        linked write removes a serial tail at higher parallelism while
        costing nothing at one thread.  The shared ``links`` subplan is
        persisted by the builder; a cache race at worst duplicates that
        narrow compute.  The lineage row is recorded only after BOTH
        writes commit, preserving resume atomicity."""
        import threading

        if resume and self.log.is_complete("link", fp):
            return self._read("linked")
        t0 = time.time()
        merged, residual = build()
        err: list[BaseException] = []

        def _res() -> None:
            try:
                self._write(residual, "links_residual",
                            partition_by=["pbucket"], pre_partitioned=True)
            except BaseException as exc:  # surfaced after join
                err.append(exc)

        th = threading.Thread(target=_res, name="links-residual-write")
        th.start()
        try:
            self._write(merged, "linked", partition_by=["pbucket"],
                        pre_partitioned=True)
        finally:
            th.join()
        if err:
            raise err[0]
        out = self._read("linked")
        wall = time.time() - t0
        # deferred like the mention record (_run_stage record_async):
        # both writes are committed; the count scan overlaps materialize
        self._spawn_record("link", lambda: self.log.record(
            "link", fp, out, wall))
        return out

    def _fp3(self) -> str:
        """Canonicalize-stage fingerprint — the SINGLE definition (it keys
        both the lineage rows and the cross-run canon cache; a second
        copy that drifted would silently desynchronize cache hits from
        lineage skips).  CANON_ALGO_VERSION folds code changes into the
        key that the catalog fingerprint cannot see."""
        return fingerprint(self._catalog_fp, "canonicalize",
                           canonicalize.CANON_ALGO_VERSION)

    def _fps(self) -> tuple[str, str, str, str, str]:
        """The stage fingerprint chain (fp0..fp4) for the current config."""
        fp0 = fingerprint(self._catalog_fp, self.lang, "extract")
        if self.fuse_extract:
            fp1 = fingerprint(fp0, NER_MATCH_SCORE, "mention", "fused")
        else:
            fp1 = fingerprint(fp0, NER_MATCH_SCORE, "mention")
        fp2 = fingerprint(fp1, self.semantic, self.sim_threshold, "link")
        fp3 = self._fp3()
        fp4 = fingerprint(fp2, fp3, "materialize")
        return fp0, fp1, fp2, fp3, fp4

    def _write_buckets(self, df: DataFrame, name: str,
                       partition_col: str = "pbucket") -> None:
        """Exactly-once per-partition write for incremental chunks: dynamic
        partition overwrite replaces exactly the chunk's partitions, so a
        retry after a kill between data-commit and lineage-append rewrites
        the same partitions instead of appending duplicates."""
        if self.catalog:
            tbl = f"{self.catalog}.{name}"
            if self.spark.catalog.tableExists(tbl):
                # Iceberg's native dynamic overwrite: replaces exactly the
                # partitions the chunk touches — same exactly-once story
                df.writeTo(tbl).overwritePartitions()
            else:
                w = df.writeTo(tbl).using("iceberg")
                if partition_col == "pbucket":
                    w = w.partitionedBy(
                        F.bucket(self.n_buckets, F.col("url")))
                else:
                    w = w.partitionedBy(partition_col)
                w.create()
            return
        (df.repartition(self.n_buckets, F.col(partition_col))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(partition_col)
         .parquet(self._path(name)))

    # -- stages -----------------------------------------------------------
    def run(self, pages: DataFrame, resume: bool = True) -> DataFrame:
        # Batch stage-1/2 writes keep the pbucket COLUMN but skip the
        # bucketing repartition + partitionBy dirs: the mention UDF output
        # streams straight from the scan-aligned tasks into parquet — no
        # wide shuffle of sentence-bearing rows just to lay out dirs the
        # batch path never prunes on.  (The link stage establishes its own
        # url partitioning from the scan.)  The per-bucket layout matters
        # only for chunked-incremental resume, whose own writers
        # (run_mention_incremental/_write_buckets) still produce it; reads
        # work identically on either layout because pbucket is a column
        # filter there, with dir pruning as a bonus when dirs exist.
        #
        # Canon overlap: stage 4 is CATALOG-derived (canonical_map never
        # reads the corpus), yet ran serially between link and
        # materialize — several seconds of catalog-sized pointer-jumping
        # job latency in the timed span of every fresh run.  Build it on
        # a background thread under the CPU-bound mention/link stages
        # (the reference's thread-parallel driver, L7/E3, same machinery
        # as the residual-write overlap): its tiny jobs interleave with
        # the mention UDF tasks at near-zero wall cost.  Lineage appends
        # are lock-serialized (LineageLog._append), and the canon stage
        # writes only its own paths, so the overlap is race-free.
        import threading

        canon_box: dict[str, object] = {}

        def _canon_bg() -> None:
            try:
                canon_box["df"] = self._canon_stage(resume)
            except BaseException as exc:
                canon_box["err"] = exc

        canon_th = threading.Thread(target=_canon_bg, name="canon-stage")
        canon_th.start()
        try:
            return self._run_body(pages, resume, canon_th, canon_box)
        finally:
            # join canon + deferred records on EVERY exit path (ADVICE
            # r6): a mention-stage failure must not leave the canon
            # thread racing a caller's spark.stop(), and a canon failure
            # that loses to another exception should still be visible.
            canon_th.join()
            self._join_records()
            if "err" in canon_box:
                import sys
                import warnings
                exc = sys.exc_info()[1]
                if exc is not None and exc is not canon_box["err"]:
                    warnings.warn(
                        "canon stage ALSO failed (suppressed in favor of "
                        f"the propagating error): {canon_box['err']!r}")

    def _run_body(self, pages: DataFrame, resume: bool,
                  canon_th, canon_box: dict) -> DataFrame:
        fp0 = fingerprint(self._catalog_fp, self.lang, "extract")
        if self.fuse_extract:
            fp1 = fingerprint(fp0, NER_MATCH_SCORE, "mention", "fused")
            filtered = (pages.filter(F.col("lang") == self.lang)
                        if self.lang is not None else pages)
            stage2 = self._run_stage(
                "mention", fp1,
                lambda: self._bucketed(mention.detect_mentions(
                    filtered.select("url", "html"), self.layer_map,
                    from_html=True)),
                "mentions", resume=resume, record_async=True)
        else:
            docs = self._run_stage(
                "extract", fp0,
                lambda: self._bucketed(extract_docs(pages, self.lang)),
                "docs", resume=resume)

            fp1 = fingerprint(fp0, NER_MATCH_SCORE, "mention")
            stage2 = self._run_stage(
                "mention", fp1,
                lambda: self._bucketed(
                    mention.detect_mentions(docs.drop("pbucket"), self.layer_map)),
                "mentions", resume=resume, record_async=True)

        fp2 = fingerprint(fp1, self.semantic, self.sim_threshold, "link")

        def build_linked() -> DataFrame:
            # ONE url hash-partitioning for the whole stage: mentions and
            # residues are each repartitioned by url once, and every
            # downstream operation preserves it — BM25 tf (groupBy keys
            # include url), the df/stats joins (broadcast against frozen
            # catalog-bounded tables), the score join, the best-link
            # aggregation + dedup (keys include url), the L6 merge join,
            # and the residual anti-join all run EXCHANGE-FREE.  The
            # scored/passthrough union happens at the very END (a union
            # erases partitioning info, which round 2 measured as the
            # partitioning-destroying step), and the stage write needs no
            # repartition because pbucket == the partition id (_bucketed).
            # The wide scored plan stays SINGLE-CONSUMER and un-persisted:
            # the residual anti-join takes its keys from a narrow pre-BM25
            # projection; dl comes free from the mention stage's 'doc'
            # rows — no text re-scan.
            # ONE physical exchange for all three stage-table views
            # (round 7, the r6 verdict's "share one exchange" item,
            # measured +0.9 s): the views are disjoint rec_type filters
            # over the same table, so repartitioning the TABLE once and
            # filtering above it lets ReuseExchange collapse the
            # mention/residue/doc-length subtrees onto a single shuffle
            # (two scans + two exchanges before), and doc lengths come
            # out url-co-partitioned for the score join as a bonus.
            # Filters preserve the HashPartitioning(url), so every
            # downstream exchange-free invariant (and the
            # pre_partitioned write) holds unchanged.  A/B at sf1.0
            # pages: link-compute noop 4.3/3.9 -> 3.0/3.1 s.
            st = stage2.repartition(self.n_buckets, F.col("url"))
            m = mention.mentions_view(st)
            r = mention.residue_view(st)
            dls = mention.doc_lengths_view(st)

            # BM25 globals inline: df is catalog-bounded (its keys are
            # catalog entity names), so it broadcasts — which keeps the
            # tf stream's url partitioning intact — and its build subtree
            # shares the url-repartition exchange with the main scored
            # stream (ReuseExchange), so no extra pass over the wide
            # table and no aux-table write jobs.  The chunked-incremental
            # path (run_link_incremental) still freezes these to parquet,
            # where cross-session exactness requires it.
            stats, df_ = bm25.bm25_global_stats(m, dls)
            scored, passthrough = bm25.add_bm25_frozen_split(
                m, dls, stats, df_)

            links = linking.build_links(
                r, self.layer_map,
                semantic=self.semantic, threshold=self.sim_threshold).persist()
            keys = (m.select(
                "url", "category",
                F.lower(F.coalesce("original_id", F.lit(""))).alias("oid_l"))
                .distinct())
            # invariant check for the passthrough shortcut: every linkable
            # label must be BM25-scored (true for the BRON-shaped catalog:
            # links exclude the cpe family and cve is regex-only).
            from ..config import BM25_LABELS
            from ..operators.linking import LINKED_LABELS_EXCLUDE
            may_link = bool(
                (set(self.layer_map) - LINKED_LABELS_EXCLUDE)
                - set(BM25_LABELS))
            merged_s, merged_p, residual = linking.merge_links_split(
                scored, passthrough, links, mention_keys=keys,
                passthrough_may_link=may_link)
            merged = self._bucketed(merged_s).unionByName(
                self._bucketed(merged_p))
            return merged, self._bucketed(residual)

        try:
            linked = self._run_link_stage(fp2, build_linked, resume=resume)
        finally:
            # join before materialize (and on a link failure, before the
            # exception propagates); a mention-stage failure lets the
            # canon thread finish on its own — it writes only its own
            # stage paths, idempotently, and is joined at interpreter
            # shutdown (non-daemon)
            canon_th.join()
        residual = self._read("links_residual")

        fp3 = self._fp3()
        if "err" in canon_box:
            raise canon_box["err"]  # noqa: B904 — original stage error
        canon = canon_box["df"]

        fp4 = fingerprint(fp2, fp3, "materialize")
        triples = self._run_stage(
            "materialize", fp4,
            lambda: materialize.materialize_triples(
                materialize.evidence_rows(linked, residual, canon),
                partitions=self.n_buckets),
            "triples", partition_by=["pred"], resume=resume)
        self._join_records()
        return triples

    def triples(self) -> DataFrame:
        return self._read("triples")

    # -- per-partition incremental execution --------------------------------
    def run_mention_incremental(self, pages: DataFrame,
                                n_chunks: int = 4,
                                max_chunks: int | None = None) -> bool:
        """Execute the (fused) mention stage in bucket-group chunks with a
        per-bucket lineage checkpoint after each chunk — the north-star
        resume mechanism: kill the job between chunks and a re-run
        anti-joins the completed buckets out of the input and appends only
        the missing ones.  Idempotence: a chunk's parquet files become
        visible only at job commit, so a mid-chunk kill leaves no partial
        rows.

        ``max_chunks`` processes at most that many chunks (test hook to
        simulate interruption).  Returns True when the stage is complete
        (summary lineage row written).
        """
        fp0 = fingerprint(self._catalog_fp, self.lang, "extract")
        fp1 = fingerprint(fp0, NER_MATCH_SCORE, "mention", "fused")
        if self.log.is_complete("mention", fp1):
            return True

        filtered = (pages.filter(F.col("lang") == self.lang)
                    if self.lang is not None else pages)
        filtered = filtered.withColumn(
            "pbucket",
            F.pmod(F.hash(F.col("url")), F.lit(self.n_buckets)).cast("int"))

        done = self.log.completed_buckets("mention", fp1)
        all_buckets = list(range(self.n_buckets))
        pending = [b for b in all_buckets if b not in done]
        chunk_size = max(1, (len(all_buckets) + n_chunks - 1) // n_chunks)
        chunks = [pending[i:i + chunk_size]
                  for i in range(0, len(pending), chunk_size)]

        processed = 0
        for chunk in chunks:
            if max_chunks is not None and processed >= max_chunks:
                return False
            t0 = time.time()
            part = filtered.filter(F.col("pbucket").isin(chunk))
            out = mention.detect_mentions(
                part.select("url", "html"), self.layer_map, from_html=True)
            out = self._bucketed(out)
            if self.catalog:
                tbl = f"{self.catalog}.mentions"
                if self.spark.catalog.tableExists(tbl):
                    out.writeTo(tbl).append()
                else:
                    (out.writeTo(tbl).using("iceberg")
                     .partitionedBy(F.bucket(self.n_buckets, F.col("url")))
                     .create())
            else:
                (out.repartition(*[F.col("pbucket")])
                 .write.mode("append").partitionBy("pbucket")
                 .parquet(self._path("mentions")))
            written = self._read("mentions").filter(
                F.col("pbucket").isin(chunk))
            counts = {r["pbucket"]: r["n"] for r in
                      written.groupBy("pbucket")
                      .agg(F.count("*").alias("n")).collect()}
            # buckets with zero rows still checkpoint
            for b in chunk:
                counts.setdefault(b, 0)
            self.log.record_buckets("mention", fp1, counts, time.time() - t0)
            processed += 1

        total = self._read("mentions").count()
        self.log.record_summary("mention", fp1, total, 0.0)
        return True

    def _pending_chunks(self, stage: str, fp: str, n_chunks: int
                        ) -> list[list[int]]:
        done = self.log.completed_buckets(stage, fp)
        pending = [b for b in range(self.n_buckets) if b not in done]
        size = max(1, (self.n_buckets + n_chunks - 1) // n_chunks)
        return [pending[i:i + size] for i in range(0, len(pending), size)]

    def run_link_incremental(self, n_chunks: int = 4,
                             max_chunks: int | None = None) -> bool:
        """Bucket-chunked link stage with per-bucket lineage resume.

        The link stage consumes corpus-GLOBAL BM25 statistics (m, avgdl,
        df) — naive per-chunk scoring would compute wrong idf — so the
        globals are materialized ONCE from the complete mention table
        (link_aux_stats/link_aux_df, guarded by a lineage row) and every
        chunk scores against the frozen tables.  Everything else in the
        stage (tf, dl, link generation, L6 merge, residuals) is url-local,
        so chunking by url-bucket is exact.  Chunk writes use dynamic
        partition overwrite: a retry rewrites its partitions idempotently.
        """
        _fp0, _fp1, fp2, _fp3, _fp4 = self._fps()
        if self.log.is_complete("link", fp2):
            return True
        stage2 = self._read("mentions")

        aux_fp = fingerprint(fp2, "link_aux")
        if not self.log.is_complete("link_aux", aux_fp):
            stats, df_ = bm25.bm25_global_stats(
                mention.mentions_view(stage2),
                mention.doc_lengths_view(stage2))
            self._write(stats, "link_aux_stats")
            self._write(df_, "link_aux_df")
            self.log.record_summary("link_aux", aux_fp, 1, 0.0)
        stats = self._read("link_aux_stats")
        df_ = self._read("link_aux_df")

        processed = 0
        for chunk in self._pending_chunks("link", fp2, n_chunks):
            if max_chunks is not None and processed >= max_chunks:
                return False
            t0 = time.time()
            part = stage2.filter(F.col("pbucket").isin(chunk))
            part_mentions = mention.mentions_view(part)
            scored = bm25.add_bm25_frozen(
                part_mentions,
                mention.doc_lengths_view(part), stats, df_)
            links = linking.build_links(
                mention.residue_view(part), self.layer_map,
                semantic=self.semantic, threshold=self.sim_threshold)
            keys = (part_mentions.select(
                "url", "category",
                F.lower(F.coalesce("original_id", F.lit(""))).alias("oid_l"))
                .distinct())
            merged, residual = linking.merge_links(scored, links,
                                                   mention_keys=keys)
            self._write_buckets(merged, "linked")
            self._write_buckets(self._bucketed(residual), "links_residual")
            counts = {r["pbucket"]: r["n"] for r in
                      self._read("linked").filter(F.col("pbucket").isin(chunk))
                      .groupBy("pbucket").agg(F.count("*").alias("n"))
                      .collect()}
            for b in chunk:
                counts.setdefault(b, 0)
            self.log.record_buckets("link", fp2, counts, time.time() - t0)
            processed += 1

        self.log.record_summary("link", fp2,
                                self._read("linked").count(), 0.0)
        return True

    def run_materialize_incremental(self, n_chunks: int = 4,
                                    max_chunks: int | None = None) -> bool:
        """Bucket-chunked materialize with merge-on-append: each chunk
        writes an exact PARTIAL triple aggregate (k-smallest sources,
        distinct-source count, best justification, max score — all
        mergeable because chunks partition the corpus by url), and the
        final merge reduces the partials into the triples table.  Identical
        output to single-shot materialize_triples (tested)."""
        _fp0, _fp1, fp2, fp3, fp4 = self._fps()
        if self.log.is_complete("materialize", fp4):
            return True
        linked = self._read("linked")
        residual = self._read("links_residual")
        canon = self._canon_stage(resume=True)

        processed = 0
        for chunk in self._pending_chunks("materialize", fp4, n_chunks):
            if max_chunks is not None and processed >= max_chunks:
                return False
            t0 = time.time()
            ev = materialize.evidence_rows(
                linked.filter(F.col("pbucket").isin(chunk)),
                residual.filter(F.col("pbucket").isin(chunk)),
                canon)
            part = (materialize.partial_triples(ev, partitions=self.n_buckets)
                    .withColumn("chunk_key", F.lit(min(chunk))))
            self._write_buckets(part, "triples_partial",
                                partition_col="chunk_key")
            n_part = self._read("triples_partial").filter(
                F.col("chunk_key") == min(chunk)).count()
            self.log.record_buckets(
                "materialize", fp4, {b: n_part for b in chunk},
                time.time() - t0)
            processed += 1

        triples = materialize.merge_partial_triples(
            self._read("triples_partial").drop("chunk_key"))
        self._write(triples, "triples", partition_by=["pred"])
        self.log.record_summary("materialize", fp4,
                                self._read("triples").count(), 0.0)
        return True
