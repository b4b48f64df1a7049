"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the full 5-stage KG
pipeline on the deterministic synthetic page corpus (size scaled to sf),
then prints ONE JSON line:

    {"metric": "triples_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ...}

The primary value is the KG pipeline's triples/sec (BASELINE.json metric).
Query executions are forced with the noop sink (full plan, no driver
collect).  Use scripts/bench_scaling.py for the N-vs-4N parallelism
scaling run recorded in BENCH/BASELINE.md.

The final stdout line is kept COMPACT (best walls + kg_reps with
per-stage walls): the full per-query rep history with steal brackets is
written to a sidecar (default BENCH/bench_reps_latest.json, override via
$SPARK_GRAFT_REPS_OUT) — round 5's record went unparsed when the rep
history rode the stdout line past the driver's tail-capture window.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from apt_bron_re_spark.queries import SPARK_QUERIES  # noqa: E402

HEADLINE = [
    "dict_first_mention",
    "bm25_terms",
    "cooccur_triples",
    "theta_join_sim",
    "ann_topk",
    "tpch_q1",
    "orders_by_nation",
    "window_running",
    "events_hourly",
    "part_revenue",
    "ngram_jaccard_dups",
    "quality_score",
    # training-data operators (all oracled since round 2)
    "near_dup_pipeline",     # MinHash-LSH -> exact-Jaccard verify (scale path)
    "near_dup_clusters",     # + CC -> canonical representative (round 4)
    "minhash_dedup",
    "simhash_docs",
    "shared_passages",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dups",
    "connected_components",
    "lang_id_pred",
    "stratified_sample",     # deterministic hash-threshold sampling (round 6)
]

# pages per unit scale factor for the synthetic KG corpus
PAGES_PER_SF = 40_000


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _steal_s() -> float | None:
    """Accumulated host vCPU-steal seconds (None when unreadable)."""
    try:
        return int(open("/proc/stat").readline().split()[8]) / os.sysconf(
            "SC_CLK_TCK")
    except Exception:
        return None


def run_kg_pipeline(spark, sf: float,
                    workdir: str) -> tuple[float, int, dict]:
    """Returns (wall seconds, triples emitted, per-stage wall dict).

    The stage walls come from the pipeline's own ``_lineage`` summary rows
    (bucket = -1), the same source the scaling protocol records, so a
    headline move in the driver artifact is attributable to a stage
    without re-running the protocol.
    """
    from apt_bron_re_spark.catalog.synthetic import build_layer_map
    from apt_bron_re_spark.plans.pipeline import Pipeline
    from apt_bron_re_spark.sources.pages import pages_df

    n_pages = max(200, int(PAGES_PER_SF * sf))
    pages_path = os.path.join(workdir, "pages")
    pages_df(spark, n_pages).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    base = os.path.join(workdir, "stages")
    pipe = Pipeline(spark, build_layer_map(), base, n_buckets=32,
                    fuse_extract=True)
    t0 = time.time()
    triples = pipe.run(pages, resume=False)
    n_triples = triples.count()
    wall = time.time() - t0
    stages = {r.stage: round(r.wall_s, 1)
              for r in pipe.log.metrics().filter("bucket = -1").collect()}
    return wall, n_triples, stages


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = 0.1

    from apt_bron_re_spark.session import get_spark
    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))

    # untimed warmup: session/Arrow/codegen spin-up shouldn't land on the
    # first measured query
    force(SPARK_QUERIES["lang_stats"](spark, sf_dir))

    # Bounded quiet-window wait before the timed section (round-5 verdict
    # #6 — wire the quiet-runner tactic into the driver bench itself).
    # Costs one 20 s confirmation window on a quiet day; on a noisy day it
    # waits up to SPARK_GRAFT_QUIET_WAIT_S (default 300) for the host
    # steal rate to drop below 0.05 steal-s per wall-s, then proceeds
    # REGARDLESS (the bench must never fail for noise — the per-rep steal
    # brackets below still record whatever window it actually got).
    quiet_wait = {"waited_s": 0.0, "opened": None}
    wait_budget = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT_S", "300"))
    # Fixed-work probe (scripts/calib.py) alongside the steal rate: steal
    # only sees runnable-time theft, so a cycle-slowing window (frequency /
    # co-location — round 6 measured ~1.22x walls under a quiet bracket)
    # needs the probe-vs-min-ever-reference ratio to become visible.
    sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
    try:
        import calib
    except ImportError:
        calib = None

    def _calib_ratio() -> float | None:
        if calib is None:
            return None
        c = calib.cpu_calib_s()
        return calib.degradation(c, calib.update_ref(c))

    CALIB_GATE = 1.10
    if wait_budget > 0 and _steal_s() is not None:
        RATE, WINDOW, POLL = 0.05, 20.0, 5.0
        t_start = time.time()
        quiet_since = None
        s_prev, t_prev = _steal_s(), time.time()
        while time.time() - t_start < wait_budget:
            time.sleep(POLL)
            s_now, t_now = _steal_s(), time.time()
            rate = (s_now - s_prev) / (t_now - t_prev)
            s_prev, t_prev = s_now, t_now
            if rate < RATE:
                quiet_since = quiet_since or t_now
                if t_now - quiet_since >= WINDOW:
                    ratio = _calib_ratio()
                    if ratio is not None and ratio > CALIB_GATE:
                        quiet_since = None  # steal-quiet but degraded
                        continue
                    quiet_wait["opened"] = True
                    quiet_wait["calib_ratio"] = ratio
                    break
            else:
                quiet_since = None
        quiet_wait["waited_s"] = round(time.time() - t_start, 1)
        if quiet_wait["opened"] is None:
            quiet_wait["opened"] = False  # EX_TEMPFAIL analog: proceed anyway

    # Steal-gated rep retry for EVERY timing (round-5 verdict #1 — rounds
    # 2-4 each had the authoritative record misstate the code's speed from
    # episodic vCPU steal; in r4 the 22 single-shot micro timings read
    # 1.5-4x slower than r3 purely from noise while only kg_pipeline was
    # rep-gated).  Each query reps until one lands in a quiet window —
    # steal below STEAL_RATE_GATE of its own wall (host steal is in
    # CPU-seconds, so the gate scales with the measured span; FLOOR absorbs
    # clock granularity on sub-second queries) — or the rep budget runs
    # out.  Best wall is recorded, with every rep's steal bracket in
    # `query_reps` so the noise evidence rides the artifact.
    MAX_REPS, MIN_REPS = 3, 2
    STEAL_RATE_GATE, STEAL_FLOOR_S = 0.25, 0.5

    def quiet(wall: float, steal: float | None) -> bool:
        return steal is None or steal <= max(STEAL_FLOOR_S,
                                             STEAL_RATE_GATE * wall)

    timings: dict[str, float] = {}
    query_reps: dict[str, list[dict]] = {}
    for name in HEADLINE:
        reps: list[dict] = []
        best = None
        for _rep in range(MAX_REPS):
            s0 = _steal_s()
            t0 = time.time()
            force(SPARK_QUERIES[name](spark, sf_dir))
            wall = time.time() - t0
            s1 = _steal_s()
            steal = (round(s1 - s0, 1)
                     if s0 is not None and s1 is not None else None)
            reps.append({"wall_s": round(wall, 3), "steal_s": steal})
            if best is None or wall < best:
                best = wall
            # min 2 reps (the first carries plan-compile/codegen warmup),
            # then stop on the first quiet window
            if _rep + 1 >= MIN_REPS and quiet(wall, steal):
                break
        timings[name] = round(best, 3)
        query_reps[name] = reps

    # kg_pipeline keeps its larger rep budget (it is the headline metric)
    MAX_KG_REPS = 4
    kg_reps: list[dict] = []
    kg_wall, n_triples = None, 0
    best_kg_calib = None
    for _rep in range(MAX_KG_REPS):
        workdir = tempfile.mkdtemp(prefix="bench_kg_")
        s0 = _steal_s()
        try:
            wall, n, stages = run_kg_pipeline(spark, sf, workdir)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        s1 = _steal_s()
        rep_steal = (round(s1 - s0, 1)
                     if s0 is not None and s1 is not None else None)
        rep_calib = _calib_ratio()
        kg_reps.append({"wall_s": round(wall, 3), "steal_s": rep_steal,
                        "calib_ratio": rep_calib, "stages": stages})
        if kg_wall is None or wall < kg_wall:
            kg_wall, n_triples, best_kg_calib = wall, n, rep_calib
        healthy = rep_calib is None or rep_calib <= CALIB_GATE
        if _rep + 1 >= MIN_REPS and quiet(wall, rep_steal) and healthy:
            break
    timings["kg_pipeline"] = round(kg_wall, 3)
    query_reps["kg_pipeline"] = kg_reps

    triples_per_sec = round(n_triples / kg_wall, 2) if kg_wall > 0 else 0.0
    # host-noise evidence alongside the timings: loadavg and accumulated
    # vCPU steal bracket the run so a noisy-neighbour window is visible in
    # the recorded artifact (round-2 note: single runs swing +-30%)
    try:
        load1 = float(open("/proc/loadavg").read().split()[0])
        steal_s = int(open("/proc/stat").readline().split()[8]) / os.sysconf(
            "SC_CLK_TCK")
    except Exception:
        load1, steal_s = None, None
    # Per-rep steal evidence for every micro query goes to a SIDECAR file,
    # not stdout: round 5's record went unparsed because the single stdout
    # JSON line outgrew the driver's tail-capture window once query_reps
    # (~60 rep dicts) rode it.  The contract is ONE COMPACT final line —
    # best walls + the (small) kg_reps with per-stage walls — with the
    # full rep history on disk next to the other bench artifacts.
    reps_out = os.environ.get(
        "SPARK_GRAFT_REPS_OUT",
        str(Path(__file__).resolve().parent / "BENCH"
            / "bench_reps_latest.json"))
    try:
        Path(reps_out).parent.mkdir(parents=True, exist_ok=True)
        Path(reps_out).write_text(json.dumps({
            "query_reps": query_reps,
            "kg_reps": kg_reps,
            "quiet_wait": quiet_wait,
            "sf": sf, "cpus": cpus,
        }, indent=1))
    except OSError:
        reps_out = None
    print(json.dumps({
        "metric": "triples_per_sec",
        "value": triples_per_sec,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_triples": n_triples,
        "loadavg_end": load1,
        "steal_total_s": steal_s,
        "calib_ratio": best_kg_calib,
        "quiet_wait": quiet_wait,
        "kg_reps": kg_reps,
        "reps_sidecar": reps_out,
    }))


if __name__ == "__main__":
    main()
