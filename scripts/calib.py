"""Fixed-work CPU calibration probe — catches host slowdown steal can't see.

The round-6 link pre-force experiment (NOTES_r6 "Experiments tried and
NOT landed") hit a window where every pipeline stage ran ~1.22x the
recorded baseline while the steal counter read a quiet 5.9 s: vCPU
steal only accrues when a vCPU is RUNNABLE-but-not-running, so
frequency scaling and hypervisor co-location effects that merely slow
cycles are invisible to it.  This probe times a fixed single-thread
workload (SHA-256 over a 64 KiB block, C-speed, allocation-free) and
compares it against the fastest probe ever recorded on this box
(BENCH/calib_ref.json, self-updating minimum): a ratio well above 1.0
with a quiet steal bracket is exactly the degraded-window signature.

min-of-reps is the right estimator for the same reason best-of-reps is
for the benchmarks themselves: interference only ever SLOWS a timing.
"""
from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF_PATH = REPO / "BENCH" / "calib_ref.json"

# ~46 us per 64 KiB SHA-256 on this box -> ~0.23 s per timing, ~0.7 s
# per min-of-3 probe: cheap enough to run before AND after every rep.
CHAIN_ITERS = 5000
_BLOCK = b"\x5a" * 65536


def cpu_calib_s(iters: int = CHAIN_ITERS, reps: int = 3) -> float:
    """Seconds for the fixed workload, min over `reps` timings."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            hashlib.sha256(_BLOCK).digest()
        best = min(best, time.perf_counter() - t0)
    return best


def read_ref() -> float | None:
    """The fastest probe ever recorded on this box (None before any)."""
    try:
        return float(json.loads(REF_PATH.read_text())["calib_ref_s"])
    except (OSError, ValueError, KeyError):
        return None


def update_ref(calib_s: float) -> float:
    """Fold a new observation into the min-ever reference; returns the
    reference after the update.  Atomic tmp+rename so concurrent
    updaters can't tear the file; a lost race only delays the min by
    one observation."""
    ref = read_ref()
    if ref is None or calib_s < ref:
        ref = calib_s
        tmp = REF_PATH.with_suffix(f".tmp-{os.getpid()}")
        try:
            REF_PATH.parent.mkdir(parents=True, exist_ok=True)
            tmp.write_text(json.dumps(
                {"calib_ref_s": round(ref, 4), "iters": CHAIN_ITERS}))
            tmp.rename(REF_PATH)
        except OSError:
            tmp.unlink(missing_ok=True)
    return ref


def degradation(calib_s: float, ref: float | None = None) -> float | None:
    """calib_s as a ratio of the min-ever reference (1.0 = healthy;
    None before any reference exists)."""
    ref = ref if ref is not None else read_ref()
    return None if ref is None or ref <= 0 else round(calib_s / ref, 3)
