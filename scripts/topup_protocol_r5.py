"""Round-5 top-up reps for the 1v4 protocol: neither level's kept rep met
the 8 s steal gate in run1 (local[1] best 19.1 s, local[4] best 17.2 s),
so this reruns BOTH levels (protocol-faithful: no level is singled out)
until each lands one sub-gate rep or the extra budget (4/level) runs
out, merges with the run1 results keeping each level's best-throughput
rep, and rewrites BENCH/protocol_r5_1v4.json with the combined rep
history."""
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
import bench_scaling as bs  # noqa: E402

path = Path(sys.argv[1]) if len(sys.argv) > 1 else (
    HERE.parent / "BENCH" / "protocol_r5_1v4.json")
d = json.loads(path.read_text())

for i, cpus in enumerate((d["low"], d["high"])):
    prior = d["results"][i]
    if prior.get("steal_s", 99) < 8.0:
        print(f"[topup] local[{cpus}] already quiet "
              f"({prior['steal_s']} s) — skipping")
        continue
    extra = bs._level_reps(cpus, d["n_pages"], 32, 1,
                           max_reps=4, min_reps=1)
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
