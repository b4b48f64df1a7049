"""Round-5 protocol driver: runs ONE N-vs-4N protocol (args: low high
[n_pages]) with the steal-gated rep loop and dumps the raw results as
JSON to stdout/BENCH — BASELINE.md is hand-merged afterwards (it carries
curated history sections main() would overwrite)."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_scaling as bs  # noqa: E402

low = int(sys.argv[1]) if len(sys.argv) > 1 else 1
high = int(sys.argv[2]) if len(sys.argv) > 2 else 4
n_pages = int(sys.argv[3]) if len(sys.argv) > 3 else 256_000
results, eff = bs._protocol(low, high, n_pages, 32, 1)
out = {"low": low, "high": high, "n_pages": n_pages,
       "eff": round(eff, 3), "results": results}
tag = f"{low}v{high}"
(Path(__file__).resolve().parents[1] / "BENCH" /
 f"protocol_r5_{tag}.json").write_text(json.dumps(out, indent=1))
print("PROTOCOL " + json.dumps(out))
