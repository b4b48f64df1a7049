"""Round-agnostic protocol driver: runs ONE N-vs-4N protocol (args: low
high [n_pages] [tag] [page_scale]) with the steal-gated rep loop and
dumps the raw results as JSON to stdout + BENCH/protocol_{tag}_{NvM}.json
— BASELINE.md is hand-merged afterwards (it carries curated history
sections main() would overwrite).

page_scale (default 1) multiplies the filler-prose volume per page
(sources/pages.py `scale`) — the round-6 realism run uses scale=10 with
n_pages/10 so total corpus bytes stay protocol-comparable while the text
column matches the 10-100 KB web-page profile.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_scaling as bs  # noqa: E402

low = int(sys.argv[1]) if len(sys.argv) > 1 else 1
high = int(sys.argv[2]) if len(sys.argv) > 2 else 4
n_pages = int(sys.argv[3]) if len(sys.argv) > 3 else 256_000
tag = sys.argv[4] if len(sys.argv) > 4 else "r6"
page_scale = int(sys.argv[5]) if len(sys.argv) > 5 else 1
results, eff = bs._protocol(low, high, n_pages, 32, page_scale)
out = {"low": low, "high": high, "n_pages": n_pages,
       "page_scale": page_scale,
       "eff": round(eff, 3), "results": results}
(Path(__file__).resolve().parents[1] / "BENCH" /
 f"protocol_{tag}_{low}v{high}.json").write_text(json.dumps(out, indent=1))
print("PROTOCOL " + json.dumps(out))
