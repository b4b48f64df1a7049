"""The BASELINE.md-documented tmpfs protocol run: identical to
bench_scaling but with stage tables, inputs and shuffle spill on
/dev/shm, taking the sandbox's single shared virtual disk (whose
background noise swings single runs ±30% and which no thread count can
speed up) out of the N-vs-4N ratio.  Prints the per-protocol results;
BASELINE.md is hand-annotated with them (this script does not overwrite
the canonical record).

Usage: TMPDIR=/dev/shm SPARK_LOCAL_DIRS=/dev/shm \
           python scripts/scaling_shm.py [n_pages]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_scaling import _protocol  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000
    res14, eff14 = _protocol(1, 4, n_pages, 32, 1)
    print("SHM14 " + json.dumps({"eff": round(eff14, 3), "levels": res14}))
    res28, eff28 = _protocol(2, 8, n_pages, 32, 1)
    print("SHM28 " + json.dumps({"eff": round(eff28, 3), "levels": res28}))


if __name__ == "__main__":
    main()
