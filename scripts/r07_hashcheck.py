"""Round-7 equivalence harness: canonical row-set hash per query.

The optimization round's hard rule is "do not change what any declared
query computes".  This script captures an order-insensitive hash of a
query's full result (every column, exact value repr — floats via
repr(float) so ULP differences are visible) so an optimized
implementation can be diffed against the round-start implementation at
ANY scale factor, not just the oracle-checked small ones.

Usage:
    python scripts/r07_hashcheck.py --sf-dir /root/testdata/sf0.1 \
        --out /tmp/hashes_old.json [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from apt_bron_re_spark.queries import SPARK_QUERIES  # noqa: E402


def canonical_hash(df) -> tuple[str, int]:
    rows = df.collect()
    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return repr(v)
    lines = sorted(",".join(cell(v) for v in row) for row in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, len(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    names = args.queries or list(SPARK_QUERIES)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from apt_bron_re_spark.session import get_spark
    spark = get_spark("r07_hashcheck", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    out = {}
    for name in names:
        h, n = canonical_hash(SPARK_QUERIES[name](spark, args.sf_dir))
        out[name] = {"hash": h, "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
    Path(args.out).write_text(json.dumps(
        {"sf_dir": args.sf_dir, "hashes": out}, indent=1))


if __name__ == "__main__":
    main()
