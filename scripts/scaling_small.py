"""Small-working-set scaling run (north-rule evidence, round 3).

The 1M-doc end-to-end build is capped in this sandbox by the host's
serialized page-supply wall above ~14GB resident (BENCH/BASELINE.md).
This run keeps the whole job inside the fast-backed working set
(250k docs) so the host artifact is out of the picture, and measures
the SAME build+query job at local[8] vs local[32].  Writes
BENCH/scaling_small.json; BASELINE.md cites it — this script never
overwrites BASELINE.md.

Usage: python3 scripts/scaling_small.py [--rows 250000]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=250_000)
    ap.add_argument("--levels", type=str, default="8,32",
                    help="N,4N core counts (both should sit on the same side "
                         "of the box's memory-bus saturation knee)")
    args = ap.parse_args()

    levels = tuple(int(x) for x in args.levels.split(","))
    results = {}
    for cores in levels:
        out = subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "scaling_bench.py"),
             "--cores", str(cores), "--rows", str(args.rows)],
            capture_output=True, text=True, timeout=3600,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-3000:])
            print(out.stderr[-3000:])
            raise SystemExit(f"no JSON from cores={cores}")
        results[cores] = json.loads(lines[-1])
        print(f"cores={cores}: {results[cores]['docs_per_sec']} docs/s, "
              f"qps={results[cores]['query_qps_concurrent']}")
    lo, hi = sorted(results)
    ratio = hi / lo
    summary = {
        "rows": args.rows,
        "runs": results,
        "build_scaling_efficiency_N_to_4N": round(
            (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / ratio, 3),
        "query_qps_scaling_efficiency_N_to_4N": round(
            (results[hi]["query_qps_concurrent"] / results[lo]["query_qps_concurrent"]) / ratio, 3),
        "note": "working set fits under the sandbox's ~14GB fast-backed "
                "resident budget at both levels; the serialized page-supply "
                "artifact documented in BASELINE.md does not engage",
    }
    out_name = "scaling_small.json" if levels == (8, 32) else f"scaling_small_{levels[0]}_{levels[1]}.json"
    (ROOT / "BENCH" / out_name).write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
