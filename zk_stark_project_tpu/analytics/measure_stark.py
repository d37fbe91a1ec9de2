"""Per-step STARK profiler — port of
`analytics/measure_stark_aggregator.py:26-127`: run each workflow step once,
record wall time + peak RSS, append to `aggregator_final_analytics.csv`.
(The reference's `cargo build --release` phase has no analog — the framework
JIT-compiles; the first timed run notes compile-inclusive time.)
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

from .harness import run_step


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--bs", type=int, default=1)
    parser.add_argument("--out", default="aggregator_final_analytics.csv")
    parser.add_argument("--extra", nargs="*", default=[])
    args = parser.parse_args(argv)

    rows = []
    for step in ("setup", "witness", "proof"):
        res = run_step(step, args.data_dir, args.bs, args.extra)
        rows.append({"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                     "step": step, "bs": args.bs,
                     "time_s": f"{res['time_s']:.2f}",
                     "peak_rss_mb": f"{res['peak_rss_mb']:.1f}",
                     "proof_size": res["proof_size"]})
        print(f"{step}: {res['time_s']:.1f}s {res['peak_rss_mb']:.0f}MB",
              file=sys.stderr)

    exists = os.path.exists(args.out)
    with open(args.out, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        if not exists:
            w.writeheader()
        w.writerows(rows)
    print(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
