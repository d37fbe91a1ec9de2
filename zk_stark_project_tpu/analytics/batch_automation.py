"""Batch-size sweep automation — port of
`verification/time_memory_analytics/batch_automation.py:13-113`: sweep the
unified harness over batch sizes x runs with an ETA estimator.

The reference's hard-coded per-run time estimates (its only recorded perf
numbers, `batch_automation.py:37-42` / BASELINE.md) are kept for the ETA
display and as the vs-baseline denominators.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Dict, List

from .harness import run_unified

#: the reference's ETA tables (`batch_automation.py:37-42`), seconds/run.
SNARK_ESTIMATES: Dict[int, float] = {1: 10, 10: 128, 20: 292, 30: 558,
                                     40: 1012}
STARK_ESTIMATES: Dict[int, float] = {1: 7, 10: 9, 20: 12, 30: 12, 40: 16}


def estimate_seconds(bs: int, kind: str = "stark") -> float:
    table = STARK_ESTIMATES if kind == "stark" else SNARK_ESTIMATES
    if bs in table:
        return table[bs]
    # extrapolation rule (`batch_automation.py:42`)
    return 2.0 * bs if kind == "stark" else 25.0 * bs


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--batch-sizes", nargs="+", type=int,
                        default=[1, 10, 20, 30, 40, 50])
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--extra", nargs="*", default=[])
    args = parser.parse_args(argv)

    eta = sum(estimate_seconds(bs) for bs in args.batch_sizes) * args.runs
    print(f"sweep: bs={args.batch_sizes} x {args.runs} runs; reference-CPU "
          f"ETA would be ~{eta:.0f}s", file=sys.stderr)
    t0 = time.time()
    paths: List[str] = []
    for bs in args.batch_sizes:
        print(f"--- batch size {bs} ---", file=sys.stderr)
        paths.append(run_unified(args.data_dir, bs, args.runs,
                                 steps=["proof"], extra_args=args.extra,
                                 out_dir=args.out_dir))
    print(f"sweep done in {time.time() - t0:.0f}s", file=sys.stderr)
    for p in paths:
        print(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
