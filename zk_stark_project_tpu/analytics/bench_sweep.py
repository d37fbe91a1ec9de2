"""Batch-size sweep of the full proof pipeline — the reference's recorded
baseline table re-measured on TPU.

The only concrete numbers the reference publishes are the ETA estimates in
its sweep driver (`verification/time_memory_analytics/batch_automation.py:
37-38`): STARK ~7 s at bs=1, ~9/12/12/16 s at bs=10/20/30/40, rule
"STARK ~= 2*bs s".  This tool runs the same sweep (8 training proofs +
1 aggregation proof, all verified) warm on the chip and records
wall-clock, per-proof trace shape, proof sizes, and the vs-reference
speedup per point.

    python -m zk_stark_project_tpu.analytics.bench_sweep \
        [--bs 1 10 20 30 40 50] [--reps 3] [--csv bench_sweep.csv]

bs=50 is the 8192-row-trace point (`src/training/prover.rs:65`:
trace_len = next_pow2(120*bs)) — the throughput regime, vs the bs=1
latency regime the headline bench.py measures.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np

#: reference ETA seconds per run (batch_automation.py:37-38 + its 2*bs rule)
REFERENCE_STARK_SECONDS = {1: 7.0, 10: 9.0, 20: 12.0, 30: 12.0, 40: 16.0}


def reference_seconds(bs: int) -> float:
    return REFERENCE_STARK_SECONDS.get(bs, 2.0 * bs)


def run_point(devices, bs: int, options, reps: int) -> dict:
    from ..cli import run_proof_pipeline
    from ..models.training import trace_length_for

    best = float("inf")
    sizes = 0
    for i in range(reps):
        rng = np.random.default_rng(100 + i)
        t0 = time.perf_counter()
        _, train_sizes, agg_proof = run_proof_pipeline(
            devices, bs, options, rng, verbose=False)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        sizes = train_sizes + agg_proof.size_bytes
    ref_s = reference_seconds(bs)
    return {
        "bs": bs,
        "trace_len": trace_length_for(bs),
        "seconds": round(best, 3),
        "total_proof_bytes": sizes,
        "reference_seconds": ref_s,
        "speedup_vs_reference": round(ref_s / best, 3),
    }


def main(argv=None) -> int:
    import jax

    from ..prover.options import REFERENCE_OPTIONS
    from ..utils.data import create_synthetic_device_data, discover_devices

    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, nargs="*",
                        default=[1, 10, 20, 30, 40, 50])
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--csv", default="bench_sweep.csv")
    args = parser.parse_args(argv)

    with tempfile.TemporaryDirectory() as d:
        create_synthetic_device_data(d, num_devices=8, rows=60, seed=11)
        devices = discover_devices(d, rng=np.random.default_rng(5))

    rows = []
    for bs in args.bs:
        print(f"bs={bs}: warmup...", file=sys.stderr, flush=True)
        run_point(devices, bs, REFERENCE_OPTIONS, 1)   # compile warm
        row = run_point(devices, bs, REFERENCE_OPTIONS, args.reps)
        row["backend"] = jax.default_backend()
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.csv:
        import csv
        import os
        fields = sorted({k for r in rows for k in r})
        exists = os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            if not exists:
                w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
