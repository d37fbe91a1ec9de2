"""Headline benchmark — prints ONE JSON line on stdout.

Metric: wall seconds for the full `--step proof` pipeline at bs=1 with 8
devices (8 training STARKs + 1 aggregation STARK, all verified), measured
warm (run 2), on whatever backend JAX picks (the real TPU chip under the
driver).  Baseline: the reference's own ETA table records ~7 s/run for the
Rust/Winterfell binary at bs=1 on its (unspecified) CPU
(`verification/time_memory_analytics/batch_automation.py:38`, BASELINE.md).
vs_baseline = baseline_seconds / our_seconds (>1 means faster than the
reference).

Progress goes to stderr; stdout carries exactly the one JSON line.
"""

import json
import os
import sys
import tempfile
import time


BASELINE_SECONDS = 7.0  # Rust/Winterfell bs=1 full run (batch_automation.py:38)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_pipeline(devices, options, seed):
    import numpy as np

    from zk_stark_project_tpu.cli import run_proof_pipeline

    rng = np.random.default_rng(seed)
    _, _, agg_proof = run_proof_pipeline(devices, 1, options, rng,
                                         verbose=False)
    return agg_proof.size_bytes


def main():
    t_start = time.time()
    from zk_stark_project_tpu.prover.options import REFERENCE_OPTIONS
    from zk_stark_project_tpu.utils.data import (create_synthetic_device_data,
                                                 discover_devices)
    import numpy as np

    with tempfile.TemporaryDirectory() as d:
        create_synthetic_device_data(d, num_devices=8, rows=60, seed=11)
        devices = discover_devices(d, rng=np.random.default_rng(5))

    options = REFERENCE_OPTIONS
    log(f"warmup run (compiles)... options={options}")
    t0 = time.time()
    run_pipeline(devices, options, seed=1)
    log(f"warmup (cold, includes XLA/Mosaic compiles not in the "
        f"persistent cache): {time.time() - t0:.1f}s")

    n_runs = int(os.environ.get("ZKSTARK_BENCH_RUNS", "10"))
    log(f"timed runs (best of {n_runs}, spread recorded)...")
    times = []
    size = 0
    for i in range(n_runs):
        t0 = time.time()
        size = run_pipeline(devices, options, seed=2 + i)
        times.append(time.time() - t0)
    best = min(times)
    mean = sum(times) / len(times)
    std = (sum((t - mean) ** 2 for t in times) / len(times)) ** 0.5
    log(f"timed: best {best:.3f}s  mean {mean:.3f}s  std {std:.3f}s "
        f"over {n_runs} runs ({', '.join(f'{t:.2f}' for t in times)}); "
        f"total bench time {time.time() - t_start:.1f}s, "
        f"agg proof {size} bytes")

    print(json.dumps({
        "metric": "stark_bs1_full_pipeline_seconds",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / best, 3),
        "mean": round(mean, 3),
        "std": round(std, 3),
        "runs": n_runs,
    }))


if __name__ == "__main__":
    main()
