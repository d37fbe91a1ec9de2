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

    log("timed runs (best of 3)...")
    elapsed = float("inf")
    size = 0
    for i in range(3):
        t0 = time.time()
        size = run_pipeline(devices, options, seed=2 + i)
        elapsed = min(elapsed, time.time() - t0)
    log(f"timed: {elapsed:.1f}s (best of 3), total bench time "
        f"{time.time() - t_start:.1f}s, agg proof {size} bytes")

    print(json.dumps({
        "metric": "stark_bs1_full_pipeline_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
