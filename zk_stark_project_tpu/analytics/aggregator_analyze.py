"""Aggregator-only benchmark driver — the dedicated 3-round appendable-CSV
protocol of the reference's `verification/time_memory_analytics/aggregator/
analyze.py` (359 LoC), rebuilt for this framework.

Per round it measures the aggregation statement end-to-end and appends one
row to `analytics.csv` (+ raw memory samples to `analytics_memory.csv`),
then regenerates `final_analytics.csv` with per-client-number mean/std —
the exact reference file protocol (`aggregator/analyze.py:344-359`), so
downstream plot tooling keeps working.

Two pipelines per round:
  * STARK (this framework, in-process): trace build / prove / verify
    timings at REFERENCE_OPTIONS + peak RSS;
  * SNARK (zokrates subprocess, `snark/harness.py`): compile / setup /
    compute-witness / generate-proof / export-verifier timings — columns
    are left NaN when no `zokrates` binary exists in the environment.

Usage:
    python -m zk_stark_project_tpu.analytics.aggregator_analyze \
        [--rounds 3] [--clients 8] [--out-dir DIR] [--skip-snark]
"""

from __future__ import annotations

import argparse
import csv
import datetime
import os
import time
from typing import Dict, List, Optional

import numpy as np

STARK_COLS = ["t_trace", "t_prove", "t_verify", "proof_bytes",
              "max_mem_stark"]
SNARK_COLS = ["t_compile", "t_setup", "t_compute_witness",
              "t_generate_proof", "t_export_verifier", "max_mem_snark"]
COLUMNS = ["datetime", "client_number", "batchsize"] + STARK_COLS + SNARK_COLS


def _rss_mb() -> float:
    try:
        import psutil

        return psutil.Process().memory_info().rss / (1024 * 1024)
    except Exception:  # noqa: BLE001 - /proc fallback
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return float(line.split()[1]) / 1024
        except OSError:
            pass
        return float("nan")


def run_stark_round(clients: int, rng: np.random.Generator) -> Dict:
    from ..models import ml_math
    from ..models.aggregation import GlobalUpdateProver
    from ..models.ml_math import AC, FE
    from ..ops.signed import f64_to_felt
    from ..prover import REFERENCE_OPTIONS, prove
    from ..verifier import verify

    g_w, _, g_b, _ = ml_math.generate_initial_model(FE, AC, 10_000.0, rng)
    local_w, local_b = [], []
    for _ in range(clients):
        w, _, b, _ = ml_math.generate_initial_model(FE, AC, 1.0, rng)
        local_w.append(w)
        local_b.append(b)
    agg = GlobalUpdateProver(REFERENCE_OPTIONS, g_w, g_b, local_w, local_b,
                             f64_to_felt(float(clients)), rng=rng)
    t0 = time.time()
    trace = agg.build_trace()
    air = agg.air()
    t1 = time.time()
    proof = prove(air, trace)
    t2 = time.time()
    verify(air, proof)
    t3 = time.time()
    return {"t_trace": round(t1 - t0, 4), "t_prove": round(t2 - t1, 4),
            "t_verify": round(t3 - t2, 4), "proof_bytes": proof.size_bytes,
            "max_mem_stark": round(_rss_mb(), 2)}


def run_snark_round(clients: int, work_dir: str) -> Dict:
    """zokrates pipeline timings via `snark/harness.py`; NaN columns when
    the binary is unavailable (kept so CSV schemas stay stable)."""
    from ..snark.harness import SnarkUnavailable, run_snark_pipeline

    try:
        steps = run_snark_pipeline(work_dir, statement="aggregator",
                                   c=clients)
    except SnarkUnavailable:
        return {k: float("nan") for k in SNARK_COLS}
    out = {k: float("nan") for k in SNARK_COLS}
    name_map = {"compile": "t_compile", "setup": "t_setup",
                "witness": "t_compute_witness",
                "proof": "t_generate_proof",
                "export-verifier": "t_export_verifier"}
    peak = 0.0
    for step_name, col in name_map.items():
        info = steps.get(step_name)
        if isinstance(info, dict):
            out[col] = round(info.get("time_s", float("nan")), 4)
            peak = max(peak, info.get("peak_rss_mb", 0.0) or 0.0)
    out["max_mem_snark"] = round(peak, 2)
    return out


def append_csv(path: str, row: Dict, columns: List[str]) -> None:
    exists = os.path.isfile(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=columns)
        if not exists:
            w.writeheader()
        w.writerow(row)


def calculate_average(analytics_path: str, out_path: str) -> None:
    """Per-client-number mean/std across every appended round -> the
    reference's `final_analytics.csv` protocol."""
    import pandas as pd

    df = pd.read_csv(analytics_path)
    num = df.drop(columns=["datetime"])
    grouped = num.groupby("client_number")
    avg = grouped.mean().round(2).rename(columns=lambda x: f"{x}_avg")
    std = grouped.std().round(2).rename(columns=lambda x: f"{x}_std")
    combined = avg.join(std).sort_index(axis=1)
    combined.reset_index().to_csv(out_path, index=False)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-snark", action="store_true")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    analytics_path = os.path.join(args.out_dir, "analytics.csv")
    rng = np.random.default_rng(args.seed)
    for i in range(args.rounds):
        print(f"Analyzing aggregator - Round {i + 1}")
        row = {"datetime": datetime.datetime.now().isoformat(),
               "client_number": args.clients, "batchsize": 10}
        row.update(run_stark_round(args.clients, rng))
        if args.skip_snark:
            row.update({k: float("nan") for k in SNARK_COLS})
        else:
            row.update(run_snark_round(
                args.clients, os.path.join(args.out_dir, "snark_work")))
        append_csv(analytics_path, row, COLUMNS)
        print(f"  prove {row['t_prove']}s, verify {row['t_verify']}s, "
              f"{row['proof_bytes']} bytes")
    calculate_average(analytics_path,
                      os.path.join(args.out_dir, "final_analytics.csv"))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
