"""Benchmark / FL-round plot suite — the equivalents of the reference's
matplotlib scripts (`verification/time_memory_analytics/
{visualize_benchmarks,plot_figures,calculate_analytics_avg}.py` and
`devices/analytics/plots.py`): time / memory / proof-size vs batch size,
speedup-vs-baseline, and per-round FL score curves.

All functions take CSVs produced by `analytics/harness.py` (unified metrics)
or `analytics/recorder.py` (per-round trees) and write PNG (and optionally
PGF) figures.  matplotlib import is deferred so headless library use never
pays for it.
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from typing import Dict, List, Optional

from .batch_automation import estimate_seconds


def _read_csv(path: str) -> List[dict]:
    with open(path) as f:
        return list(csv.DictReader(f))


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_time_memory_vs_batch(metric_csvs: List[str], out_path: str,
                              step: str = "proof") -> str:
    """time + peak-RSS vs batch size from unified_metrics_*.csv files
    (`visualize_benchmarks.py` equivalent)."""
    plt = _mpl()
    by_bs_time: Dict[int, List[float]] = defaultdict(list)
    by_bs_mem: Dict[int, List[float]] = defaultdict(list)
    for path in metric_csvs:
        for row in _read_csv(path):
            if row["step"] != step:
                continue
            bs = int(row["bs"])
            by_bs_time[bs].append(float(row["time_s"]))
            by_bs_mem[bs].append(float(row["peak_rss_mb"]))
    bss = sorted(by_bs_time)
    mean = lambda xs: sum(xs) / len(xs)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.plot(bss, [mean(by_bs_time[b]) for b in bss], "o-",
             label="this framework")
    ax1.plot(bss, [estimate_seconds(b, "stark") for b in bss], "s--",
             label="reference Rust (recorded est.)")
    ax1.set_xlabel("batch size")
    ax1.set_ylabel(f"{step} time (s)")
    ax1.legend()
    ax2.plot(bss, [mean(by_bs_mem[b]) for b in bss], "o-")
    ax2.set_xlabel("batch size")
    ax2.set_ylabel("peak RSS (MB)")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_proof_sizes(metric_csvs: List[str], out_path: str) -> str:
    plt = _mpl()
    by_bs: Dict[int, List[float]] = defaultdict(list)
    for path in metric_csvs:
        for row in _read_csv(path):
            if row.get("proof_size") not in (None, "", "None"):
                by_bs[int(row["bs"])].append(float(row["proof_size"]))
    bss = sorted(by_bs)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(bss, [sum(by_bs[b]) / len(by_bs[b]) / 1024 for b in bss], "o-")
    ax.set_xlabel("batch size")
    ax.set_ylabel("aggregation proof size (KiB)")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_speedup_vs_baseline(metric_csvs: List[str], out_path: str,
                             step: str = "proof") -> str:
    """Speedup of this framework over the reference's recorded STARK (and
    SNARK) per-run estimates (`plot_figures.py` speedup-figure analog)."""
    plt = _mpl()
    by_bs: Dict[int, List[float]] = defaultdict(list)
    for path in metric_csvs:
        for row in _read_csv(path):
            if row["step"] == step:
                by_bs[int(row["bs"])].append(float(row["time_s"]))
    bss = sorted(by_bs)
    ours = [sum(by_bs[b]) / len(by_bs[b]) for b in bss]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(bss, [estimate_seconds(b, "stark") / o for b, o in zip(bss, ours)],
            "o-", label="vs reference STARK (Rust CPU)")
    ax.plot(bss, [estimate_seconds(b, "snark") / o for b, o in zip(bss, ours)],
            "s--", label="vs reference SNARK (ZoKrates)")
    ax.axhline(1.0, color="gray", lw=0.8)
    ax.set_xlabel("batch size")
    ax.set_ylabel("speedup (x)")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_round_scores(analytics_dirs: List[str], out_path: str) -> str:
    """Per-device FL round accuracy curves from `recorder.Analytics` output
    trees (`devices/analytics/plots.py` analog)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    for d in analytics_dirs:
        path = os.path.join(d, "scores.csv")
        if not os.path.exists(path):
            continue
        rows = _read_csv(path)
        ax.plot([int(r["round"]) for r in rows],
                [float(r["value"]) for r in rows],
                "o-", label=os.path.basename(d))
    ax.set_xlabel("round")
    ax.set_ylabel("test accuracy")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("csvs", nargs="+",
                        help="unified_metrics_*.csv files")
    parser.add_argument("--out-dir", default="plots")
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    print(plot_time_memory_vs_batch(
        args.csvs, os.path.join(args.out_dir, "time_memory.png")))
    print(plot_proof_sizes(
        args.csvs, os.path.join(args.out_dir, "proof_sizes.png")))
    print(plot_speedup_vs_baseline(
        args.csvs, os.path.join(args.out_dir, "speedup.png")))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
