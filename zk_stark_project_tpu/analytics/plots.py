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


def save_fig(fig, out_path: str, pgf: bool = False) -> str:
    """Save PNG (+ PDF sibling, + optional PGF like the reference's LaTeX
    export, `devices/analytics/plots.py:394-700`).  PGF export needs no
    LaTeX at save time; failures degrade to PNG-only."""
    fig.savefig(out_path, dpi=150)
    base, _ = os.path.splitext(out_path)
    try:
        fig.savefig(base + ".pdf", bbox_inches="tight")
        if pgf:
            fig.savefig(base + ".pgf", bbox_inches="tight")
    except Exception:  # noqa: BLE001 - optional export formats
        pass
    return out_path


def _stats(xs: List[float]):
    n = len(xs)
    mean = sum(xs) / n if n else 0.0
    var = sum((x - mean) ** 2 for x in xs) / n if n else 0.0
    std = var ** 0.5
    return mean, std, (std / mean if mean else 0.0)


def plot_phase_breakdown(metric_csvs: List[str], out_path: str,
                         pgf: bool = False) -> str:
    """Per-step (setup/witness/proof) time panels by batch size — the
    'Individual Phase Times' panels of `visualize_benchmarks.py:101-110`."""
    plt = _mpl()
    by_step: Dict[str, Dict[int, List[float]]] = defaultdict(
        lambda: defaultdict(list))
    for path in metric_csvs:
        for row in _read_csv(path):
            by_step[row["step"]][int(row["bs"])].append(float(row["time_s"]))
    steps = sorted(by_step)
    fig, axes = plt.subplots(1, max(len(steps), 1), figsize=(4 * len(steps), 4),
                             squeeze=False)
    for ax, step in zip(axes[0], steps):
        bss = sorted(by_step[step])
        ax.bar([str(b) for b in bss],
               [_stats(by_step[step][b])[0] for b in bss],
               yerr=[_stats(by_step[step][b])[1] for b in bss])
        ax.set_title(f"{step} time")
        ax.set_xlabel("batch size")
        ax.set_ylabel("seconds")
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def plot_cv_analysis(metric_csvs: List[str], out_path: str,
                     pgf: bool = False) -> str:
    """Coefficient-of-variation panels for time / memory / proof size —
    the `cv_analysis` figure of `visualize_benchmarks.py:233-317`."""
    plt = _mpl()
    t: Dict[int, List[float]] = defaultdict(list)
    m: Dict[int, List[float]] = defaultdict(list)
    s: Dict[int, List[float]] = defaultdict(list)
    for path in metric_csvs:
        for row in _read_csv(path):
            bs = int(row["bs"])
            t[bs].append(float(row["time_s"]))
            if row.get("peak_rss_mb"):
                m[bs].append(float(row["peak_rss_mb"]))
            if row.get("proof_size") not in (None, "", "None"):
                s[bs].append(float(row["proof_size"]))
    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    panels = [("time CV", t), ("memory CV", m), ("proof size CV", s)]
    avg_cv: Dict[int, List[float]] = defaultdict(list)
    for ax, (title, data) in zip(axes[:3], panels):
        bss = sorted(b for b in data if len(data[b]) > 1)
        cvs = [_stats(data[b])[2] * 100 for b in bss]
        for b, cv in zip(bss, cvs):
            avg_cv[b].append(cv)
        ax.bar([str(b) for b in bss], cvs)
        ax.set_title(title)
        ax.set_xlabel("batch size")
        ax.set_ylabel("CV (%)")
    bss = sorted(avg_cv)
    axes[3].bar([str(b) for b in bss],
                [sum(avg_cv[b]) / len(avg_cv[b]) for b in bss])
    axes[3].set_title("Average CV across metrics")
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def plot_detailed_distribution(metric_csvs: List[str], out_path: str,
                               step: str = "proof", pgf: bool = False) -> str:
    """Distribution (boxplot) + scalability panels — the `stark_detailed`
    figure of `visualize_benchmarks.py:324-366`."""
    plt = _mpl()
    t: Dict[int, List[float]] = defaultdict(list)
    m: Dict[int, List[float]] = defaultdict(list)
    for path in metric_csvs:
        for row in _read_csv(path):
            if row["step"] != step:
                continue
            t[int(row["bs"])].append(float(row["time_s"]))
            if row.get("peak_rss_mb"):
                m[int(row["bs"])].append(float(row["peak_rss_mb"]))
    bss = sorted(t)
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    axes[0].boxplot([t[b] for b in bss], tick_labels=[str(b) for b in bss])
    axes[0].set_title(f"{step} time distribution")
    if any(m.values()):
        axes[1].boxplot([m[b] for b in bss],
                        tick_labels=[str(b) for b in bss])
    axes[1].set_title("memory distribution")
    means = [_stats(t[b])[0] for b in bss]
    axes[2].plot(bss, means, "o-")
    if means and means[0] > 0:
        axes[2].plot(bss, [means[0] * b / max(bss[0], 1) for b in bss],
                     "--", color="gray", label="linear")
        axes[2].legend()
    axes[2].set_title(f"{step} time scalability")
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def _per_round_series(analytics_dirs: List[str], filename: str):
    out = {}
    for d in analytics_dirs:
        path = os.path.join(d, filename)
        if os.path.exists(path):
            rows = _read_csv(path)
            out[os.path.basename(d)] = (
                [int(r["round"]) for r in rows],
                [float(r["value"]) for r in rows])
    return out


def plot_round_metric(analytics_dirs: List[str], filename: str,
                      ylabel: str, out_path: str, pgf: bool = False) -> str:
    """Generic per-device per-round line panel (proof_times.csv,
    training_local_time.csv, round_time.csv, gas.csv, ...) — the
    `devices/analytics/plots.py` per-round figure family
    (plot_proof_time:178, plot_training_local_time:190, plot_round_time:
    196, plot_gas:172)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, (xs, ys) in sorted(
            _per_round_series(analytics_dirs, filename).items()):
        ax.plot(xs, ys, "o-", label=name, markersize=3)
    ax.set_xlabel("round")
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=7)
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def plot_round_boxplot(analytics_dirs: List[str], filename: str,
                       ylabel: str, out_path: str, pgf: bool = False) -> str:
    """Across-device boxplot per round — the reference's
    `roundupdateBCtimeBP.pgf` style panel
    (`devices/analytics/plots.py:449-470`)."""
    plt = _mpl()
    per_round: Dict[int, List[float]] = defaultdict(list)
    for _, (xs, ys) in _per_round_series(analytics_dirs, filename).items():
        for x, y in zip(xs, ys):
            per_round[x].append(y)
    rounds = sorted(per_round)
    fig, ax = plt.subplots(figsize=(6, 4))
    if rounds:
        ax.boxplot([per_round[r] for r in rounds],
                   tick_labels=[str(r) for r in rounds])
    ax.set_xlabel("round")
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def plot_classification_report(analytics_dirs: List[str], out_path: str,
                               pgf: bool = False) -> str:
    """Per-class F1 across rounds (mean over devices) — the
    `roundScoreClasses.pgf` panel (`devices/analytics/plots.py:541-613`)."""
    import json

    plt = _mpl()
    per_class: Dict[str, Dict[int, List[float]]] = defaultdict(
        lambda: defaultdict(list))
    for d in analytics_dirs:
        path = os.path.join(d, "classification_report.csv")
        if not os.path.exists(path):
            continue
        for row in _read_csv(path):
            rnd = int(row["round"])
            try:
                rep = json.loads(row["value"].replace("'", '"'))
            except Exception:  # noqa: BLE001 - malformed rows skipped
                continue
            for cls, metrics in rep.items():
                if isinstance(metrics, dict) and "f1-score" in metrics:
                    per_class[cls][rnd].append(float(metrics["f1-score"]))
    fig, ax = plt.subplots(figsize=(7, 4))
    for cls in sorted(per_class):
        rounds = sorted(per_class[cls])
        ax.plot(rounds,
                [sum(per_class[cls][r]) / len(per_class[cls][r])
                 for r in rounds], "o-", label=f"class {cls}", markersize=3)
    ax.set_xlabel("round")
    ax.set_ylabel("F1 score")
    ax.legend(fontsize=6, ncol=2)
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def plot_gas(analytics_dirs: List[str], out_path: str,
             pgf: bool = False) -> str:
    """Gas-cost distribution per device over update rounds — the
    `plot_gas` boxplot family (`devices/analytics/plots.py:172-175`: one
    box of ``data["Gas-Costs"]`` per device figure)."""
    plt = _mpl()
    series = sorted(_per_round_series(analytics_dirs, "gas.csv").items())
    fig, ax = plt.subplots(figsize=(6, 4))
    if series:
        ax.boxplot([ys for _, (_, ys) in series],
                   tick_labels=[name for name, _ in series])
    ax.set_xlabel("Update-Round")
    ax.set_ylabel("Gas-Costs")
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def plot_update_blockchain_time(analytics_dirs: List[str], out_path: str,
                                pgf: bool = False) -> str:
    """Blockchain-update latency scatter with a degree-1 least-squares
    trend line per device — `plot_update_blockchain_time`
    (`devices/analytics/plots.py:206-219`: polyfit(round, time, 1) over
    a scatter of the raw samples)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, (xs, ys) in sorted(_per_round_series(
            analytics_dirs, "update_blockchain_time.csv").items()):
        sc = ax.scatter(xs, ys, s=12, label=name)
        if len(xs) >= 2:
            n = float(len(xs))
            mx, my = sum(xs) / n, sum(ys) / n
            sxx = sum((x - mx) ** 2 for x in xs)
            slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
                     if sxx else 0.0)
            xs_s = sorted(xs)
            ax.plot(xs_s, [my + slope * (x - mx) for x in xs_s],
                    lw=0.8, color=sc.get_facecolor()[0])
    ax.set_xlabel("Update-Round")
    ax.set_ylabel("Time-Taken")
    ax.legend(fontsize=7)
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def summary_table(metric_csvs: List[str], out_csv: str) -> str:
    """Per-batch-size summary statistics (Mean / Std Dev / CV% / Min / Max
    per step metric) written as ``summary_statistics.csv`` — the
    reference's summary-statistics table
    (`visualize_benchmarks.py:511-546` create_summary_table)."""
    by_key: Dict[tuple, List[float]] = defaultdict(list)
    mems: Dict[tuple, List[float]] = defaultdict(list)
    sizes: Dict[int, List[float]] = defaultdict(list)
    for path in metric_csvs:
        for row in _read_csv(path):
            bs = int(row["bs"])
            by_key[(bs, f"{row['step']} time (s)")].append(
                float(row["time_s"]))
            mems[(bs, "peak memory (MB)")].append(float(row["peak_rss_mb"]))
            if row.get("proof_size") not in (None, "", "None"):
                sizes[bs].append(float(row["proof_size"]) / 1024)
    for (bs, name), xs in mems.items():
        by_key[(bs, name)] = [max(xs)]
    for bs, xs in sizes.items():
        by_key[(bs, "proof size (KB)")] = xs
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "Batch Size", "Metric", "Mean", "Std Dev", "CV (%)",
            "Min", "Max"])
        w.writeheader()
        for (bs, name) in sorted(by_key):
            xs = by_key[(bs, name)]
            mean, std, cv = _stats(xs)
            w.writerow({"Batch Size": bs, "Metric": name,
                        "Mean": round(mean, 6), "Std Dev": round(std, 6),
                        "CV (%)": round(cv * 100, 3),
                        "Min": min(xs), "Max": max(xs)})
    return out_csv


def export_legend(fig_or_ax, out_path: str, expand=(-5, -5, 5, 5)) -> str:
    """Save a figure's legend alone as its own image — the reference's
    `export_legend` helper (`devices/analytics/plots.py:536-543`), used
    to share one legend across a grid of PGF panels."""
    ax = getattr(fig_or_ax, "gca", lambda: fig_or_ax)()
    legend = ax.get_legend() or ax.legend()
    fig = legend.figure
    fig.canvas.draw()
    bbox = legend.get_window_extent()
    ext = [bbox.extents[i] + expand[i] for i in range(4)]
    bbox = bbox.from_extents(*ext)
    bbox = bbox.transformed(fig.dpi_scale_trans.inverted())
    fig.savefig(out_path, dpi="figure", bbox_inches=bbox)
    return out_path


def plot_participants_vs_batchsize(grid: Dict[int, Dict[int, float]],
                                   out_path: str, ylabel: str = "seconds",
                                   pgf: bool = False) -> str:
    """Metric grid over (participants, batch size) — the
    `participantsVSBatchsize_*.pgf` family
    (`devices/analytics/plots.py:700,751`).  grid[participants][bs] =
    value."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    for parts in sorted(grid):
        bss = sorted(grid[parts])
        ax.plot(bss, [grid[parts][b] for b in bss], "o-",
                label=f"{parts} participants")
    ax.set_xlabel("batch size")
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=7)
    fig.tight_layout()
    p = save_fig(fig, out_path, pgf)
    plt.close(fig)
    return p


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("csvs", nargs="+",
                        help="unified_metrics_*.csv files")
    parser.add_argument("--out-dir", default="plots")
    parser.add_argument("--pgf", action="store_true",
                        help="also export .pgf for LaTeX")
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    print(plot_time_memory_vs_batch(
        args.csvs, os.path.join(args.out_dir, "time_memory.png")))
    print(plot_proof_sizes(
        args.csvs, os.path.join(args.out_dir, "proof_sizes.png")))
    print(plot_speedup_vs_baseline(
        args.csvs, os.path.join(args.out_dir, "speedup.png")))
    print(plot_phase_breakdown(
        args.csvs, os.path.join(args.out_dir, "phase_breakdown.png"),
        args.pgf))
    print(plot_cv_analysis(
        args.csvs, os.path.join(args.out_dir, "cv_analysis.png"), args.pgf))
    print(plot_detailed_distribution(
        args.csvs, os.path.join(args.out_dir, "stark_detailed.png"),
        pgf=args.pgf))
    print(summary_table(
        args.csvs, os.path.join(args.out_dir, "summary_statistics.csv")))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())


# ---------------------------------------------------------------------------
# Round-3 measurement artifacts (scaling_report / speed_of_light /
# bench_sweep / tp_scaling CSVs -> committed figures)
# ---------------------------------------------------------------------------


def plot_ntt_throughput(scaling_csvs: List[str], out_path: str,
                        pgf: bool = False) -> str:
    """Device NTT butterflies/s vs transform size, with the single-dispatch
    (RTT-bound) rate alongside — from `analytics/scaling.py` CSVs."""
    plt = _mpl()
    rows = [r for p in scaling_csvs for r in _read_csv(p)
            if r.get("section") == "ntt"]
    rows.sort(key=lambda r: int(r["log2_n"]))
    xs = [int(r["log2_n"]) for r in rows]
    dev = [float(r["device_butterflies_per_s"]) / 1e9 for r in rows]
    disp = [float(r["butterflies_per_s"]) / 1e9 for r in rows]
    fig, ax = plt.subplots(figsize=(7, 4.2))
    ax.plot(xs, dev, "o-", label="device throughput (chained)")
    ax.plot(xs, disp, "s--", label="single dispatch (incl. link RTT)")
    ax.set_yscale("log")
    ax.set_xlabel("log2(transform size)")
    ax.set_ylabel("butterflies / s (1e9)")
    ax.set_title("f128 NTT throughput per TPU chip")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    return save_fig(fig, out_path, pgf)


def plot_bench_sweep(sweep_csvs: List[str], out_path: str,
                     pgf: bool = False) -> str:
    """Pipeline seconds vs batch size, TPU vs the reference's recorded ETA
    table (`batch_automation.py:37-38`) — from `analytics/bench_sweep.py`."""
    plt = _mpl()
    rows = [r for p in sweep_csvs for r in _read_csv(p)]
    rows.sort(key=lambda r: int(r["bs"]))
    xs = [int(r["bs"]) for r in rows]
    ours = [float(r["seconds"]) for r in rows]
    refs = [float(r["reference_seconds"]) for r in rows]
    fig, (ax, ax2) = plt.subplots(1, 2, figsize=(10, 4.2))
    ax.plot(xs, refs, "s--", label="reference (Rust, CPU ETA table)")
    ax.plot(xs, ours, "o-", label="this framework (TPU chip)")
    ax.set_yscale("log")
    ax.set_xlabel("ZK batch size")
    ax.set_ylabel("full pipeline seconds")
    ax.grid(True, alpha=0.3)
    ax.legend()
    sp = [float(r["speedup_vs_reference"]) for r in rows]
    ax2.bar([str(x) for x in xs], sp)
    ax2.axhline(10.0, color="k", lw=1, ls=":", label="10x target")
    ax2.set_xlabel("ZK batch size")
    ax2.set_ylabel("speedup vs reference")
    ax2.legend()
    fig.suptitle("STARK proof pipeline: batch-size sweep")
    fig.tight_layout()
    return save_fig(fig, out_path, pgf)


def plot_tp_efficiency(tp_csvs: List[str], out_path: str,
                       pgf: bool = False) -> str:
    """Distributed-NTT and tensor-parallel-prove scaling over mesh sizes —
    from `analytics/tp_scaling.py` CSVs."""
    plt = _mpl()
    rows = [r for p in tp_csvs for r in _read_csv(p)]
    fig, ax = plt.subplots(figsize=(7, 4.2))
    for section in ("dntt", "prove_tp"):
        sec = [r for r in rows if r.get("section") == section]
        if not sec:
            continue
        sec.sort(key=lambda r: int(r["devices"]))
        ax.plot([int(r["devices"]) for r in sec],
                [float(r["speedup"]) for r in sec], "o-", label=section)
    ds = sorted({int(r["devices"]) for r in rows})
    ax.plot(ds, ds, "k:", lw=1, label="ideal")
    ax.set_xlabel("mesh devices")
    ax.set_ylabel("speedup vs 1 device")
    ax.set_title("mesh scaling (virtual CPU mesh — see tp_scaling.py caveat)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    return save_fig(fig, out_path, pgf)
