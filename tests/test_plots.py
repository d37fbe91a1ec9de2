"""Smoke tests for every figure family in `analytics/plots.py` — one per
reference figure type (`visualize_benchmarks.py` panels, the
`devices/analytics/plots.py` per-round/pgf family)."""

import csv
import os

import pytest

from zk_stark_project_tpu.analytics import plots


@pytest.fixture
def metrics_csv(tmp_path):
    path = str(tmp_path / "unified_metrics_test.csv")
    rows = []
    for run in range(3):
        for bs in (1, 10):
            for step in ("setup", "witness", "proof"):
                rows.append({
                    "run": run, "bs": bs, "step": step,
                    "time_s": 1.0 + bs * 0.1 + run * 0.01,
                    "peak_rss_mb": 100 + bs + run,
                    "proof_size": 100000 + bs * 10 if step == "proof" else "",
                })
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return path


@pytest.fixture
def round_dirs(tmp_path):
    dirs = []
    for dev in ("Device_1", "Device_2"):
        d = tmp_path / dev
        d.mkdir()
        for fn in ("proof_times.csv", "training_local_time.csv",
                   "scores.csv", "gas.csv", "update_blockchain_time.csv"):
            with open(d / fn, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=["round", "value"])
                w.writeheader()
                for r in range(3):
                    w.writerow({"round": r, "value": 0.5 + r * 0.1})
        with open(d / "classification_report.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["round", "value"])
            w.writeheader()
            for r in range(3):
                w.writerow({"round": r,
                            "value": "{'1': {'f1-score': 0.8}, "
                                     "'2': {'f1-score': 0.6}}"})
        dirs.append(str(d))
    return dirs


def test_benchmark_figures(metrics_csv, tmp_path):
    out = str(tmp_path)
    assert os.path.exists(plots.plot_time_memory_vs_batch(
        [metrics_csv], os.path.join(out, "tm.png")))
    assert os.path.exists(plots.plot_proof_sizes(
        [metrics_csv], os.path.join(out, "ps.png")))
    assert os.path.exists(plots.plot_speedup_vs_baseline(
        [metrics_csv], os.path.join(out, "sp.png")))
    assert os.path.exists(plots.plot_phase_breakdown(
        [metrics_csv], os.path.join(out, "pb.png")))
    assert os.path.exists(plots.plot_cv_analysis(
        [metrics_csv], os.path.join(out, "cv.png")))
    assert os.path.exists(plots.plot_detailed_distribution(
        [metrics_csv], os.path.join(out, "det.png")))


def test_round_figures(round_dirs, tmp_path):
    out = str(tmp_path)
    assert os.path.exists(plots.plot_round_scores(
        round_dirs, os.path.join(out, "scores.png")))
    assert os.path.exists(plots.plot_round_metric(
        round_dirs, "proof_times.csv", "proof time (s)",
        os.path.join(out, "pt.png")))
    assert os.path.exists(plots.plot_round_metric(
        round_dirs, "gas.csv", "gas", os.path.join(out, "gas.png")))
    assert os.path.exists(plots.plot_round_boxplot(
        round_dirs, "training_local_time.csv", "local train (s)",
        os.path.join(out, "bp.png")))
    assert os.path.exists(plots.plot_classification_report(
        round_dirs, os.path.join(out, "cls.png")))
    assert os.path.exists(plots.plot_gas(
        round_dirs, os.path.join(out, "gasbox.png")))
    assert os.path.exists(plots.plot_update_blockchain_time(
        round_dirs, os.path.join(out, "ubt.png")))


def test_summary_table_and_legend_export(metrics_csv, tmp_path):
    out_csv = plots.summary_table(
        [metrics_csv], str(tmp_path / "summary_statistics.csv"))
    assert os.path.exists(out_csv)
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    # every (bs, step-time) pair plus memory + proof-size rows
    metrics = {(r["Batch Size"], r["Metric"]) for r in rows}
    assert ("1", "proof time (s)") in metrics
    assert ("10", "peak memory (MB)") in metrics
    assert ("10", "proof size (KB)") in metrics
    row = next(r for r in rows
               if (r["Batch Size"], r["Metric"]) == ("1", "proof time (s)"))
    assert float(row["Min"]) <= float(row["Mean"]) <= float(row["Max"])
    assert float(row["CV (%)"]) >= 0.0

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1], label="a")
    ax.plot([0, 1], [1, 0], label="b")
    ax.legend()
    leg = plots.export_legend(fig, str(tmp_path / "legend.png"))
    assert os.path.exists(leg)
    plt.close(fig)


def test_grid_and_pgf(tmp_path):
    out = os.path.join(str(tmp_path), "grid.png")
    grid = {2: {1: 1.0, 10: 2.0}, 8: {1: 1.5, 10: 3.0}}
    assert os.path.exists(plots.plot_participants_vs_batchsize(grid, out))
    # pdf sibling written by save_fig
    assert os.path.exists(os.path.join(str(tmp_path), "grid.pdf"))
    # pgf export path (optional — tolerated if backend missing)
    out2 = os.path.join(str(tmp_path), "grid2.png")
    plots.plot_participants_vs_batchsize(grid, out2, pgf=True)
    assert os.path.exists(out2)
