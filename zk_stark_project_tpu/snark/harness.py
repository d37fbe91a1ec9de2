"""ZoKrates/Groth16 pipeline harness — the SNARK side of the unified
benchmark (reference `analyze.py:186-289`): compile -> setup ->
compute-witness -> generate-proof -> export-verifier as subprocess steps
with time/peak-RSS capture.  `export-verifier` emits the Groth16 BN254
Solidity verifier (the reference's `verification/zokrates/verifier.sol`
artifacts are exactly such exports).

Gated: every step raises SnarkUnavailable unless a `zokrates` binary is on
PATH (the environment has no network; this mirrors the reference's hard
dependency on an installed zokrates CLI).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time
from typing import Dict, List, Optional

from ..analytics.harness import MemoryMonitor
from .circuits import write_circuits
from .witness import aggregator_witness, training_witness


class SnarkUnavailable(RuntimeError):
    pass


def _require_zokrates() -> str:
    path = shutil.which("zokrates")
    if not path:
        raise SnarkUnavailable(
            "zokrates binary not on PATH; SNARK comparison steps need it "
            "(the STARK side runs without it)")
    return path


def _run(cmd: List[str], cwd: str, timeout: float = 3600.0) -> Dict:
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=cwd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    with MemoryMonitor(proc.pid) as mon:
        out, _ = proc.communicate(timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{out[-2000:]}")
    return {"time_s": time.time() - t0, "peak_rss_mb": mon.peak_rss / 1e6}


def run_snark_pipeline(work_dir: str, statement: str = "training",
                       bs: int = 1, c: int = 8, seed: int = 0) -> Dict:
    """Full compile/setup/witness/proof/export run; returns per-step
    {time_s, peak_rss_mb} plus proof_size."""
    _require_zokrates()
    os.makedirs(work_dir, exist_ok=True)
    paths = write_circuits(work_dir, bs=bs, c=c)
    circuit = paths["training" if statement == "training"
                    else "aggregator"]
    results: Dict[str, Dict] = {}
    results["compile"] = _run(["zokrates", "compile", "-i", circuit],
                              work_dir)
    results["setup"] = _run(["zokrates", "setup"], work_dir)
    args = (training_witness(bs, seed=seed) if statement == "training"
            else aggregator_witness(c, seed=seed))
    results["witness"] = _run(
        ["zokrates", "compute-witness", "-a"] + args, work_dir)
    results["proof"] = _run(["zokrates", "generate-proof"], work_dir)
    results["export-verifier"] = _run(["zokrates", "export-verifier"],
                                      work_dir)
    proof_json = os.path.join(work_dir, "proof.json")
    results["proof_size"] = (os.path.getsize(proof_json)
                             if os.path.exists(proof_json) else 0)
    results["verifier_sol"] = os.path.join(work_dir, "verifier.sol")
    return results


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--statement", default="training",
                        choices=["training", "aggregator"])
    parser.add_argument("--bs", type=int, default=1)
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--work-dir", default="snark_work")
    args = parser.parse_args(argv)
    try:
        res = run_snark_pipeline(args.work_dir, args.statement, args.bs,
                                 args.clients)
    except SnarkUnavailable as e:
        print(f"SKIPPED: {e}", file=sys.stderr)
        return 0
    for step, r in res.items():
        print(step, r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
