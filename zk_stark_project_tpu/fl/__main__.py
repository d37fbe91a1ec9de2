"""FL simulation entry point — the reference's `devices/main.py:10-58`
analog:

    python -m zk_stark_project_tpu.fl --data-dir DIR [--config CONFIG.yaml]
        [--devices N] [--rounds R] [--threaded] [--prove]
        [--checkpoint-dir CK] [--seed S]

Modes:
  default      deterministic synchronous rounds (`Simulation.run_rounds_sync`)
               with optional in-loop aggregation STARKs (--prove) and
               round-level checkpoint/resume (--checkpoint-dir).
  --threaded   the reference's thread-per-device behavior
               (`devices/main.py:28-58`).

Data: expects `Device_i/` folders under --data-dir (discover rules per
`src/main.rs:112-144`); generates a synthetic tree when --data-dir is
omitted (the benchmark harness does the same when real data is absent,
`verification/time_memory_analytics/analyze.py:343-367`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from typing import List, Optional

from .config import FLConfig
from .simulation import Simulation


def _device_paths(data_dir: str, n: int) -> List[str]:
    out = []
    for i in range(1, n + 1):
        base = os.path.join(data_dir, f"Device_{i}")
        for name in ("train.txt", "device_data.txt"):
            p = os.path.join(base, name)
            if os.path.exists(p):
                out.append(p)
                break
    return out


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="zk_stark_project_tpu.fl")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--config", default=None,
                        help="reference-style CONFIG.yaml")
    parser.add_argument("--devices", type=int, default=None)
    parser.add_argument("--rounds", type=int, default=None)
    parser.add_argument("--bs", type=int, default=None)
    parser.add_argument("--threaded", action="store_true",
                        help="thread-per-device mode (devices/main.py)")
    parser.add_argument("--prove", action="store_true",
                        help="one aggregation STARK per round")
    parser.add_argument("--fast-options", action="store_true",
                        help="small proof options (testing)")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="round-level checkpoint/resume directory")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    cfg = FLConfig.from_yaml(args.config) if args.config else FLConfig(
        precision=10 ** 4, learning_rate=10, batch_size=10,
        samples_per_publish=30, data_wait_timeout=2.0)
    if args.devices is not None:
        cfg.num_participants = args.devices
    if args.rounds is not None:
        cfg.rounds = args.rounds
    if args.bs is not None:
        cfg.batch_size = args.bs

    tmp = None
    data_dir = args.data_dir
    if data_dir is None:
        from ..utils.data import create_synthetic_device_data
        tmp = tempfile.TemporaryDirectory()
        data_dir = tmp.name
        create_synthetic_device_data(data_dir,
                                     num_devices=cfg.num_participants,
                                     rows=max(60, 3 * cfg.batch_size),
                                     seed=args.seed)
        print(f"(no --data-dir: synthetic data for "
              f"{cfg.num_participants} devices)", file=sys.stderr)

    paths = _device_paths(data_dir, cfg.num_participants)
    if len(paths) < cfg.num_participants:
        print(f"found only {len(paths)} Device_* folders under {data_dir}",
              file=sys.stderr)
        cfg.num_participants = len(paths)
    if not paths:
        return 1

    sim = Simulation(cfg, paths, test_data_path=paths[0], seed=args.seed)

    if args.threaded:
        sim.run_threaded()
        print(json.dumps({"mode": "threaded", "rounds": cfg.rounds,
                          "devices": cfg.num_participants}))
        return 0

    proof_options = None
    if args.fast_options:
        from ..prover import fast_options
        proof_options = fast_options()
    summaries = sim.run_rounds_sync(
        prove_updates=args.prove, proof_options=proof_options,
        checkpoint_dir=args.checkpoint_dir)
    for s in summaries:
        line = {"round": s["round"]}
        if "proof" in s:
            line.update({k: v for k, v in s["proof"].items()
                         if k in ("proof_size", "proof_time_s", "skipped")})
            if "proof_size" in line:
                print(f"Proof size: {line['proof_size']} bytes")
        print(json.dumps(line))
    if tmp is not None:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
