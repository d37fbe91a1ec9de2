"""Checkpoint/resume tests: RNG stream capture, atomic+checksummed files,
and bit-identical resume of the multi-round FL proving loop (the subsystem
the reference lacks — SURVEY.md §5 "Checkpoint / resume: None").
"""

import os

import numpy as np
import pytest

from zk_stark_project_tpu.fl import FLConfig, Simulation
from zk_stark_project_tpu.utils.checkpoint import (CheckpointCorrupt,
                                                   CheckpointManager,
                                                   capture_rng, restore_rng,
                                                   restore_rng_inplace)
from zk_stark_project_tpu.utils.data import create_synthetic_device_data


def test_rng_capture_restore_continues_stream():
    g = np.random.default_rng(123)
    g.integers(0, 100, size=10)
    snap = capture_rng(g)
    expect = g.integers(0, 1 << 30, size=5).tolist()
    g2 = restore_rng(snap)
    assert g2.integers(0, 1 << 30, size=5).tolist() == expect


def test_rng_restore_inplace_shared_reference():
    g = np.random.default_rng(5)
    holder = {"rng": g}  # second holder of the same object
    snap = capture_rng(g)
    expect = g.integers(0, 1 << 30, size=3).tolist()
    g.integers(0, 1 << 30, size=7)  # advance past the snapshot
    restore_rng_inplace(g, snap)
    assert holder["rng"].integers(0, 1 << 30, size=3).tolist() == expect


def test_checkpoint_roundtrip_atomic(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = {"global_w": [[1, 2], [3, 4]], "round": 0,
             "rng": capture_rng(np.random.default_rng(0))}
    mgr.save_round(0, state, proof_bytes=b"proofdata")
    mgr.save_round(1, {"round": 1})
    assert mgr.rounds() == [0, 1]
    assert mgr.load_round(0)["global_w"] == [[1, 2], [3, 4]]
    assert mgr.load_proof(0) == b"proofdata"
    assert mgr.load_proof(1) is None
    idx, latest = mgr.latest()
    assert idx == 1 and latest["round"] == 1


def test_checkpoint_corruption_detected(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save_round(0, {"round": 0})
    mgr.save_round(1, {"round": 1})
    # flip a payload byte in the newest file
    path = mgr._path(1)
    blob = bytearray(open(path, "rb").read())
    blob[-1] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(CheckpointCorrupt):
        mgr.load_round(1)
    # latest() falls back to the newest intact checkpoint
    idx, state = mgr.latest()
    assert idx == 0 and state["round"] == 0


@pytest.fixture
def sim_setup(tmp_path):
    data_dir = tmp_path / "data"
    create_synthetic_device_data(str(data_dir), num_devices=2, rows=60,
                                 seed=7)
    paths = [str(data_dir / f"Device_{i}" / "train.txt") for i in (1, 2)]
    cfg = FLConfig(num_participants=2, rounds=4, batch_size=8,
                   samples_per_publish=24, precision=10**4,
                   learning_rate=10, data_wait_timeout=2.0)
    return cfg, paths


def test_resume_is_bit_identical(sim_setup, tmp_path):
    cfg, paths = sim_setup
    os.chdir(tmp_path)

    # uninterrupted 4-round run
    sim_a = Simulation(cfg, paths, test_data_path=paths[0], seed=3)
    full = sim_a.run_rounds_sync(rounds=4,
                                 checkpoint_dir=str(tmp_path / "ck_a"))

    # interrupted run: 2 rounds, then a FRESH Simulation resumes to 4
    ck = str(tmp_path / "ck_b")
    sim_b1 = Simulation(cfg, paths, test_data_path=paths[0], seed=3)
    part = sim_b1.run_rounds_sync(rounds=2, checkpoint_dir=ck)
    assert len(part) == 2
    sim_b2 = Simulation(cfg, paths, test_data_path=paths[0], seed=3)
    rest = sim_b2.run_rounds_sync(rounds=4, checkpoint_dir=ck)
    assert [s["round"] for s in rest] == [2, 3]

    assert rest[-1]["global_w"] == full[-1]["global_w"]
    assert rest[-1]["global_b"] == full[-1]["global_b"]
    # resumed run checkpoints rounds 2..3 into the same dir
    assert CheckpointManager(ck).rounds() == [0, 1, 2, 3]


def test_checkpoint_stores_round_proof(sim_setup, tmp_path):
    from zk_stark_project_tpu.prover import fast_options
    from zk_stark_project_tpu.prover.proof import Proof

    cfg, paths = sim_setup
    os.chdir(tmp_path)
    ck = str(tmp_path / "ck_p")
    sim = Simulation(cfg, paths, test_data_path=paths[0], seed=4)
    summaries = sim.run_rounds_sync(rounds=1, prove_updates=True,
                                    proof_options=fast_options(),
                                    checkpoint_dir=ck)
    blob = CheckpointManager(ck).load_proof(0)
    assert blob is not None
    assert len(blob) == summaries[0]["proof"]["proof_size"]
    proof = Proof.from_bytes(blob)
    assert proof.to_bytes() == blob
