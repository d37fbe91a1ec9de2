"""FL runtime tests: broker, fixed-point net truncation semantics, FedAvg
moving average vs the reference's nested-loop formulas, connection manager,
and a full synchronous simulation round (with an in-loop aggregation STARK).
"""

import os

import numpy as np
import pytest

from zk_stark_project_tpu.fl import (ConnectionManager, FLConfig,
                                     InProcessBroker, Network, Publisher,
                                     Consumer, Simulation,
                                     moving_average_bias,
                                     moving_average_weights)
from zk_stark_project_tpu.fl.device import decode_batch_csv, encode_batch_csv
from zk_stark_project_tpu.utils.data import create_synthetic_device_data


def ref_moving_average_weights(local_weights, k, global_weights):
    """Reference nested-loop implementation
    (`devices/middleware/aggregator.py:3-17`)."""
    new = [[0 for _ in row] for row in global_weights]
    for w in local_weights:
        for i in range(len(global_weights)):
            for j in range(len(global_weights[i])):
                new[i][j] += (w[i][j] - global_weights[i][j]) / k
    for i in range(len(global_weights)):
        for j in range(len(global_weights[i])):
            new[i][j] += global_weights[i][j]
    return [[int(x) for x in row] for row in new]


def test_moving_average_matches_reference(np_rng):
    g = np_rng.integers(-1000, 1000, size=(6, 9)).tolist()
    locals_ = [np_rng.integers(-1000, 1000, size=(6, 9)).tolist()
               for _ in range(8)]
    ours = moving_average_weights(locals_, 8, g)
    theirs = ref_moving_average_weights(locals_, 8, g)
    assert ours == theirs
    gb = np_rng.integers(-1000, 1000, size=6).tolist()
    locals_b = [np_rng.integers(-1000, 1000, size=6).tolist()
                for _ in range(8)]
    ours_b = moving_average_bias(locals_b, 8, gb)
    assert len(ours_b) == 6


def test_broker_roundtrip():
    InProcessBroker.reset()
    pub = Publisher()
    pub.declare_queue("Q_test")
    feats = [[1.0, 2.0], [3.0, 4.0]]
    labs = [1.0, 2.0]
    pub.publish_data("Q_test", encode_batch_csv(feats, labs))
    body = InProcessBroker.get_queue("Q_test").get_nowait()
    f2, l2 = decode_batch_csv(body)
    assert l2 == labs
    np.testing.assert_allclose(f2, feats, atol=1e-6)


def test_network_truncation_semantics():
    """out = (x.W)/precision + b with int truncation
    (`devices/middleware/neural_net.py:58-59`)."""
    net = Network(2, 3, precision=100, rng=np.random.default_rng(0))
    net.add_fc_layer()
    net.set_weights([[100, 0, 0], [0, 100, 0]])  # (out=2, in=3)
    net.set_bias([5, 7])
    x = np.array([[1.5, 2.5, 0.0]])
    preds = net.layers[0].forward_propagation((x * 100).astype(int))
    # (150*100)/100 + 5 = 155 ; (250*100)/100 + 7 = 257
    assert preds.tolist() == [[155, 257]]


def test_connection_manager_seeded_init():
    cfg = FLConfig(num_participants=2, precision=10**4)
    cm = ConnectionManager(cfg, 2, rng=np.random.default_rng(4))
    assert len(cm.global_w) == cfg.output_dimension
    assert len(cm.global_w[0]) == cfg.input_dimension
    assert all(isinstance(v, int) for row in cm.global_w for v in row)
    # update routing stores into the selected aggregator
    cm.aggregator_selector.start_round()
    cm.update([[1] * 9] * 6, [1] * 6, 0.5, device_id=0)
    agg = cm.aggregator_selector._selected
    assert 0 in agg.stored_device_data


@pytest.fixture
def device_dirs(tmp_path):
    create_synthetic_device_data(str(tmp_path), num_devices=3, rows=60,
                                 seed=7)
    return [str(tmp_path / f"Device_{i}" / "train.txt") for i in (1, 2, 3)]


def test_simulation_rounds(device_dirs, tmp_path):
    os.chdir(tmp_path)  # ipfs.pickle + analytics_out land here
    cfg = FLConfig(num_participants=3, rounds=2, batch_size=10,
                   samples_per_publish=30, precision=10**4,
                   learning_rate=10, data_wait_timeout=2.0)
    sim = Simulation(cfg, device_dirs, test_data_path=device_dirs[0], seed=1)
    g_before = sim.connection_manager.get_globalWeights()
    summaries = sim.run_rounds_sync(rounds=2)
    assert len(summaries) == 2
    # the global model must have moved
    assert summaries[1]["global_w"] != g_before
    # analytics written
    out = sim.middlewares[0].analytics.write_data()
    assert os.path.exists(os.path.join(out, "scores.csv"))


def test_simulation_with_proof(device_dirs, tmp_path):
    os.chdir(tmp_path)
    from zk_stark_project_tpu.prover import fast_options
    cfg = FLConfig(num_participants=2, rounds=1, batch_size=5,
                   samples_per_publish=20, precision=10**4,
                   learning_rate=10, data_wait_timeout=2.0)
    sim = Simulation(cfg, device_dirs[:2], test_data_path=device_dirs[0],
                     seed=2)
    summaries = sim.run_rounds_sync(rounds=1, prove_updates=True,
                                    proof_options=fast_options())
    proof = summaries[0]["proof"]
    assert proof.get("proof_size", 0) > 0
