"""FL simulation orchestrator (reference `devices/main.py:10-58`):
thread-per-device edge publishers + middleware round loops over a shared
in-memory chain, synchronized by a Barrier.

Also provides `run_rounds_sync` — a deterministic, thread-free driver of the
same components for tests and for proving-in-the-loop workflows (the
reference never wires its Rust prover into the FL loop; here
`prove_updates=True` generates and verifies one aggregation STARK per round,
closing that gap — SURVEY.md §3.3 note).
"""

from __future__ import annotations

import threading
import time
from typing import List, Optional

import numpy as np

from ..utils.data import read_dataset
from .broker import InProcessBroker
from .chain import ConnectionManager
from .config import FLConfig
from .device import EdgeDevice
from .middleware import MiddleWare


class Simulation:
    def __init__(self, config: FLConfig, device_data_paths: List[str],
                 test_data_path: Optional[str] = None, seed: int = 0):
        self.config = config
        root = np.random.default_rng(seed)
        InProcessBroker.reset()
        self.barrier = threading.Barrier(config.num_participants)
        self.connection_manager = ConnectionManager(
            config, config.num_participants, self.barrier,
            rng=np.random.default_rng(4))
        test_feats = test_labs = None
        if test_data_path:
            test_feats, test_labs = read_dataset(test_data_path)
        self.devices: List[EdgeDevice] = []
        self.middlewares: List[MiddleWare] = []
        for i, path in enumerate(device_data_paths[:config.num_participants]):
            name = f"Device_{i + 1}"
            dev_rng = np.random.default_rng(root.integers(0, 2 ** 63))
            mw_rng = np.random.default_rng(root.integers(0, 2 ** 63))
            self.devices.append(EdgeDevice(name, config, data_path=path,
                                           rng=dev_rng))
            self.middlewares.append(MiddleWare(
                self.connection_manager, name, i, config,
                test_features=test_feats, test_labels=test_labs, rng=mw_rng))

    # -- threaded mode (reference behavior) ---------------------------------

    def run_threaded(self) -> None:
        """`devices/main.py:28-58`: one thread per device + middleware."""
        threads = []
        for dev, mw in zip(self.devices, self.middlewares):
            t_dev = threading.Thread(target=dev.start, daemon=True)
            t_mw = threading.Thread(target=mw.start)
            threads.append((t_dev, t_mw))
        self.connection_manager.aggregator_selector.start_round()
        for t_dev, t_mw in threads:
            t_dev.start()
            t_mw.start()
        for _, t_mw in threads:
            t_mw.join()
        for dev in self.devices:
            dev.stop()
        self.connection_manager.aggregator_selector.finish_round()

    # -- synchronous mode (deterministic) ------------------------------------

    def run_rounds_sync(self, rounds: Optional[int] = None,
                        prove_updates: bool = False,
                        proof_options=None) -> List[dict]:
        """Round-by-round: publish -> deliver -> train each device -> FedAvg.
        Returns per-round summaries."""
        rounds = rounds if rounds is not None else self.config.rounds
        selector = self.connection_manager.aggregator_selector
        summaries = []
        for rnd in range(rounds):
            selector.start_round()
            g_w_before = self.connection_manager.get_globalWeights()
            g_b_before = self.connection_manager.get_globalBias()
            for dev, mw in zip(self.devices, self.middlewares):
                dev.publish_once()
                # drain the queue synchronously
                q = InProcessBroker.get_queue(dev.queue_name)
                while not q.empty():
                    mw._on_message(None, None, None, q.get())
                mw.round = rnd
                mw.run_round()
                mw.model.reset_batch()
            summary = {"round": rnd}
            if prove_updates:
                summary["proof"] = self._prove_round(
                    selector, g_w_before, g_b_before, proof_options)
            selector.finish_round()
            summary["global_w"] = self.connection_manager.get_globalWeights()
            summary["global_b"] = self.connection_manager.get_globalBias()
            summaries.append(summary)
        return summaries

    def _prove_round(self, selector, g_w, g_b, proof_options) -> dict:
        """Aggregation STARK for this round's stored local updates."""
        from ..models.aggregation import GlobalUpdateProver
        from ..ops.signed import f64_to_felt
        from ..prover import REFERENCE_OPTIONS, prove
        from ..verifier import verify

        agg = selector._selected
        stored = list(agg.stored_device_data.values())
        if not stored:
            return {"skipped": True}
        enc = lambda x: f64_to_felt(float(x))
        local_w = [[[enc(v) for v in row] for row in np.asarray(w)]
                   for (w, b, _) in stored]
        local_b = [[enc(v) for v in np.asarray(b).reshape(-1)]
                   for (w, b, _) in stored]
        raw_w = [[enc(v) for v in row] for row in g_w]
        raw_b = [enc(v) for v in g_b]
        k = f64_to_felt(float(len(stored)))
        opts = proof_options or REFERENCE_OPTIONS
        t0 = time.time()
        prover = GlobalUpdateProver(opts, raw_w, raw_b, local_w, local_b, k)
        trace = prover.build_trace()
        air = prover.air()
        proof = prove(air, trace)
        verify(air, proof)
        return {"proof_size": proof.size_bytes,
                "proof_time_s": time.time() - t0,
                "digest": air.pub_inputs.digest}
