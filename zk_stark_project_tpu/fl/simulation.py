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
                        proof_options=None,
                        checkpoint_dir: Optional[str] = None) -> List[dict]:
        """Round-by-round: publish -> deliver -> train each device -> FedAvg.
        Returns per-round summaries.

        With `checkpoint_dir`, each completed round is checkpointed
        atomically (global model + selector cursor + every RNG stream +
        proof artifact) and an interrupted run resumes from the newest
        loadable checkpoint, replaying bit-identically to an uninterrupted
        run (see `utils/checkpoint.py`)."""
        rounds = rounds if rounds is not None else self.config.rounds
        selector = self.connection_manager.aggregator_selector
        summaries = []
        start_round = 0
        mgr = None
        if checkpoint_dir is not None:
            from ..utils.checkpoint import CheckpointManager
            mgr = CheckpointManager(checkpoint_dir)
            latest = mgr.latest()
            if latest is not None:
                idx, state = latest
                self._restore_state(state)
                start_round = idx + 1
        for rnd in range(start_round, rounds):
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
            proof_bytes = None
            if prove_updates:
                summary["proof"], proof_bytes = self._prove_round(
                    selector, g_w_before, g_b_before, proof_options)
            selector.finish_round()
            summary["global_w"] = self.connection_manager.get_globalWeights()
            summary["global_b"] = self.connection_manager.get_globalBias()
            summaries.append(summary)
            if mgr is not None:
                mgr.save_round(rnd, self._capture_state(), proof_bytes)
        return summaries

    # -- checkpoint state -----------------------------------------------------

    def _capture_state(self) -> dict:
        """Everything a round boundary needs to resume bit-identically.
        (Stored-update buffers are empty here — `finish_round` just ran —
        so only the global model, selector cursor and RNG streams remain.)"""
        from ..utils.checkpoint import capture_rng

        cm = self.connection_manager
        selector = cm.aggregator_selector
        return {
            "global_w": cm.get_globalWeights(),
            "global_b": cm.get_globalBias(),
            "selector_index": selector.aggregators.index(selector._selected),
            "device_rngs": [capture_rng(d.rng) for d in self.devices],
            "model_rngs": [capture_rng(mw.model.rng)
                           for mw in self.middlewares],
        }

    def _restore_state(self, state: dict) -> None:
        from ..utils.checkpoint import restore_rng_inplace

        cm = self.connection_manager
        cm.set_global_model(state["global_w"], state["global_b"])
        selector = cm.aggregator_selector
        selector._selected = selector.aggregators[state["selector_index"]]
        for dev, s in zip(self.devices, state["device_rngs"]):
            restore_rng_inplace(dev.rng, s)
        for mw, s in zip(self.middlewares, state["model_rngs"]):
            restore_rng_inplace(mw.model.rng, s)

    def _prove_round(self, selector, g_w, g_b, proof_options):
        """Aggregation STARK for this round's stored local updates.
        Returns (summary_dict, serialized_proof_bytes_or_None)."""
        from ..models.aggregation import GlobalUpdateProver
        from ..ops.signed import f64_to_felt
        from ..prover import REFERENCE_OPTIONS, prove
        from ..verifier import verify

        agg = selector._selected
        stored = list(agg.stored_device_data.values())
        if not stored:
            return {"skipped": True}, None
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
        blob = proof.to_bytes()
        return {"proof_size": len(blob),
                "proof_time_s": time.time() - t0,
                "digest": air.pub_inputs.digest}, blob
