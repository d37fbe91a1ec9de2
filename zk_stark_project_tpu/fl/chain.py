"""In-memory blockchain stand-in (reference
`devices/middleware/connection_manager.py:10-75`): global model store,
hyper-parameter getters, and update routing into the round-robin aggregator
selector.  Model init replicates `np.random.seed(4); randn * precision / 5`
(`connection_manager.py:20-34`) but through an injectable Generator.
"""

from __future__ import annotations

import copy
import threading
from typing import List, Optional

import numpy as np

from .aggregator import AggregatorSelector, OffChainAggregator
from .config import FLConfig
from .ipfs import IPFSConnector


class ConnectionManager:
    def __init__(self, config: FLConfig, participant_count: int,
                 barrier: Optional[threading.Barrier] = None,
                 rng: Optional[np.random.Generator] = None,
                 ipfs: Optional[IPFSConnector] = None):
        self.config = config
        self.participant_count = participant_count
        self.barrier = barrier
        self.ipfs = ipfs if ipfs is not None else IPFSConnector()

        rng = rng if rng is not None else np.random.default_rng(4)
        w = rng.standard_normal((config.output_dimension,
                                 config.input_dimension)) * config.precision / 5
        b = rng.standard_normal(config.output_dimension) * config.precision / 5
        self.global_w: List[List[int]] = [[int(x) for x in row] for row in w]
        self.global_b: List[int] = [int(x) for x in b]

        self.weight_ipfs_link = self.ipfs.save_global_weight(self.global_w)
        self.bias_ipfs_link = self.ipfs.save_global_bias(self.global_b)

        aggs = [
            OffChainAggregator("FirstAgg", self, self.ipfs,
                               self.global_w, self.global_b),
            OffChainAggregator("SecondAgg", self, self.ipfs,
                               self.global_w, self.global_b),
        ]
        self.aggregator_selector = AggregatorSelector(self, aggs)
        self._lock = threading.Lock()

    # hyper-parameter getters (`connection_manager.py:50-63`)
    def get_LearningRate(self, _=None):
        return self.config.learning_rate

    def get_BatchSize(self, _=None):
        return self.config.batch_size

    def get_Precision(self, _=None):
        return self.config.precision

    def get_globalWeights(self, _=None):
        with self._lock:
            return copy.deepcopy(self.global_w)

    def get_globalBias(self, _=None):
        with self._lock:
            return copy.deepcopy(self.global_b)

    def roundUpdateOutstanding(self, _=None) -> bool:
        # hardwired True in the reference (`connection_manager.py:65-67`)
        return True

    def set_global_model(self, w, b) -> None:
        with self._lock:
            self.global_w = w
            self.global_b = b
            self.weight_ipfs_link = self.ipfs.save_global_weight(w)
            self.bias_ipfs_link = self.ipfs.save_global_bias(b)

    def update(self, weights, bias, mse_score, device_id, proof=None) -> None:
        self.aggregator_selector.store_device_wb(
            device_id=device_id, w=weights, b=bias, mse_score=mse_score)
