"""Off-chain FedAvg aggregation (reference
`devices/middleware/aggregator.py`, `aggregator_selection.py`).

FedAvg-as-moving-average: new = G + sum_i (L_i - G)/k, truncated to int —
the exact plaintext semantics the aggregation STARK proves in the field
(`src/aggregation/prover.rs:114-142`, SURVEY.md §2 #19).  Vectorized with
numpy instead of the reference's nested loops; `int(x)` truncation is kept.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Tuple

import numpy as np


def moving_average_weights(local_weights, participant_count, global_weights):
    g = np.asarray(global_weights, dtype=float)
    acc = np.zeros_like(g)
    for w in local_weights:
        acc += (np.asarray(w, dtype=float) - g) / participant_count
    new = acc + g
    return [[int(x) for x in row] for row in np.trunc(new)]


def moving_average_bias(local_bias, participant_count, global_bias):
    g = np.asarray(global_bias, dtype=float)
    acc = np.zeros_like(g)
    for b in local_bias:
        acc += (np.asarray(b, dtype=float).reshape(-1) - g) / participant_count
    return [int(x) for x in np.trunc(acc + g)]


class OffChainAggregator:
    """`aggregator.py:32-57`."""

    def __init__(self, name: str, connection_manager, ipfs, global_w,
                 global_b):
        self.name = name
        self.connection_manager = connection_manager
        self.ipfs = ipfs
        self.global_w = copy.deepcopy(global_w)
        self.global_b = copy.deepcopy(global_b)
        self.stored_device_data: Dict[str, Tuple] = {}

    def store_device_wb(self, device_id, w, b, mse_score) -> None:
        self.stored_device_data[device_id] = (w, b, mse_score)

    def start_round(self) -> None:
        self.global_w = copy.deepcopy(self.connection_manager.global_w)
        self.global_b = copy.deepcopy(self.connection_manager.global_b)
        self.stored_device_data.clear()

    def finish_round(self) -> None:
        if not self.stored_device_data:
            return
        local_ws = [v[0] for v in self.stored_device_data.values()]
        local_bs = [v[1] for v in self.stored_device_data.values()]
        new_w = moving_average_weights(local_ws, len(local_ws), self.global_w)
        new_b = moving_average_bias(local_bs, len(local_bs), self.global_b)
        self.connection_manager.set_global_model(new_w, new_b)


class AggregatorSelector:
    """Round-robin over aggregators (`aggregator_selection.py:4-38`)."""

    def __init__(self, connection_manager, aggregators: List[OffChainAggregator]):
        self.connection_manager = connection_manager
        self.aggregators = aggregators
        self._selected: Optional[OffChainAggregator] = None
        self.select()

    def select(self) -> None:
        if self._selected is None:
            idx = 0
        else:
            idx = (self.aggregators.index(self._selected) + 1) % len(self.aggregators)
        self._selected = self.aggregators[idx]

    def store_device_wb(self, device_id, w, b, mse_score):
        return self._selected.store_device_wb(device_id, w, b, mse_score)

    def start_round(self):
        return self._selected.start_round()

    def finish_round(self):
        res = self._selected.finish_round()
        self.select()
        return res

    def get_agg_obj_from_address(self, name: str) -> Optional[OffChainAggregator]:
        for agg in self.aggregators:
            if agg.name == name:
                return agg
        return None
