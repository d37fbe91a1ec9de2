"""Federated-learning runtime (reference `devices/` — SURVEY.md §1/L6):
edge-device producers, broker, middleware trainers, off-chain FedAvg
aggregation, in-memory chain, IPFS stub, and the simulation orchestrator."""

from .aggregator import (AggregatorSelector, OffChainAggregator,
                         moving_average_bias, moving_average_weights)
from .broker import Consumer, InProcessBroker, Publisher
from .chain import ConnectionManager
from .config import FLConfig
from .device import EdgeDevice
from .ipfs import IPFSConnector
from .middleware import FederatedLearningModel, MiddleWare
from .neural_net import FCLayer, Network
from .simulation import Simulation

__all__ = [
    "AggregatorSelector", "OffChainAggregator", "moving_average_bias",
    "moving_average_weights", "Consumer", "InProcessBroker", "Publisher",
    "ConnectionManager", "FLConfig", "EdgeDevice", "IPFSConnector",
    "FederatedLearningModel", "MiddleWare", "FCLayer", "Network",
    "Simulation",
]
