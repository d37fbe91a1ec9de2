"""Middleware — per-device trainer loop (reference
`devices/middleware/middleware.py`): consumes batches from the device queue,
injects the current global model/hyper-params, trains the fixed-point local
net, scores it, and pushes the update off-chain.

Scoring uses a self-contained standardizer + accuracy (the reference pulls
sklearn's StandardScaler/accuracy_score; the math is identical and this
keeps the runtime dependency-free).
"""

from __future__ import annotations

import functools
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

from ..analytics.recorder import Analytics
from .broker import Consumer
from .chain import ConnectionManager
from .config import FLConfig
from .device import decode_batch_csv
from .neural_net import Network, mse, mse_prime


class Scaler:
    """Standard scaler (mean/std), sklearn-compatible semantics."""

    def fit(self, x: np.ndarray) -> None:
        self.mean = np.mean(x, axis=0)
        std = np.std(x, axis=0)
        self.std = np.where(std == 0, 1.0, std)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x) - self.mean) / self.std


def accuracy_score(y_true, y_pred) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return float(np.mean(y_true == y_pred)) if len(y_true) else 0.0


def classification_report_dict(y_true, y_pred) -> dict:
    """Per-class precision/recall/f1 (sklearn output_dict shape)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    out = {}
    for cls in sorted(set(y_true.tolist()) | set(y_pred.tolist())):
        tp = int(np.sum((y_pred == cls) & (y_true == cls)))
        fp = int(np.sum((y_pred == cls) & (y_true != cls)))
        fn = int(np.sum((y_pred != cls) & (y_true == cls)))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[str(cls)] = {"precision": prec, "recall": rec, "f1-score": f1,
                         "support": int(np.sum(y_true == cls))}
    out["accuracy"] = accuracy_score(y_true, y_pred)
    return out


class FederatedLearningModel:
    """`middleware.py:25-150`."""

    def __init__(self, config: FLConfig, device_name: str,
                 test_features: Optional[List[List[float]]] = None,
                 test_labels: Optional[List[float]] = None,
                 rng: Optional[np.random.Generator] = None):
        self.device_name = device_name
        self.config = config
        self.scaler = Scaler()
        self.rng = rng if rng is not None else np.random.default_rng()
        self.net = Network(config.output_dimension, config.input_dimension,
                           config.precision, rng=self.rng)
        self.net.add_fc_layer()
        self.epochs = config.epochs
        self.learning_rate = None
        self.batch_size = None
        self.curr_feats: List[List[float]] = []
        self.curr_labs: List[float] = []
        self._batch_lock = threading.Lock()
        self.x_test = np.asarray(test_features) if test_features else None
        self.y_test = np.asarray(test_labels) if test_labels else None

    # -- data plane ---------------------------------------------------------

    def add_data_to_current_batch(self, feats, labs) -> None:
        with self._batch_lock:
            self.curr_feats.extend(feats)
            self.curr_labs.extend(labs)

    def batch_ready(self) -> bool:
        with self._batch_lock:
            return (self.batch_size is not None
                    and len(self.curr_labs) >= self.batch_size)

    def reset_batch(self) -> None:
        with self._batch_lock:
            self.curr_feats, self.curr_labs = [], []

    # -- training / scoring ---------------------------------------------------

    def process_batch(self) -> None:
        """Train on one sampled batch (`middleware.py:106-120`)."""
        with self._batch_lock:
            feats = np.asarray(self.curr_feats)
            labs = np.asarray(self.curr_labs)
        idx = self.rng.choice(len(labs), size=self.batch_size, replace=False)
        x_train, y_train = feats[idx], labs[idx]
        fit_base = self.x_test if self.x_test is not None else feats
        self.scaler.fit(np.asarray(fit_base))
        self.net.fit(self.scaler.transform(x_train), y_train,
                     epochs=self.epochs, learning_rate=self.learning_rate)

    def test_model(self) -> float:
        if self.x_test is None:
            return 0.0
        preds = self.net.predict(self.scaler.transform(self.x_test))
        return accuracy_score(self.y_test, preds)

    def get_classification_report(self) -> dict:
        if self.x_test is None:
            return {}
        preds = self.net.predict(self.scaler.transform(self.x_test))
        return classification_report_dict(self.y_test, preds)

    # -- model injection -------------------------------------------------------

    def set_params(self, w, b, lr, precision, batch_size) -> None:
        self.net.set_precision(precision)
        self.learning_rate = lr
        self.net.set_weights(w)
        self.net.set_bias(b)
        self.batch_size = batch_size

    def get_weights(self):
        return self.net.get_weights()

    def get_bias(self):
        return self.net.get_bias()


class MiddleWare:
    """`middleware.py:153-248`."""

    def __init__(self, connection_manager: ConnectionManager,
                 device_name: str, account_nr: int, config: FLConfig,
                 test_features=None, test_labels=None,
                 rng: Optional[np.random.Generator] = None,
                 use_rabbitmq: bool = False,
                 analytics: Optional[Analytics] = None):
        self.connection_manager = connection_manager
        self.device_name = device_name
        self.account_nr = account_nr
        self.config = config
        self.model = FederatedLearningModel(config, device_name,
                                            test_features, test_labels,
                                            rng=rng)
        self.analytics = analytics if analytics is not None else Analytics(
            device_name=device_name, config=config)
        self.consumer = Consumer(use_rabbitmq=use_rabbitmq)
        queue_name = config.queue_base + device_name
        self.consumer.declare_queue(queue_name)
        self.consumer.consume_data(queue_name, self._on_message)
        self.consumer_thread = threading.Thread(
            target=self.consumer.start_consuming, daemon=True)
        self.round = 0

    def _on_message(self, ch, method, properties, body) -> None:
        feats, labs = decode_batch_csv(body)
        self.model.add_data_to_current_batch(feats, labs)

    def run_round(self) -> bool:
        """One FL round (`middleware.py:186-239`).  Returns False if the
        round was skipped (data timeout)."""
        cm = self.connection_manager
        self.model.set_params(
            cm.get_globalWeights(self.account_nr),
            cm.get_globalBias(self.account_nr),
            cm.get_LearningRate(self.account_nr),
            cm.get_Precision(self.account_nr),
            cm.get_BatchSize(self.account_nr))
        start = time.time()
        while (not self.model.batch_ready()
               and time.time() - start < self.config.data_wait_timeout):
            time.sleep(0.01)
        if not self.model.batch_ready():
            return False
        t0 = time.time()
        self.model.process_batch()
        self.analytics.add_round_training_local_time(self.round,
                                                     time.time() - t0)
        self.analytics.add_round_score(self.round, self.model.test_model())
        self.analytics.add_round_classification_report(
            self.round, self.model.get_classification_report())
        t1 = time.time()
        cm.update(self.model.get_weights(), self.model.get_bias(),
                  self.model.net.mse_average, self.account_nr)
        self.analytics.add_round_update_blockchain_time(self.round,
                                                        time.time() - t1)
        return True

    def start(self) -> None:
        """Full loop over config.rounds (`middleware.py:180-248`)."""
        self.consumer_thread.start()
        while self.round < self.config.rounds:
            if self.connection_manager.roundUpdateOutstanding(self.account_nr):
                self.run_round()
                self.round += 1
            time.sleep(self.config.waiting_time)
        self.analytics.write_data()
        self.consumer.stop_consuming()
