"""Edge device — streaming data producer (reference
`devices/edge_device/edge_device.py`): loads the device's data file, then
publishes sampled CSV batches to its queue on an interval.

Instead of the reference's pandas/45-column-drop pipeline this reuses the
framework dataset reader (46/10-column rules, `src/helper.rs:67-77`); the
published payload is a simple header-less CSV of `9 features,label` rows.
"""

from __future__ import annotations

import threading
import time
from typing import List, Optional

import numpy as np

from ..utils.data import read_dataset
from .broker import Publisher
from .config import FLConfig


def encode_batch_csv(feats: List[List[float]], labs: List[float]) -> bytes:
    lines = [",".join(f"{v:.6f}" for v in row) + f",{int(lab)}"
             for row, lab in zip(feats, labs)]
    return ("\n".join(lines) + "\n").encode()


def decode_batch_csv(body: bytes):
    feats, labs = [], []
    for line in body.decode().strip().splitlines():
        cells = line.split(",")
        feats.append([float(c) for c in cells[:-1]])
        labs.append(float(cells[-1]))
    return feats, labs


class EdgeDevice:
    def __init__(self, device_name: str, config: FLConfig,
                 data_path: Optional[str] = None,
                 rng: Optional[np.random.Generator] = None,
                 use_rabbitmq: bool = False):
        self.device_name = device_name
        self.config = config
        path = data_path or f"{config.train_file_path}/{device_name}/device_data.txt"
        self.features, self.labels = read_dataset(path)
        self.rng = rng if rng is not None else np.random.default_rng()
        self.publisher = Publisher(use_rabbitmq=use_rabbitmq)
        self.queue_name = config.queue_base + device_name
        self.publisher.declare_queue(self.queue_name)
        self._stop = threading.Event()

    def next_batch(self):
        p = min(self.config.samples_per_publish, len(self.labels))
        idxs = self.rng.choice(len(self.labels), size=p, replace=False)
        return ([self.features[i] for i in idxs],
                [self.labels[i] for i in idxs])

    def publish_once(self) -> None:
        feats, labs = self.next_batch()
        self.publisher.publish_data(self.queue_name,
                                    encode_batch_csv(feats, labs))

    def start(self) -> None:
        """Loop: sample -> publish -> sleep (`edge_device.py:135-139`)."""
        while not self._stop.is_set():
            self.publish_once()
            self._stop.wait(self.config.publish_interval)

    def stop(self) -> None:
        self._stop.set()
