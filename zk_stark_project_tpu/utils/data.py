"""Dataset IO + edge-device sampling (reference `src/helper.rs:55-106` and
device discovery `src/main.rs:112-144`).

CSV schema rules (`src/helper.rs:67-77`): rows of width 46 take columns
18..27 as the 9 features and column 45 as the label; rows of width 10 take
columns 0..9 as features and column 9 as the label.  Any other width is an
error.  Unparseable cells become 0.0.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def read_dataset(file_path: str) -> Tuple[List[List[float]], List[float]]:
    feats: List[List[float]] = []
    labs: List[float] = []
    with open(file_path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = []
            for cell in line.split(","):
                try:
                    row.append(float(cell.strip()))
                except ValueError:
                    row.append(0.0)
            if len(row) == 46:
                feats.append(row[18:27])
                labs.append(row[45])
            elif len(row) == 10:
                feats.append(row[:9])
                labs.append(row[9])
            else:
                raise ValueError(f"Unexpected CSV width {len(row)}")
    return feats, labs


class EdgeDevice:
    """Holds a device's data; samples batches without replacement
    (`src/helper.rs:83-106`).  RNG injectable (SURVEY.md pin #4)."""

    def __init__(self, features: List[List[float]], labels: List[float],
                 rng: Optional[np.random.Generator] = None):
        self.features = features
        self.labels = labels
        self.rng = rng if rng is not None else np.random.default_rng()

    def next_batch(self, p: int) -> Tuple[List[List[float]], List[float]]:
        n = len(self.labels)
        p = min(p, n)
        idxs = self.rng.choice(n, size=p, replace=False)
        return ([self.features[i] for i in idxs],
                [self.labels[i] for i in idxs])


def discover_devices(data_dir: str, verbose: bool = False,
                     rng: Optional[np.random.Generator] = None
                     ) -> List[EdgeDevice]:
    """Find Device_* folders holding train.txt or device_data.txt
    (`src/main.rs:112-137`)."""
    devices = []
    for name in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, name)
        if not os.path.isdir(path) or not name.startswith("Device_"):
            continue
        ds = os.path.join(path, "train.txt")
        if not os.path.exists(ds):
            ds = os.path.join(path, "device_data.txt")
        if not os.path.exists(ds):
            if verbose:
                print(f"Warning: no data file in {path}, skipping")
            continue
        if verbose:
            print(f"Loading {ds}")
        feats, labs = read_dataset(ds)
        child = (np.random.default_rng(rng.integers(0, 2**63))
                 if rng is not None else None)
        devices.append(EdgeDevice(feats, labs, rng=child))
    return devices


def create_synthetic_device_data(data_dir: str, num_devices: int = 8,
                                 rows: int = 100, seed: int = 42) -> None:
    """Seeded synthetic Device_* folders for when real data is absent —
    the fixture the benchmark harness uses
    (`verification/time_memory_analytics/analyze.py:343-367`)."""
    rng = np.random.default_rng(seed)
    for d in range(1, num_devices + 1):
        dev_dir = os.path.join(data_dir, f"Device_{d}")
        os.makedirs(dev_dir, exist_ok=True)
        with open(os.path.join(dev_dir, "train.txt"), "w") as f:
            for _ in range(rows):
                feats = rng.normal(0, 1.0, size=9)
                label = rng.integers(1, 7)
                cells = [f"{v:.6f}" for v in feats] + [str(label)]
                f.write(",".join(cells) + "\n")
