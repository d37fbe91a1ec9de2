"""DSA (Daily & Sports Activities) data preparation — port of
`devices/edge_device/iot_data_merge_script.py`:

  * whole_merge: walk `iot_data/aXX/pY/sZZ.txt` (19 activities x 8
    participants x 60 segments, 45 comma-separated sensor values per row),
    append the activity label, concatenate into train/test files
    (`iot_data_merge_script.py:10-87`);
  * divide_participants: per-participant `Device_i/device_data.txt` splits
    (`iot_data_merge_script.py:90-129`).

Runs on plain file IO (no pandas dependency).
"""

from __future__ import annotations

import os
from typing import List, Optional


def _segment_rows(path: str, activity: int) -> List[str]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(f"{line},{activity}")
    return rows


def whole_merge(iot_dir: str, out_dir: str,
                train_fraction: float = 0.75,
                activities: Optional[List[int]] = None) -> None:
    """Merge all activity/participant/segment files into train.txt /
    test.txt (first train_fraction of segments per (a, p) go to train)."""
    os.makedirs(out_dir, exist_ok=True)
    train_rows: List[str] = []
    test_rows: List[str] = []
    act_dirs = sorted(d for d in os.listdir(iot_dir) if d.startswith("a"))
    for act_dir in act_dirs:
        activity = int(act_dir[1:])
        if activities and activity not in activities:
            continue
        a_path = os.path.join(iot_dir, act_dir)
        for p_dir in sorted(d for d in os.listdir(a_path)
                            if d.startswith("p")):
            p_path = os.path.join(a_path, p_dir)
            segs = sorted(s for s in os.listdir(p_path)
                          if s.endswith(".txt"))
            cut = int(len(segs) * train_fraction)
            for i, seg in enumerate(segs):
                rows = _segment_rows(os.path.join(p_path, seg), activity)
                (train_rows if i < cut else test_rows).extend(rows)
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(train_rows) + "\n")
    with open(os.path.join(out_dir, "test.txt"), "w") as f:
        f.write("\n".join(test_rows) + "\n")


def divide_participants(iot_dir: str, out_dir: str,
                        activities: Optional[List[int]] = None) -> None:
    """One Device_<p>/device_data.txt per participant
    (`iot_data_merge_script.py:90-129`)."""
    os.makedirs(out_dir, exist_ok=True)
    per_participant = {}
    act_dirs = sorted(d for d in os.listdir(iot_dir) if d.startswith("a"))
    for act_dir in act_dirs:
        activity = int(act_dir[1:])
        if activities and activity not in activities:
            continue
        a_path = os.path.join(iot_dir, act_dir)
        for p_dir in sorted(d for d in os.listdir(a_path)
                            if d.startswith("p")):
            participant = int(p_dir[1:])
            p_path = os.path.join(a_path, p_dir)
            for seg in sorted(s for s in os.listdir(p_path)
                              if s.endswith(".txt")):
                rows = _segment_rows(os.path.join(p_path, seg), activity)
                per_participant.setdefault(participant, []).extend(rows)
    for participant, rows in sorted(per_participant.items()):
        dev_dir = os.path.join(out_dir, f"Device_{participant}")
        os.makedirs(dev_dir, exist_ok=True)
        with open(os.path.join(dev_dir, "device_data.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
