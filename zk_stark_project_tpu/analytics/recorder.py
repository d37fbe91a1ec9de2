"""Per-round analytics recorder (reference
`devices/analytics/analytics.py:6-84`): collects per-round time / proof-time
/ local-train-time / score / classification-report series and writes them as
a CSV tree `NumberOfParticipants_*/BatchSize_*/Device_*/...`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class Analytics:
    def __init__(self, device_name: str, config=None,
                 base_dir: str = "analytics_out"):
        self.device_name = device_name
        self.config = config
        self.base_dir = base_dir
        self.round_update_blockchain_time: Dict[int, float] = {}
        self.round_proof_times: Dict[int, float] = {}
        self.round_training_local_time: Dict[int, float] = {}
        self.round_scores: Dict[int, float] = {}
        self.round_reports: Dict[int, dict] = {}
        self.round_gas: Dict[int, float] = {}

    def add_round_update_blockchain_time(self, rnd: int, t: float) -> None:
        self.round_update_blockchain_time[rnd] = t

    def add_round_proof_time(self, rnd: int, t: float) -> None:
        self.round_proof_times[rnd] = t

    def add_round_training_local_time(self, rnd: int, t: float) -> None:
        self.round_training_local_time[rnd] = t

    def add_round_score(self, rnd: int, score: float) -> None:
        self.round_scores[rnd] = score

    def add_round_classification_report(self, rnd: int, report: dict) -> None:
        self.round_reports[rnd] = report

    def add_round_gas(self, rnd: int, gas: float) -> None:
        self.round_gas[rnd] = gas

    def _out_dir(self) -> str:
        parts = self.config.num_participants if self.config else 0
        bs = self.config.batch_size if self.config else 0
        return os.path.join(self.base_dir, f"NumberOfParticipants_{parts}",
                            f"BatchSize_{bs}", f"Device_{self.device_name}")

    def write_data(self) -> str:
        """CSV tree like `analytics.py:54-84`; returns the directory."""
        out = self._out_dir()
        os.makedirs(out, exist_ok=True)
        series = {
            "update_blockchain_time.csv": self.round_update_blockchain_time,
            "proof_times.csv": self.round_proof_times,
            "training_local_time.csv": self.round_training_local_time,
            "scores.csv": self.round_scores,
            "gas.csv": self.round_gas,
        }
        for fname, data in series.items():
            with open(os.path.join(out, fname), "w") as f:
                f.write("round,value\n")
                for rnd in sorted(data):
                    f.write(f"{rnd},{data[rnd]}\n")
        with open(os.path.join(out, "classification_reports.json"), "w") as f:
            json.dump({str(k): v for k, v in self.round_reports.items()}, f,
                      indent=2)
        return out
