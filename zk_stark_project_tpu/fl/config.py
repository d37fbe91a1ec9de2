"""Typed FL configuration.

Unifies the reference's four config mechanisms (SURVEY.md §5: StructOpt CLI,
CONFIG.yaml via .env ProjectRoot, hard-coded Rust consts, and regex-rewritten
ZoKrates constants) into one dataclass.  `from_yaml` still accepts the
reference's CONFIG.yaml key names (`devices/utils/utils.py:34-36`,
keys used at `devices/middleware/middleware.py:31-43,183-239`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional


@dataclasses.dataclass
class FLConfig:
    num_participants: int = 8
    input_dimension: int = 9
    output_dimension: int = 6
    precision: int = 10 ** 4
    epochs: int = 1
    learning_rate: int = 10
    batch_size: int = 20
    rounds: int = 3
    waiting_time: float = 0.05
    queue_base: str = "Q_"
    samples_per_publish: int = 50
    publish_interval: float = 0.05
    data_wait_timeout: float = 10.0   # `middleware.py:206-214`
    train_file_path: str = ""
    test_file_path: str = ""
    response_variable: str = "Activity"
    activity_mappings: Dict[str, str] = dataclasses.field(default_factory=dict)
    activities: List[str] = dataclasses.field(default_factory=list)
    activity_encoding: Dict[str, int] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "FLConfig":
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f)
        d = raw.get("DEFAULT", raw)
        return cls(
            num_participants=d.get("NumberOfParticipants", 8),
            input_dimension=d.get("InputDimension", 9),
            output_dimension=d.get("OutputDimension", 6),
            precision=d.get("Precision", 10 ** 4),
            epochs=d.get("Epochs", 1),
            learning_rate=d.get("LearningRate", 10),
            batch_size=d.get("BatchSize", 20),
            rounds=d.get("Rounds", 3),
            waiting_time=float(d.get("WaitingTime", 0.05)),
            queue_base=d.get("QueueBase", "Q_"),
            samples_per_publish=d.get("NumberOfSamplesGenerated", 50),
            publish_interval=float(d.get("IntervalDataGenerator", 0.05)),
            train_file_path=d.get("TrainFilePath", ""),
            test_file_path=d.get("TestFilePath", ""),
            response_variable=d.get("ResponseVariable", "Activity"),
            activity_mappings=d.get("ActivityMappings", {}),
            activities=d.get("Activities", []),
            activity_encoding=d.get("ActivityEncoding", {}),
        )
