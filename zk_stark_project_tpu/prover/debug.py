"""Debug / trace-analysis tooling (reference `src/debug.rs`):

  * DebugTracer — accumulate (step, op, values) events, dump CSV
    (`src/debug.rs:10-56`);
  * export_trace_csv — whole-trace CSV dump (`src/debug.rs:112-133`);
  * verify_trace_transitions — masked/mask consistency + state frozen after
    batch_size rows (`src/debug.rs:59-109`);
  * analyze_trace — initial-vs-final masked/mask/raw state diff summary
    (`src/debug.rs:136-185`).
"""

from __future__ import annotations

import csv
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops import f128
from ..ops import f128_ref as ref
from .trace import TraceTable


class DebugTracer:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.events: List[Tuple[int, str, List[int]]] = []

    def record(self, step: int, op: str, values: Sequence[int]) -> None:
        if self.enabled:
            self.events.append((step, op, [int(v) for v in values]))

    def export_csv(self, path: str) -> None:
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["step", "op", "values"])
            for step, op, values in self.events:
                w.writerow([step, op, ";".join(map(str, values))])


def _trace_np(trace: TraceTable) -> np.ndarray:
    """(width, length) object array of canonical ints (one host pull)."""
    return f128.to_ints(trace.data)


def export_trace_csv(trace: TraceTable, path: str) -> None:
    data = _trace_np(trace)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["row"] + [f"col_{c}" for c in range(trace.width)])
        for r in range(trace.length):
            w.writerow([r] + [str(data[c, r]) for c in range(trace.width)])


def raw_state(trace: TraceTable, row: int,
              data: Optional[np.ndarray] = None) -> List[int]:
    """masked - mask for the first half of the columns (the raw state the
    masking hides; `src/debug.rs` uses this for its consistency checks)."""
    data = data if data is not None else _trace_np(trace)
    half = trace.width // 2
    return [int((data[c, row] - data[half + c, row]) % ref.P)
            for c in range(half)]


def verify_trace_transitions(trace: TraceTable, batch_size: int) -> List[str]:
    """Returns a list of violations (empty = consistent): the raw state
    (masked - mask) must stop changing after `batch_size` rows
    (`src/debug.rs:59-109`)."""
    data = _trace_np(trace)
    problems = []
    prev = raw_state(trace, batch_size, data)
    for r in range(batch_size + 1, trace.length):
        cur = raw_state(trace, r, data)
        if cur != prev:
            problems.append(f"raw state changed at row {r} (> batch_size "
                            f"{batch_size})")
        prev = cur
    return problems


def analyze_trace(trace: TraceTable) -> dict:
    """Initial-vs-final summary (`src/debug.rs:136-185`)."""
    data = _trace_np(trace)
    half = trace.width // 2
    first_masked = [int(data[c, 0]) for c in range(half)]
    last_masked = [int(data[c, trace.length - 1]) for c in range(half)]
    first_raw = raw_state(trace, 0, data)
    last_raw = raw_state(trace, trace.length - 1, data)
    changed = sum(1 for a, b in zip(first_raw, last_raw) if a != b)
    return {
        "width": trace.width,
        "length": trace.length,
        "masked_initial": first_masked,
        "masked_final": last_masked,
        "raw_initial": first_raw,
        "raw_final": last_raw,
        "raw_cells_changed": changed,
    }
