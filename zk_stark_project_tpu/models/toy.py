"""Toy statement — a narrow FedAvg-shaped AIR for cheap end-to-end runs.

The two real statements are wide (training w=240, aggregation w=120 —
`src/training/air.rs:96`, `src/aggregation/air.rs:94`), which makes their
whole-pipeline XLA-CPU compiles cost minutes: Blake3 leaf hashing inlines
one compression block per 16 trace words, so graph size scales with trace
width.  This module provides the same constraint SHAPE as the aggregation
AIR (`k*S_next - k*S_curr - U_next = 0` over d state columns, i.e. the
`fedavg_linear` kernel of `prover/phases.py`) at width 2d for tiny d, so
the full prover pipeline — including the fused device-transcript megagraph
— compiles in CI/driver time on CPU.  Used by `tests/test_fused_prove.py`
and the driver's `dryrun_multichip` entry.

This is a test/validation vehicle, not a reference statement; sharding and
transcript behavior are identical at any width.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..ops import f128
from ..ops import f128_ref as ref
from ..prover.air import Air, Assertion
from ..prover.options import ProofOptions
from ..prover.trace import TraceTable


class ToyFedAvgAir(Air):
    """Width-2d statement with the aggregation AIR's constraint family."""

    transition_kind = "fedavg_linear"

    def __init__(self, options: ProofOptions, k: int,
                 final_state: List[int], final_update: List[int],
                 trace_length: int):
        d = len(final_state)
        super().__init__(trace_width=2 * d, trace_length=trace_length,
                         options=options)
        self.d, self.k = d, k
        self.final_state = final_state
        self.final_update = final_update
        self.transition_degrees = [1] * d

    def transition_params(self):
        return {"k": self.k}

    def get_assertions(self) -> List[Assertion]:
        last = self.trace_length - 1
        return ([Assertion(i, last, v)
                 for i, v in enumerate(self.final_state)]
                + [Assertion(self.d + i, last, v)
                   for i, v in enumerate(self.final_update)])

    def evaluate_transitions_at(self, cur: Sequence[int],
                                nxt: Sequence[int]) -> List[int]:
        d, k = self.d, self.k
        return [(k * nxt[i] - k * cur[i] - nxt[d + i]) % ref.P
                for i in range(d)]

    def pub_input_elements(self) -> List[int]:
        return [self.k] + self.final_state + self.final_update


def make_toy_statement(np_rng, options: ProofOptions, n: int = 16,
                       d: int = 2, k: int = 3
                       ) -> Tuple[ToyFedAvgAir, TraceTable]:
    """(air, trace) satisfying k*S_next - k*S_curr - U_next = 0 on every
    row pair: pick per-row deltas, set U_{i+1} = k*delta_i mod p."""
    state = [int(np_rng.integers(0, 2 ** 60)) for _ in range(d)]
    rows = [state + [int(np_rng.integers(0, 2 ** 60)) for _ in range(d)]]
    for _ in range(n - 1):
        delta = [int(np_rng.integers(0, 2 ** 60)) for _ in range(d)]
        state = [(s + x) % ref.P for s, x in zip(state, delta)]
        rows.append(state + [(k * x) % ref.P for x in delta])
    final_state, final_update = rows[-1][:d], rows[-1][d:]
    data = f128.from_ints(np.asarray(rows, dtype=object).T)
    return (ToyFedAvgAir(options, k, final_state, final_update, n),
            TraceTable(data))
