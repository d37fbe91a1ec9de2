"""Aggregation (FedAvg global-update) STARK statement.

Port of `src/aggregation/{air,prover}.rs`: proves the masked iterative
update S_{i+1} = S_i + (L_i - G_raw)/k over C clients, with the update
column storing L_i - G_raw, boundary assertions binding the masked final
state and a zero final update row, and a MiMC digest of the masked final
model in the public inputs.

Trace: width 2d (d = AC*FE + AC = 60 state cells + 60 update cells),
length max(8, next_pow2(C + 2)) (`src/aggregation/prover.rs:63-64`).
Transition constraints (degree 1): k*S_next[i] - k*S_curr[i] - U_next[i] = 0
for i < d (`src/aggregation/air.rs:109-115`).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import mimc
from ..prover.air import Air, Assertion
from ..prover.options import ProofOptions
from ..prover.trace import TraceTable
from . import ml_math
from .ml_math import AC, FE


@dataclasses.dataclass
class GlobalUpdateInputs:
    """Public inputs (`src/aggregation/air.rs:14-31`): masked old/new states,
    scaling factor k, MiMC digest of the masked new model, unpadded steps."""
    global_w: List[List[int]]       # masked old weights (AC x FE)
    global_b: List[int]             # masked old biases (AC)
    new_global_w: List[List[int]]   # masked new weights
    new_global_b: List[int]
    k: int
    digest: int
    steps: int

    def to_elements(self) -> List[int]:
        """`src/aggregation/air.rs:57-80`.  NOTE steps is written as a raw
        field element here, unlike the training inputs which scale by 1e6
        (SURVEY.md pin #5)."""
        out: List[int] = []
        for i in range(AC):
            out.extend(self.global_w[i])
        out.extend(self.global_b)
        for i in range(AC):
            out.extend(self.new_global_w[i])
        out.extend(self.new_global_b)
        out.append(self.k)
        out.append(self.digest)
        out.append(self.steps % ref.P)
        return out


class GlobalUpdateAir(Air):
    """`src/aggregation/air.rs:89-152`."""

    #: fused-phase transition kernel (`prover/phases.py`): the k-scaled
    #: linear FedAvg constraints.
    transition_kind = "fedavg_linear"

    def transition_params(self):
        return {"k": self.pub_inputs.k}

    def __init__(self, trace_length: int, pub_inputs: GlobalUpdateInputs,
                 options: ProofOptions):
        d = AC * FE + AC
        super().__init__(trace_width=2 * d, trace_length=trace_length,
                         options=options)
        self.d = d
        self.pub_inputs = pub_inputs
        self.transition_degrees = [1] * d

    def get_assertions(self) -> List[Assertion]:
        """Final masked state + zero update at row steps-1
        (`src/aggregation/air.rs:121-147`)."""
        d = self.d
        flat = ml_math.flatten_state(self.pub_inputs.new_global_w,
                                     self.pub_inputs.new_global_b)
        last = self.pub_inputs.steps - 1
        out = [Assertion(i, last, flat[i]) for i in range(d)]
        out += [Assertion(i, last, 0) for i in range(d, 2 * d)]
        return out

    def evaluate_transitions_jax(self, cur: jnp.ndarray,
                                 nxt: jnp.ndarray) -> jnp.ndarray:
        d = self.d
        k = f128.full(cur.shape[2:], self.pub_inputs.k)
        diff = f128.sub(nxt[:, :d], cur[:, :d])
        return f128.sub(f128.mul(k[:, None], diff), nxt[:, d:2 * d])

    def evaluate_transitions_at(self, cur: Sequence[int],
                                nxt: Sequence[int]) -> List[int]:
        d, k = self.d, self.pub_inputs.k
        return [(k * nxt[i] - k * cur[i] - nxt[d + i]) % ref.P
                for i in range(d)]

    def pub_input_elements(self) -> List[int]:
        return self.pub_inputs.to_elements()


class GlobalUpdateProver:
    """`src/aggregation/prover.rs:37-191`.  Blinding RNG is injectable
    (pin #4): pass `rng` (numpy Generator) or an explicit `blinding` list."""

    def __init__(self, options: ProofOptions,
                 raw_global_w: List[List[int]], raw_global_b: List[int],
                 local_w: List[List[List[int]]], local_b: List[List[int]],
                 k: int,
                 rng: Optional[np.random.Generator] = None,
                 blinding: Optional[List[int]] = None):
        self.options = options
        self.raw_global_w = raw_global_w
        self.raw_global_b = raw_global_b
        self.local_w = local_w
        self.local_b = local_b
        self.k = k % ref.P
        d = AC * FE + AC
        self.d = d
        uns_padded = len(local_w) + 2
        self.steps = uns_padded
        self.trace_length = max(8, 1 << (uns_padded - 1).bit_length())
        if blinding is None:
            rng = rng if rng is not None else np.random.default_rng()
            # u64 blinding values, like `rng.gen::<u64>() as u128`
            # (`src/aggregation/prover.rs:68-72`)
            blinding = [int(x) for x in rng.integers(0, 2 ** 64, size=d,
                                                     dtype=np.uint64)]
        self.blinding = blinding
        raw_flat = ml_math.flatten_state(raw_global_w, raw_global_b)
        masked_flat = [(r + m) % ref.P for r, m in zip(raw_flat, blinding)]
        self.masked_global_w, self.masked_global_b = \
            ml_math.unflatten_state(masked_flat, AC, FE)

    def compute_iterative_trace_rows(self) -> List[List[int]]:
        """`src/aggregation/prover.rs:98-154` — host python ints (the trace
        is O(C*d) cells; the heavy prover work happens downstream)."""
        d = self.d
        k_inv = ref.inv(self.k)
        raw_flat = ml_math.flatten_state(self.raw_global_w, self.raw_global_b)
        cur = ml_math.flatten_state(self.masked_global_w,
                                    self.masked_global_b)
        rows = [cur + [0] * d]
        for lw, lb in zip(self.local_w, self.local_b):
            l = ml_math.flatten_state(lw, lb)
            update = [(li - g0) % ref.P for g0, li in zip(raw_flat, l)]
            delta = [(u * k_inv) % ref.P for u in update]
            cur = [(c + dd) % ref.P for c, dd in zip(cur, delta)]
            rows.append(cur + update)
        rows.append(cur + [0] * d)
        while len(rows) < self.trace_length:
            rows.append(list(rows[-1]))
        return rows

    def build_trace(self) -> TraceTable:
        return TraceTable.from_rows(self.compute_iterative_trace_rows())

    def get_pub_inputs(self) -> GlobalUpdateInputs:
        rows = self.compute_iterative_trace_rows()
        final_masked = rows[self.steps - 1][: self.d]
        new_w, new_b = ml_math.unflatten_state(final_masked, AC, FE)
        digest = mimc.ref_mimc_hash_matrix(new_w, new_b)
        return GlobalUpdateInputs(
            global_w=self.masked_global_w, global_b=self.masked_global_b,
            new_global_w=new_w, new_global_b=new_b,
            k=self.k, digest=digest, steps=self.steps)

    def air(self) -> GlobalUpdateAir:
        return GlobalUpdateAir(self.trace_length, self.get_pub_inputs(),
                               self.options)
