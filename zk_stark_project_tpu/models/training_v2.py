"""Sound training-update AIR ("v2") — opt-in via `--air v2`.

WHY THIS EXISTS.  The reference's training transition constraints are
provably inert: `EvaluationFrameExt::current_step()` is a stub returning 0
(`src/helper.rs:136-147`), so the guard at `src/training/air.rs:173` never
fires and `evaluate_transition` always emits zeros — only the two masked
boundary assertions bind (SURVEY.md pin #3).  v1
(`models/training.py`) replicates that faithfully for bit-parity; any
trace with the right first and last masked rows verifies.  This module is
the sound variant: the SGD step is an actual polynomial constraint and a
tampered middle row kills the proof.

WHY IT IS NOT THE REFERENCE'S OP CHAIN.  The reference's *intended*
constraints re-derive fwd/mse'/bwd with the non-associative signed pair
ops (`src/signed.rs:17-48`); as polynomials those compositions reach
degree ~50 (every signed add multiplies by data-dependent sign products),
which is unprovable at sane domain sizes — a further sign the reference
constraints never ran (it declares all degrees 1,
`src/training/air.rs:107`).  v2 instead states SGD over the NATURAL field
encoding (negative x is p - x) with exact field division, where the whole
update is LINEAR in the state:

    dot_j  = sum_i w_ji * x_i                       (x from the sample)
    pred_j = dot_j / pr + b_j
    err_j  = (pred_j - y_j) * f64_to_felt(2) / f64_to_felt(ac)
    w_ji  -= err_j * x_i / (lr * pr)                (same chain as
    b_j   -= err_j / lr                              src/helper.rs:345-401)

Per-row sample data (x_i, y_j) and the "row applies a sample" selector are
PERIODIC COLUMNS: public per-row values interpolated over the trace
domain, evaluated by the prover over the constraint-evaluation coset and
by the verifier at the out-of-domain point.  With raw = masked - mask the
transition polynomial

    T_c = raw_next_c - raw_cur_c + sel * grad_c(raw_cur)

has degree 4 counting every periodic factor (sel, x twice through
err * x) like a trace factor, so ce_blowup = 4.  Trace: width 120 = 60
masked state cells (weights row-major then biases) + 60 masks, fresh u64
mask per cell per row; boundary assertions pin the masked initial and
final state rows like the reference (`src/training/air.rs:141-147`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import ntt
from ..ops.signed import f64_to_felt
from ..prover.air import Air, Assertion
from ..prover.options import ProofOptions
from ..prover.trace import TraceTable
from . import ml_math
from .ml_math import AC, FE
from .training import trace_length_for

P = ref.P
D_STATE = AC * FE + AC          # 60 raw state cells


def _sgd_step(state: List[int], x: List[int], y: List[int],
              lr: int, pr: int) -> List[int]:
    """One natural-encoding SGD step on the flat [w row-major ‖ b] state
    (python ints mod p; exact field division)."""
    inv_pr = ref.inv(pr)
    inv_lr = ref.inv(lr)
    two_over_ac = (f64_to_felt(2.0) * ref.inv(f64_to_felt(float(AC)))) % P
    w = state[:AC * FE]
    b = state[AC * FE:]
    out_w = list(w)
    out_b = list(b)
    for j in range(AC):
        dot = 0
        for i in range(FE):
            dot = (dot + w[j * FE + i] * x[i]) % P
        pred = (dot * inv_pr + b[j]) % P
        err = ((pred - y[j]) * two_over_ac) % P
        for i in range(FE):
            grad = (err * x[i]) % P * inv_lr % P * inv_pr % P
            out_w[j * FE + i] = (out_w[j * FE + i] - grad) % P
        out_b[j] = (out_b[j] - err * inv_lr) % P
    return out_w + out_b


def _lagrange_at(rows_len: int, z: int) -> List[int]:
    """L_i(z) for the size-n trace domain <g>, barycentric:
    L_i(z) = (z^n - 1) * g^i / (n * (z - g^i))."""
    n = rows_len
    g = ref.root_of_unity(n.bit_length() - 1)
    zn1 = (pow(z, n, P) - 1) % P
    inv_n = ref.inv(n)
    gi = 1
    gis, dens = [], []
    for _ in range(n):
        gis.append(gi)
        dens.append((z - gi) % P)
        gi = (gi * g) % P
    if zn1 == 0:
        # z IS a domain point (only reachable from tests; the verifier's z
        # is an out-of-domain draw): L_i is the indicator
        return [1 if d == 0 else 0 for d in dens]
    dinvs = ref.batch_inv(dens)
    scale = (zn1 * inv_n) % P
    return [(scale * gis[i] % P) * dinvs[i] % P for i in range(n)]


class TrainingUpdateV2Air(Air):
    """Sound SGD-step AIR (degree-2 constraints, periodic sample columns)."""

    #: the verifier must pass the evaluation point (periodic columns)
    needs_point = True

    def __init__(self, trace_length: int, pub_inputs: "TrainingV2Inputs",
                 options: ProofOptions):
        super().__init__(trace_width=2 * D_STATE, trace_length=trace_length,
                         options=options)
        self.pub_inputs = pub_inputs
        # degree counts every periodic factor like a trace factor: the
        # weight constraints are sel * err * x with err containing one
        # trace factor and one periodic factor -> 4 (so ce_blowup = 4;
        # declaring 2 undersamples the CE domain and the OOD composition
        # check fails — found the hard way)
        self.transition_degrees = [4] * D_STATE
        self._periodic_cache = {}

    # -- periodic columns ---------------------------------------------------

    def _periodic_rows(self):
        """(sel, x_cols, y_cols): per-row python ints, each length n."""
        pi = self.pub_inputs
        n = self.trace_length
        bs = pi.batch_size
        sel = [1 if i < bs else 0 for i in range(n)]
        x_cols = [[pi.x_batch[i][f] if i < bs else 0 for i in range(n)]
                  for f in range(FE)]
        y_cols = [[pi.y_batch[i][j] if i < bs else 0 for i in range(n)]
                  for j in range(AC)]
        return sel, x_cols, y_cols

    def _periodic_evals(self, blowup: int):
        """(8, 1+FE+AC, D) coset evaluations of the periodic columns."""
        if blowup not in self._periodic_cache:
            sel, x_cols, y_cols = self._periodic_rows()
            rows = np.asarray([sel] + x_cols + y_cols, dtype=object)
            polys = ntt.interpolate(f128.from_ints(rows))
            self._periodic_cache[blowup] = ntt.coset_evaluate(
                polys, self.domain_offset, blowup)
        return self._periodic_cache[blowup]

    # -- Air interface ------------------------------------------------------

    def get_assertions(self) -> List[Assertion]:
        pi = self.pub_inputs
        last = self.trace_length - 1
        return ([Assertion(c, 0, pi.initial_masked[c])
                 for c in range(D_STATE)]
                + [Assertion(c, last, pi.final_masked[c])
                   for c in range(D_STATE)])

    def evaluate_transitions_jax(self, cur: jnp.ndarray,
                                 nxt: jnp.ndarray) -> jnp.ndarray:
        pi = self.pub_inputs
        d_dom = cur.shape[-1]
        blowup = d_dom // self.trace_length
        pe = self._periodic_evals(blowup)
        sel = pe[:, 0]                                   # (8, D)
        x_e = pe[:, 1:1 + FE]                            # (8, FE, D)
        y_e = pe[:, 1 + FE:]                             # (8, AC, D)

        raw_cur = f128.sub(cur[:, :D_STATE], cur[:, D_STATE:])
        raw_nxt = f128.sub(nxt[:, :D_STATE], nxt[:, D_STATE:])
        w_cur = raw_cur[:, :AC * FE].reshape(8, AC, FE, d_dom)
        b_cur = raw_cur[:, AC * FE:]                     # (8, AC, D)

        c_inv_pr = f128.from_int(ref.inv(pi.precision))
        c_inv_lr = f128.from_int(ref.inv(pi.learning_rate))
        c_2ac = f128.from_int(
            (f64_to_felt(2.0) * ref.inv(f64_to_felt(float(AC)))) % P)
        c_inv_lrpr = f128.from_int(
            ref.inv(pi.learning_rate) * ref.inv(pi.precision) % P)

        prod = f128.mul(w_cur, x_e[:, None])             # (8, AC, FE, D)
        dot = prod[:, :, 0]
        for i in range(1, FE):
            dot = f128.add(dot, prod[:, :, i])
        pred = f128.add(f128.mul(dot, c_inv_pr.reshape(8, 1, 1)), b_cur)
        err = f128.mul(f128.sub(pred, y_e), c_2ac.reshape(8, 1, 1))

        gw = f128.mul(f128.mul(err[:, :, None], x_e[:, None]),
                      c_inv_lrpr.reshape(8, 1, 1, 1))    # (8, AC, FE, D)
        gb = f128.mul(err, c_inv_lr.reshape(8, 1, 1))    # (8, AC, D)
        grad = jnp.concatenate(
            [gw.reshape(8, AC * FE, d_dom), gb], axis=1)  # (8, 60, D)

        return f128.add(f128.sub(raw_nxt, raw_cur),
                        f128.mul(sel[:, None], grad))

    def evaluate_transitions_at(self, cur: Sequence[int],
                                nxt: Sequence[int],
                                z: Optional[int] = None) -> List[int]:
        assert z is not None, "v2 transitions need the evaluation point"
        pi = self.pub_inputs
        n = self.trace_length
        sel_rows, x_cols, y_cols = self._periodic_rows()
        lag = _lagrange_at(n, z)
        bs = pi.batch_size
        sel = sum(lag[i] for i in range(bs)) % P
        x_z = [sum(x_cols[f][i] * lag[i] for i in range(bs)) % P
               for f in range(FE)]
        y_z = [sum(y_cols[j][i] * lag[i] for i in range(bs)) % P
               for j in range(AC)]

        raw_cur = [(cur[c] - cur[D_STATE + c]) % P for c in range(D_STATE)]
        raw_nxt = [(nxt[c] - nxt[D_STATE + c]) % P for c in range(D_STATE)]
        inv_pr = ref.inv(pi.precision)
        inv_lr = ref.inv(pi.learning_rate)
        two_over_ac = (f64_to_felt(2.0) * ref.inv(f64_to_felt(float(AC)))) % P

        out = [0] * D_STATE
        for j in range(AC):
            dot = 0
            for i in range(FE):
                dot = (dot + raw_cur[j * FE + i] * x_z[i]) % P
            pred = (dot * inv_pr + raw_cur[AC * FE + j]) % P
            err = ((pred - y_z[j]) * two_over_ac) % P
            for i in range(FE):
                c = j * FE + i
                grad = err * x_z[i] % P * inv_lr % P * inv_pr % P
                out[c] = (raw_nxt[c] - raw_cur[c] + sel * grad) % P
            c = AC * FE + j
            out[c] = (raw_nxt[c] - raw_cur[c]
                      + sel * (err * inv_lr % P)) % P
        return out

    def pub_input_elements(self) -> List[int]:
        return self.pub_inputs.to_elements()


class TrainingV2Inputs:
    """Public inputs: masked boundary rows + the sample batch (public —
    it feeds the periodic columns) + hyperparameters."""

    def __init__(self, initial_masked: List[int], final_masked: List[int],
                 x_batch: List[List[int]], y_batch: List[List[int]],
                 learning_rate: int, precision: int, batch_size: int,
                 steps: int):
        self.initial_masked = [v % P for v in initial_masked]
        self.final_masked = [v % P for v in final_masked]
        self.x_batch = [[v % P for v in row] for row in x_batch]
        self.y_batch = [[v % P for v in row] for row in y_batch]
        self.learning_rate = learning_rate % P
        self.precision = precision % P
        self.batch_size = batch_size
        self.steps = steps

    def to_elements(self) -> List[int]:
        """Documented order (self-defined; v2 has no reference twin):
        [2 (version), steps, batch_size, lr, pr] ++ initial ++ final ++
        flat x ++ flat y."""
        out = [2, self.steps, self.batch_size, self.learning_rate,
               self.precision]
        out += self.initial_masked + self.final_masked
        for row in self.x_batch:
            out += row
        for row in self.y_batch:
            out += row
        return [v % P for v in out]


class TrainingUpdateV2Prover:
    """Builds the v2 trace (natural encoding, exact field division) and
    its AIR.  Mask RNG injectable like v1 (SURVEY.md pin #4)."""

    def __init__(self, options: ProofOptions, initial_state: List[int],
                 x_batch: List[List[int]], y_batch: List[List[int]],
                 learning_rate: int, precision: int, batch_size: int,
                 rng: Optional[np.random.Generator] = None,
                 masks: Optional[np.ndarray] = None):
        assert len(initial_state) == D_STATE
        assert len(x_batch) == batch_size and len(y_batch) == batch_size
        self.options = options
        self.initial_state = [v % P for v in initial_state]
        self.x_batch = [[v % P for v in r] for r in x_batch]
        self.y_batch = [[v % P for v in r] for r in y_batch]
        self.learning_rate = learning_rate % P
        self.precision = precision % P
        self.batch_size = batch_size
        self.trace_length = trace_length_for(batch_size)
        if masks is None:
            rng = rng if rng is not None else np.random.default_rng()
            masks = rng.integers(0, 2 ** 64,
                                 size=(self.trace_length, D_STATE),
                                 dtype=np.uint64)
        self.masks = np.asarray(masks, dtype=np.uint64)
        assert self.masks.shape == (self.trace_length, D_STATE)
        self._rows = None

    def _raw_rows(self) -> List[List[int]]:
        if self._rows is None:
            rows = [list(self.initial_state)]
            state = list(self.initial_state)
            for i in range(self.batch_size):
                state = _sgd_step(state, self.x_batch[i], self.y_batch[i],
                                  self.learning_rate, self.precision)
                rows.append(list(state))
            while len(rows) < self.trace_length:
                rows.append(list(state))
            self._rows = rows
        return self._rows

    def build_trace(self) -> TraceTable:
        rows = self._raw_rows()
        n = self.trace_length
        data = np.zeros((n, 2 * D_STATE), dtype=object)
        for i in range(n):
            for c in range(D_STATE):
                m = int(self.masks[i, c])
                data[i, c] = (rows[i][c] + m) % P
                data[i, D_STATE + c] = m
        return TraceTable(f128.from_ints(data.T))

    def pub_inputs(self) -> TrainingV2Inputs:
        rows = self._raw_rows()
        n = self.trace_length
        initial_masked = [(rows[0][c] + int(self.masks[0, c])) % P
                          for c in range(D_STATE)]
        final_masked = [(rows[n - 1][c] + int(self.masks[n - 1, c])) % P
                        for c in range(D_STATE)]
        return TrainingV2Inputs(initial_masked, final_masked, self.x_batch,
                                self.y_batch, self.learning_rate,
                                self.precision, self.batch_size, n)

    def client_rep(self) -> int:
        """Masked trace cell (0, last) — same per-client scalar rep
        convention as v1 (`src/main.rs:260`)."""
        rows = self._raw_rows()
        n = self.trace_length
        return (rows[n - 1][0] + int(self.masks[n - 1, 0])) % P

    def air(self) -> TrainingUpdateV2Air:
        return TrainingUpdateV2Air(self.trace_length, self.pub_inputs(),
                                   self.options)


def signed_pair_to_natural(v: int, s: int) -> int:
    """Convert the reference's (value, sign) MAX-complement encoding
    (`src/helper.rs:16`, `src/signed.rs:3`) to the natural field encoding
    v2 states SGD over (negative x is p - x)."""
    from ..ops.signed import MAX_INT

    if s % P == 0:
        return v % P
    magnitude = (MAX_INT + 1 - v) % P
    return (P - magnitude) % P
