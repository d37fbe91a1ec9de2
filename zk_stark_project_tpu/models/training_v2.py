"""Sound training-update AIR ("v2") — opt-in via `--air v2`.

WHY THIS EXISTS.  The reference's training transition constraints are
provably inert: `EvaluationFrameExt::current_step()` is a stub returning 0
(`src/helper.rs:136-147`), so the guard at `src/training/air.rs:173` never
fires and `evaluate_transition` always emits zeros — only the two masked
boundary assertions bind (SURVEY.md pin #3).  v1
(`models/training.py`) replicates that faithfully for bit-parity; any
trace with the right first and last masked rows verifies.  v2 makes the
SGD step an actual polynomial constraint: a tampered state cell anywhere
in the chain kills the proof.

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

TRACE LAYOUT (width 135).  Cols [0,60) masked state (raw + mask, weights
row-major then biases), [60,120) the masks (fresh u64 per cell per row),
[120,129) the sample features x, [129,135) the one-hot labels y.  The
sample batch is PRIVATE WITNESS: row i of the x/y columns carries sample
i (zeros past the batch), committed in the trace like the ZoKrates
circuit's `private field` arguments (`verification/zokrates/root.zok:146-156`)
— it never appears in the public inputs, and the verifier reads its
out-of-domain values from the trace frame, NOT from an O(n) periodic
reconstruction.  The only periodic column is the public row selector
`sel` (1 on rows < bs), which depends only on (bs, n); the verifier
evaluates it at z with O(bs) work (`_sel_at`).

With raw = masked - mask the transition polynomial per state cell c is

    T_c = raw_next_c - raw_cur_c + sel * grad_c(raw_cur, x_cur, y_cur)

degree 4 for weight cells (sel * err * x: two trace factors in err's
dot-product, one x factor, sel counted like a trace factor) and 3 for
bias cells, so ce_blowup = 4.

WHAT v2 PROVES — and the mask caveat.  Public inputs are the masked
boundary rows (plus hyperparameters).  The transitions bind the CHAIN:
there exist (initial raw state, sample batch, masks) such that the
committed raw states follow bs honest SGD steps and hold afterwards, and
raw + mask equals the public boundary rows.  Because the masks are
themselves free witness (exactly as in the reference's trace,
`src/training/prover.rs:117-130`), the public masked rows alone do not
bind a UNIQUE raw chain — soundness against a prover who fabricates both
chain and masks requires the masks to be bound externally (e.g. the FL
round protocol deriving them from a committed per-round seed).  Opt-in
`public_masks=True` performs that binding in-proof: the boundary mask
rows become public inputs pinned by assertions, making the raw boundary
states publicly computable (masked - mask) — fully binding, at the cost
of model privacy.  Choose per deployment; the default keeps the
reference's hiding behavior.

Trace length defaults to the v1 formula max(16, next_pow2(120*bs))
(`src/training/prover.rs:65`) so v2 proofs are size-comparable with v1's
at the same CLI settings; pass `trace_length=` to size it as tightly as
next_pow2(bs + 1) (the chain writes only bs+1 distinct rows).
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
X0 = 2 * D_STATE                # first sample-feature column
Y0 = X0 + FE                    # first label column
# one unconstrained zero pad column brings the width to 136 so the
# tensor-parallel prover can shard columns over 2/4/8-device meshes
# (`parallel/tp_prove.py` requires width % mesh == 0); 135 is odd
WIDTH = Y0 + AC + 1             # 136


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


def _sel_at(n: int, bs: int, z: int) -> int:
    """sel(z) = sum_{i<bs} L_i(z) over the size-n trace domain,
    barycentric: L_i(z) = (z^n - 1) * g^i / (n * (z - g^i)).  Only the
    first bs terms are materialized — verifier cost is O(bs), independent
    of the trace length."""
    g = ref.root_of_unity(n.bit_length() - 1)
    zn1 = (pow(z, n, P) - 1) % P
    gi = 1
    gis, dens = [], []
    for _ in range(bs):
        gis.append(gi)
        dens.append((z - gi) % P)
        gi = (gi * g) % P
    if zn1 == 0:
        # z IS a domain point (only reachable from tests; the verifier's
        # z is an out-of-domain draw): sel is the indicator of rows < bs
        return 1 if any(d == 0 for d in dens) else 0
    dinvs = ref.batch_inv(dens)
    scale = (zn1 * ref.inv(n)) % P
    return sum((scale * gis[i] % P) * dinvs[i] for i in range(bs)) % P


class TrainingUpdateV2Air(Air):
    """Sound SGD-step AIR — private in-trace sample data, periodic `sel`
    selector, batched device kernel `sgd_v2`
    (`prover/phases.py::TRANSITION_KERNELS`)."""

    #: the verifier passes the evaluation point z (for sel(z))
    needs_point = True
    #: batched transition kernel — v2 rides the fused/batched/tp provers
    transition_kind = "sgd_v2"

    def __init__(self, trace_length: int, pub_inputs: "TrainingV2Inputs",
                 options: ProofOptions):
        super().__init__(trace_width=WIDTH, trace_length=trace_length,
                         options=options)
        self.pub_inputs = pub_inputs
        # degree counts the periodic sel factor like a trace factor:
        # weight constraints are sel * err * x with err carrying the
        # deg-2 w.x dot product -> 4 (ce_blowup = 4; declaring less
        # undersamples the CE domain and the OOD check fails)
        self.transition_degrees = [4] * (AC * FE) + [3] * AC
        self._periodic_cache = {}

    # -- periodic column (public: depends only on bs and n) -----------------

    def periodic_rows(self) -> np.ndarray:
        """(1, n) object ints: sel = 1 on rows < bs else 0."""
        n = self.trace_length
        bs = self.pub_inputs.batch_size
        return np.asarray(
            [[1 if i < bs else 0 for i in range(n)]], dtype=object)

    def _periodic_evals(self, blowup: int) -> jnp.ndarray:
        """(8, 1, blowup*n) coset evaluations of sel (fallback for callers
        that do not precompute periodic evals)."""
        if blowup not in self._periodic_cache:
            polys = ntt.interpolate(f128.from_ints(self.periodic_rows()))
            self._periodic_cache[blowup] = ntt.coset_evaluate(
                polys, self.domain_offset, blowup)
        return self._periodic_cache[blowup]

    # -- Air interface ------------------------------------------------------

    def transition_params(self):
        pi = self.pub_inputs
        return {
            "inv_pr": ref.inv(pi.precision),
            "inv_lr": ref.inv(pi.learning_rate),
            "two_ac": (f64_to_felt(2.0)
                       * ref.inv(f64_to_felt(float(AC)))) % P,
            "inv_lrpr": (ref.inv(pi.learning_rate)
                         * ref.inv(pi.precision)) % P,
        }

    def get_assertions(self) -> List[Assertion]:
        pi = self.pub_inputs
        last = self.trace_length - 1
        out = ([Assertion(c, 0, pi.initial_masked[c])
                for c in range(D_STATE)]
               + [Assertion(c, last, pi.final_masked[c])
                  for c in range(D_STATE)])
        if pi.initial_mask is not None:
            # public-mask binding mode: pin the boundary mask rows too
            out += [Assertion(D_STATE + c, 0, pi.initial_mask[c])
                    for c in range(D_STATE)]
            out += [Assertion(D_STATE + c, last, pi.final_mask[c])
                    for c in range(D_STATE)]
        return out

    def evaluate_transitions_jax(self, cur: jnp.ndarray, nxt: jnp.ndarray,
                                 periodic: jnp.ndarray = None
                                 ) -> jnp.ndarray:
        """(8, W, D) frames (+ optional (8, 1, D) sel evals) ->
        (8, 60, D).  Same math as the batched `sgd_v2` kernel
        (`prover/phases.py::_transitions_sgd_v2`), single statement."""
        pi = self.pub_inputs
        d_dom = cur.shape[-1]
        if periodic is None:
            blowup = d_dom // self.trace_length
            periodic = self._periodic_evals(blowup)
        sel = periodic[:, 0]                             # (8, D)
        x_e = cur[:, X0:Y0]                              # (8, FE, D)
        y_e = cur[:, Y0:Y0 + AC]                         # (8, AC, D)

        raw_cur = f128.sub(cur[:, :D_STATE], cur[:, D_STATE:X0])
        raw_nxt = f128.sub(nxt[:, :D_STATE], nxt[:, D_STATE:X0])
        w_cur = raw_cur[:, :AC * FE].reshape(8, AC, FE, d_dom)
        b_cur = raw_cur[:, AC * FE:]                     # (8, AC, D)

        p_ = self.transition_params()
        c_inv_pr = f128.from_int(p_["inv_pr"])
        c_inv_lr = f128.from_int(p_["inv_lr"])
        c_2ac = f128.from_int(p_["two_ac"])
        c_inv_lrpr = f128.from_int(p_["inv_lrpr"])

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
        sel = _sel_at(n, pi.batch_size, z)
        x_z = [cur[X0 + i] % P for i in range(FE)]       # from the frame
        y_z = [cur[Y0 + j] % P for j in range(AC)]

        raw_cur = [(cur[c] - cur[D_STATE + c]) % P for c in range(D_STATE)]
        raw_nxt = [(nxt[c] - nxt[D_STATE + c]) % P for c in range(D_STATE)]
        p_ = self.transition_params()
        inv_pr, inv_lr = p_["inv_pr"], p_["inv_lr"]
        two_over_ac = p_["two_ac"]

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
    """Public inputs: masked boundary rows + hyperparameters.  The sample
    batch is NOT here — it is private witness in the trace (module
    docstring).  `initial_mask`/`final_mask` are set only in the
    public-mask binding mode."""

    def __init__(self, initial_masked: List[int], final_masked: List[int],
                 learning_rate: int, precision: int, batch_size: int,
                 steps: int, initial_mask: Optional[List[int]] = None,
                 final_mask: Optional[List[int]] = None):
        self.initial_masked = [v % P for v in initial_masked]
        self.final_masked = [v % P for v in final_masked]
        self.learning_rate = learning_rate % P
        self.precision = precision % P
        self.batch_size = batch_size
        self.steps = steps
        self.initial_mask = ([v % P for v in initial_mask]
                             if initial_mask is not None else None)
        self.final_mask = ([v % P for v in final_mask]
                           if final_mask is not None else None)

    def to_elements(self) -> List[int]:
        """Documented order (self-defined; v2 has no reference twin):
        [2 (version), steps, batch_size, lr, pr] ++ initial ++ final
        (++ initial_mask ++ final_mask in public-mask mode)."""
        out = [2, self.steps, self.batch_size, self.learning_rate,
               self.precision]
        out += self.initial_masked + self.final_masked
        if self.initial_mask is not None:
            out += self.initial_mask + self.final_mask
        return [v % P for v in out]


class TrainingUpdateV2Prover:
    """Builds the v2 trace (natural encoding, exact field division) and
    its AIR.  Mask RNG injectable like v1 (SURVEY.md pin #4)."""

    def __init__(self, options: ProofOptions, initial_state: List[int],
                 x_batch: List[List[int]], y_batch: List[List[int]],
                 learning_rate: int, precision: int, batch_size: int,
                 rng: Optional[np.random.Generator] = None,
                 masks: Optional[np.ndarray] = None,
                 public_masks: bool = False,
                 trace_length: Optional[int] = None):
        assert len(initial_state) == D_STATE
        assert len(x_batch) == batch_size and len(y_batch) == batch_size
        self.options = options
        self.initial_state = [v % P for v in initial_state]
        self.x_batch = [[v % P for v in r] for r in x_batch]
        self.y_batch = [[v % P for v in r] for r in y_batch]
        self.learning_rate = learning_rate % P
        self.precision = precision % P
        self.batch_size = batch_size
        self.public_masks = public_masks
        if trace_length is None:
            # v1-parity sizing (`src/training/prover.rs:65`) so v2 proofs
            # are comparable at the same CLI settings; the chain itself
            # needs only next_pow2(bs + 1) rows
            trace_length = trace_length_for(batch_size)
        assert trace_length & (trace_length - 1) == 0
        assert trace_length >= max(16, batch_size + 1)
        self.trace_length = trace_length
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
            self._rows = rows
        return self._rows

    def _state_row(self, i: int) -> List[int]:
        rows = self._raw_rows()
        return rows[min(i, self.batch_size)]     # held after bs steps

    def build_trace(self) -> TraceTable:
        n = self.trace_length
        bs = self.batch_size
        data = np.zeros((n, WIDTH), dtype=object)
        for i in range(n):
            row = self._state_row(i)
            for c in range(D_STATE):
                m = int(self.masks[i, c])
                data[i, c] = (row[c] + m) % P
                data[i, D_STATE + c] = m
            if i < bs:
                for f in range(FE):
                    data[i, X0 + f] = self.x_batch[i][f]
                for j in range(AC):
                    data[i, Y0 + j] = self.y_batch[i][j]
        return TraceTable(f128.from_ints(data.T))

    def pub_inputs(self) -> TrainingV2Inputs:
        n = self.trace_length
        first = self._state_row(0)
        last = self._state_row(n - 1)
        initial_masked = [(first[c] + int(self.masks[0, c])) % P
                          for c in range(D_STATE)]
        final_masked = [(last[c] + int(self.masks[n - 1, c])) % P
                        for c in range(D_STATE)]
        im = fm = None
        if self.public_masks:
            im = [int(self.masks[0, c]) for c in range(D_STATE)]
            fm = [int(self.masks[n - 1, c]) for c in range(D_STATE)]
        return TrainingV2Inputs(initial_masked, final_masked,
                                self.learning_rate, self.precision,
                                self.batch_size, n, im, fm)

    def client_rep(self) -> int:
        """Masked trace cell (0, last) — same per-client scalar rep
        convention as v1 (`src/main.rs:260`)."""
        n = self.trace_length
        return (self._state_row(n - 1)[0] + int(self.masks[n - 1, 0])) % P

    def air(self) -> TrainingUpdateV2Air:
        return TrainingUpdateV2Air(self.trace_length, self.pub_inputs(),
                                   self.options)


def build_polys_streamed_v2(prover: TrainingUpdateV2Prover,
                            col_block: int = 32) -> jnp.ndarray:
    """(8, 136, n) trace COEFFICIENT table for a huge v2 trace, built
    column-block-wise on device (the object-array `build_trace` is host
    bigints — minutes at 2^18+).  The raw SGD chain itself is host-int
    (`_sgd_step`, only bs+1 distinct rows); everything O(n) — row
    expansion, masking, iNTT — runs on device with buffer donation.
    Feed the result to `prover.big.prove_big(polys=...)`."""
    import functools

    import jax as _jax

    from .training import _u64_masks_to_limbs

    n, bs = prover.trace_length, prover.batch_size
    rows = prover._raw_rows()                       # (bs+1) x 60 host ints
    states = f128.from_ints(np.asarray(rows, dtype=object))  # (8,bs+1,60)
    rowmap = jnp.asarray(np.minimum(np.arange(n), bs).astype(np.int32))

    @functools.partial(_jax.jit, donate_argnums=(0,))
    def store_masked_block(buf, state_cols, mask, rmap, start):
        raw = jnp.take(state_cols, rmap, axis=1)    # (8, n, B)
        vals = f128.add(raw, mask)
        # stored PACKED as (4, W, n) canonical words (see the v1 builder)
        return _jax.lax.dynamic_update_slice(
            buf, f128.to_uint32_words(
                ntt.interpolate_bitrev(jnp.swapaxes(vals, 1, 2))),
            (0, start, 0))

    @functools.partial(_jax.jit, donate_argnums=(0,))
    def store_plain_block(buf, vals_cols, start):
        return _jax.lax.dynamic_update_slice(
            buf, f128.to_uint32_words(ntt.interpolate_bitrev(vals_cols)),
            (0, start, 0))

    buf = jnp.zeros((4, WIDTH, n), jnp.uint32)
    for s in range(0, D_STATE, col_block):
        e = min(s + col_block, D_STATE)
        mask = jnp.asarray(_u64_masks_to_limbs(prover.masks[:, s:e]))
        buf = store_masked_block(buf, states[:, :, s:e], mask, rowmap,
                                 jnp.int32(s))
        buf = store_plain_block(buf, jnp.swapaxes(mask, 1, 2),
                                jnp.int32(D_STATE + s))
    # sample columns: rows < bs carry the batch, zeros after (pad col
    # WIDTH-1 stays the zero polynomial)
    xy = np.zeros((bs, FE + AC), dtype=object)
    for i in range(bs):
        xy[i, :FE] = prover.x_batch[i]
        xy[i, FE:] = prover.y_batch[i]
    xy_l = f128.from_ints(xy)                        # (8, bs, 15)
    data_cols = jnp.zeros((8, FE + AC, n), jnp.uint32)
    data_cols = data_cols.at[:, :, :bs].set(jnp.swapaxes(xy_l, 1, 2))
    buf = store_plain_block(buf, data_cols, jnp.int32(X0))
    buf.block_until_ready()
    return buf


def signed_pair_to_natural(v: int, s: int) -> int:
    """Convert the reference's (value, sign) MAX-complement encoding
    (`src/helper.rs:16`, `src/signed.rs:3`) to the natural field encoding
    v2 states SGD over (negative x is p - x)."""
    from ..ops.signed import MAX_INT

    if s % P == 0:
        return v % P
    magnitude = (MAX_INT + 1 - v) % P
    return (P - magnitude) % P
