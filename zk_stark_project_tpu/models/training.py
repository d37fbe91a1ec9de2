"""Training-update STARK statement (masked SGD step batch).

Port of `src/training/{air,prover}.rs`: the trace has width 4*(AC*FE+AC)
= 240 — first half is the masked interleaved state [v0+m, s0+m', ...],
second half the masks — and length max(16, next_pow2(2*60*bs))
(`src/training/prover.rs:65`).  Row i for 1 <= i <= bs applies sample i-1's
SGD step to the raw state; rows beyond bs re-mask the same state with fresh
masks (`src/training/prover.rs:136-200`).

Per SURVEY.md pin #3 the reference's transition constraints are inert (the
`current_step()` stub at `src/helper.rs:136-147` always returns 0, so
`evaluate_transition` always writes zeros, `src/training/air.rs:274-286`);
only the masked boundary assertions bind.  This AIR reproduces that exactly
(`transitions are identically zero`), keeping the same declared constraint
count/degrees so proof shapes match.

Trace building runs as a JAX scan over the batch samples (vectorized signed
field ops over the 60 state cells), then one vectorized mask-add over all
rows.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import f128
from ..ops import f128_ref as ref
from ..ops.signed import f64_to_felt
from ..prover.air import Air, Assertion
from ..prover.options import ProofOptions
from ..prover.trace import TraceTable
from . import ml_math
from .ml_math import AC, FE


@dataclasses.dataclass
class TrainingUpdateInputs:
    """`src/training/air.rs:18-33`."""
    initial_masked: List[int]   # 2*(AC*FE+AC) interleaved [v,s] + mask
    final_masked: List[int]
    steps: int                  # trace_length - 1
    x_batch: List[List[int]]    # bs x FE
    y_batch: List[List[int]]    # bs x AC (one-hot, scaled)
    learning_rate: int
    precision: int
    batch_size: int

    def to_elements(self) -> List[int]:
        """`src/training/air.rs:70-94`.  NOTE steps and batch_size go in as
        f64_to_felt (x1e6) — unlike aggregation (SURVEY.md pin #5)."""
        out = list(self.initial_masked)
        out.extend(self.final_masked)
        out.append(f64_to_felt(float(self.steps)))
        out.append(f64_to_felt(float(self.batch_size)))
        for row in self.x_batch:
            out.extend(row)
        for row in self.y_batch:
            out.extend(row)
        out.append(self.learning_rate)
        out.append(self.precision)
        return out


class TrainingUpdateAir(Air):
    """`src/training/air.rs:101-291` (with the inert-transition semantics
    reproduced exactly — pin #3)."""

    #: composer shortcut: all transition evaluations are identically zero.
    all_transitions_zero = True
    #: fused-phase transition kernel (`prover/phases.py`): inert.
    transition_kind = "zero"

    def __init__(self, trace_length: int, pub_inputs: TrainingUpdateInputs,
                 options: ProofOptions):
        width = 4 * (AC * FE + AC)
        super().__init__(trace_width=width, trace_length=trace_length,
                         options=options)
        self.pub_inputs = pub_inputs
        # declared: one degree-1 constraint per column (`src/training/air.rs:107`)
        self.transition_degrees = [1] * width
        assert len(pub_inputs.x_batch) == pub_inputs.batch_size
        assert len(pub_inputs.y_batch) == pub_inputs.batch_size

    def get_assertions(self) -> List[Assertion]:
        """Masked initial state at row 0, masked final at row n
        (`src/training/air.rs:130-151`)."""
        half = self.trace_width // 2
        n = self.trace_length - 1
        out = [Assertion(i, 0, self.pub_inputs.initial_masked[i])
               for i in range(half)]
        out += [Assertion(i, n, self.pub_inputs.final_masked[i])
                for i in range(half)]
        return out

    def evaluate_transitions_jax(self, cur: jnp.ndarray,
                                 nxt: jnp.ndarray) -> jnp.ndarray:
        d = cur.shape[2]
        return jnp.zeros((8, self.trace_width, d), dtype=jnp.uint32)

    def evaluate_transitions_at(self, cur: Sequence[int],
                                nxt: Sequence[int]) -> List[int]:
        return [0] * self.trace_width

    def pub_input_elements(self) -> List[int]:
        return self.pub_inputs.to_elements()


def trace_length_for(batch_size: int) -> int:
    """max(16, next_pow2(2 * 60 * bs)) (`src/training/prover.rs:65`)."""
    cells = ml_math.STATE_CELLS
    return max(16, 1 << (2 * cells * batch_size - 1).bit_length())


def _raw_states_chain(state0, x_batch, y_batch, lr_int: int, pr_int: int):
    """Run the SGD chain over the batch *eagerly*: each signed field op is a
    small jitted kernel reused across samples.  (A single fused scan graph
    inlines hundreds of limb-multiplies and makes XLA compiles blow up;
    per-op dispatch on 60-cell states costs microseconds.)

    state0: (w (8,AC,FE), ws, b (8,AC), bs) limbs.
    x_batch: (8, BS, FE); y_batch: (8, BS, AC).
    Returns stacked per-sample post-states, each (8, BS, ...).
    """
    bs = x_batch.shape[1]
    w, ws, b, bsn = state0
    outs = []
    xs = f128.zeros((x_batch.shape[2],))  # feature signs all zero (`src/main.rs:192-196`)
    for i in range(bs):
        w, ws, b, bsn = ml_math.sgd_step(
            w, ws, b, bsn, x_batch[:, i], xs, y_batch[:, i], lr_int, pr_int)
        outs.append((w, ws, b, bsn))
    return tuple(jnp.stack([o[j] for o in outs], axis=1) for j in range(4))


def _u64_masks_to_limbs(masks: np.ndarray) -> np.ndarray:
    """uint64 mask array -> (8,) + shape uint32 limbs (vectorized numpy —
    masks are < 2^64 so the top four 16-bit limbs are zero)."""
    out = np.zeros((8,) + masks.shape, np.uint32)
    for i in range(4):
        out[i] = ((masks >> np.uint64(16 * i)) &
                  np.uint64(0xFFFF)).astype(np.uint32)
    return out


@functools.lru_cache(maxsize=None)
def _build_stacked_closed(lr_int: int, pr_int: int, n: int):
    """Array-args-only jit closure over the static (bigint) params — the
    calling convention `jax.export` artifacts need (`prover/aot.py`:
    exported calls take every argument as a dynamic array input, and the
    field-element statics exceed int64)."""
    return jax.jit(lambda *arrs: _build_stacked_traces(
        *arrs, lr_int, pr_int, n))


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _build_stacked_traces(w0, ws0, b0, bs0, xb, yb, mask_limbs,
                          lr_int: int, pr_int: int, n: int):
    """Batched-device trace build as ONE executable.

    w0/ws0: (8, C, AC, FE); b0/bs0: (8, C, AC); xb: (8, C, BS, FE);
    yb: (8, C, BS, AC); mask_limbs: (8, C, n, 2*cells).  Returns the
    stacked trace tensor (8, C, 4*cells, n).

    The SGD chain runs as a lax.scan over the batch samples (the chain is
    sequential by construction, `src/training/prover.rs:136-200`); each
    step is vectorized over all C devices.  Bit-identical to the eager
    per-device path (same op sequence; tested in tests/test_ml_math.py).
    """
    bs = xb.shape[2]
    c = w0.shape[1]

    def body(carry, xy):
        w, ws, b, bsn = carry
        x, y = xy
        xs = f128.zeros(x.shape[1:])
        new = ml_math.sgd_step(w, ws, b, bsn, x, xs, y, lr_int, pr_int)
        return new, new

    xs_scan = (jnp.moveaxis(xb, 2, 0), jnp.moveaxis(yb, 2, 0))
    _, seqs = jax.lax.scan(body, (w0, ws0, b0, bs0), xs_scan)
    w_seq, ws_seq, b_seq, bs_seq = seqs  # (BS, 8, C, ...)

    def cat(init, seq):
        seq = jnp.moveaxis(seq, 0, 2)                  # (8, C, BS, ...)
        tail = jnp.repeat(seq[:, :, -1:], n - bs - 1, axis=2)
        return jnp.concatenate([init[:, :, None], seq, tail], axis=2)

    w_rows = cat(w0, w_seq)      # (8, C, n, AC, FE)
    ws_rows = cat(ws0, ws_seq)
    b_rows = cat(b0, b_seq)      # (8, C, n, AC)
    bs_rows = cat(bs0, bs_seq)

    wv = jnp.stack([w_rows.reshape(8, c, n, AC * FE),
                    ws_rows.reshape(8, c, n, AC * FE)],
                   axis=-1).reshape(8, c, n, 2 * AC * FE)
    bv = jnp.stack([b_rows, bs_rows], axis=-1).reshape(8, c, n, 2 * AC)
    raw = jnp.concatenate([wv, bv], axis=-1)           # (8, C, n, 120)
    masked = f128.add(raw, mask_limbs)
    rows = jnp.concatenate([masked, mask_limbs], axis=-1)  # (8, C, n, 240)
    return jnp.swapaxes(rows, 2, 3)                    # (8, C, 240, n)


def build_traces_stacked(provers: Sequence["TrainingUpdateProver"]):
    """Build every prover's trace in one fused device executable.

    Returns the stacked (8, C, W, n) tensor; each prover's `_trace` is set
    to a view and its boundary rows are cached so `get_pub_inputs()` /
    client-rep extraction need no further device pulls (the caller should
    pull boundaries via `fetch_boundaries`).
    """
    p0 = provers[0]
    n, bs = p0.trace_length, p0.batch_size
    for p in provers:
        assert (p.trace_length, p.batch_size) == (n, bs)

    def stack(attr):
        return f128.from_ints(np.asarray([getattr(p, attr) for p in provers],
                                         dtype=object))

    w0 = stack("initial_w")          # (8, C, AC, FE)
    ws0 = stack("w_sign")
    b0 = stack("initial_b")          # (8, C, AC)
    bs0 = stack("b_sign")
    xb = stack("x_batch")            # (8, C, BS, FE)
    yb = stack("y_batch")            # (8, C, BS, AC)
    masks = np.stack([p.masks for p in provers])       # (C, n, 120) u64
    mask_limbs = jnp.asarray(_u64_masks_to_limbs(masks))

    from ..prover import aot
    stacked = aot.call(
        "build_stacked", (p0.learning_rate, p0.precision, n),
        _build_stacked_closed(p0.learning_rate, p0.precision, n),
        w0, ws0, b0, bs0, xb, yb, mask_limbs)
    for i, p in enumerate(provers):
        p._trace = TraceTable(stacked[:, i])
    return stacked


def fetch_boundaries(provers: Sequence["TrainingUpdateProver"],
                     stacked) -> None:
    """Pull every prover's boundary rows (rows 0 and n-1) in ONE transfer
    and cache them for `get_pub_inputs` / client reps."""
    n = provers[0].trace_length
    rows = np.asarray(stacked[:, :, :, jnp.asarray([0, n - 1])])
    for i, p in enumerate(provers):
        ints = f128.to_ints(rows[:, i])               # (W, 2) object
        p._boundary = [[int(ints[c_, r]) for c_ in range(rows.shape[2])]
                       for r in range(2)]


@jax.jit
def _interleave_flatten(w, ws, b, bs):
    """(8, R, AC, FE)x2 + (8, R, AC)x2 -> (8, R, 120) interleaved
    [v0,s0,v1,s1,...] weights row-major then biases."""
    r = w.shape[1]
    wv = jnp.stack([w.reshape(8, r, AC * FE), ws.reshape(8, r, AC * FE)],
                   axis=-1).reshape(8, r, 2 * AC * FE)
    bv = jnp.stack([b, bs], axis=-1).reshape(8, r, 2 * AC)
    return jnp.concatenate([wv, bv], axis=-1)


class TrainingUpdateProver:
    """`src/training/prover.rs:17-218`.  Mask RNG is injectable (pin #4)."""

    def __init__(self, options: ProofOptions,
                 initial_w: List[List[int]], initial_b: List[int],
                 w_sign: List[List[int]], b_sign: List[int],
                 x_batch: List[List[int]], x_batch_sign: List[List[int]],
                 y_batch: List[List[int]],
                 learning_rate: int, precision: int, batch_size: int,
                 rng: Optional[np.random.Generator] = None,
                 masks: Optional[np.ndarray] = None):
        assert len(x_batch) == batch_size
        assert len(y_batch) == batch_size
        self.options = options
        self.initial_w, self.initial_b = initial_w, initial_b
        self.w_sign, self.b_sign = w_sign, b_sign
        self.x_batch, self.x_batch_sign = x_batch, x_batch_sign
        self.y_batch = y_batch
        self.learning_rate = learning_rate % ref.P
        self.precision = precision % ref.P
        self.batch_size = batch_size
        self.trace_length = trace_length_for(batch_size)
        flat_len = 2 * ml_math.STATE_CELLS
        if masks is None:
            rng = rng if rng is not None else np.random.default_rng()
            # fresh u64 mask per cell per row (`src/training/prover.rs:117-121`)
            masks = rng.integers(0, 2 ** 64, size=(self.trace_length, flat_len),
                                 dtype=np.uint64)
        self.masks = np.asarray(masks, dtype=np.uint64)
        assert self.masks.shape == (self.trace_length, flat_len)
        self._trace = None
        self._boundary = None  # [[row0 ints], [rowlast ints]] cache

    def build_trace(self) -> TraceTable:
        if self._trace is not None:
            return self._trace
        n, bs = self.trace_length, self.batch_size
        flat_len = 2 * ml_math.STATE_CELLS

        w0 = f128.from_ints(np.asarray(self.initial_w, dtype=object))
        ws0 = f128.from_ints(np.asarray(self.w_sign, dtype=object))
        b0 = f128.from_ints(np.asarray(self.initial_b, dtype=object))
        bs0 = f128.from_ints(np.asarray(self.b_sign, dtype=object))
        xb = f128.from_ints(np.asarray(self.x_batch, dtype=object))   # (8,BS,FE)
        yb = f128.from_ints(np.asarray(self.y_batch, dtype=object))   # (8,BS,AC)

        w_seq, ws_seq, b_seq, bs_seq = _raw_states_chain(
            (w0, ws0, b0, bs0), xb, yb, self.learning_rate, self.precision)

        # per-row raw state: row 0 = initial; rows 1..bs = post-sample states;
        # rows > bs hold the final state (`src/training/prover.rs:136-200`)
        def cat(init, seq):
            init = init[:, None]
            tail = jnp.repeat(seq[:, -1:], n - bs - 1, axis=1)
            return jnp.concatenate([init, seq, tail], axis=1)

        w_rows = cat(w0, w_seq)     # (8, n, AC, FE)
        ws_rows = cat(ws0, ws_seq)
        b_rows = cat(b0, b_seq)     # (8, n, AC)
        bs_rows = cat(bs0, bs_seq)

        raw = _interleave_flatten(w_rows, ws_rows, b_rows, bs_rows)  # (8,n,120)
        mask = f128.from_ints(self.masks.astype(object))             # (8,n,120)
        masked = f128.add(raw, mask)
        rows = jnp.concatenate([masked, mask], axis=-1)              # (8,n,240)
        self._trace = TraceTable(jnp.moveaxis(rows, 1, 2))           # (8,240,n)
        return self._trace

    def client_rep(self) -> int:
        """Masked trace cell (0, last) — the reference's per-client scalar
        rep (`src/main.rs:260`)."""
        if self._boundary is not None:
            return self._boundary[1][0]
        trace = self.build_trace()
        return trace.get(0, trace.length - 1)

    def get_pub_inputs(self) -> TrainingUpdateInputs:
        """`src/training/prover.rs:235-267`."""
        half = 2 * ml_math.STATE_CELLS
        if self._boundary is not None:
            initial_masked = self._boundary[0][:half]
            final_masked = self._boundary[1][:half]
            return TrainingUpdateInputs(
                initial_masked=initial_masked, final_masked=final_masked,
                steps=self.trace_length - 1,
                x_batch=self.x_batch, y_batch=self.y_batch,
                learning_rate=self.learning_rate, precision=self.precision,
                batch_size=self.batch_size)
        trace = self.build_trace()
        # pull only the two boundary rows (single small transfer)
        rows = np.asarray(trace.data[:, :half, [0, trace.length - 1]])
        initial_masked = [int(ref.from_limbs(rows[:, c, 0]))
                          for c in range(half)]
        final_masked = [int(ref.from_limbs(rows[:, c, 1]))
                        for c in range(half)]
        return TrainingUpdateInputs(
            initial_masked=initial_masked, final_masked=final_masked,
            steps=self.trace_length - 1,
            x_batch=self.x_batch, y_batch=self.y_batch,
            learning_rate=self.learning_rate, precision=self.precision,
            batch_size=self.batch_size)

    def air(self) -> TrainingUpdateAir:
        return TrainingUpdateAir(self.trace_length, self.get_pub_inputs(),
                                 self.options)


def build_polys_streamed(prover: "TrainingUpdateProver",
                         col_block: int = 24,
                         host_chain: bool = None) -> "jnp.ndarray":
    """(4, 240, n) packed trace COEFFICIENT table (BIT-REVERSED storage
    order — `prover/big`'s convention) for a huge-trace prover,
    assembled + interpolated column-block-wise so the 8 GB trace, its
    masks and the iNTT temporaries are never resident together (the
    normal build OOMs a 16 GB chip at n = 2^20).  Also computes the
    boundary rows (sets `prover._boundary`), so `prover.air()` never
    touches a full trace.  Feed the result to `prover.big.prove_big`
    via its `polys=` parameter."""
    import jax as _jax

    from ..ops import ntt

    n, bs = prover.trace_length, prover.batch_size
    half = 2 * ml_math.STATE_CELLS                     # 120

    if host_chain is None:
        host_chain = bs >= 256
    if host_chain:
        # host-int chain (the reference-semantics oracle,
        # `ml_math.ref_sgd_step`): ~2 ms/step of python bigints vs
        # ~200 ms/step of eager per-op device dispatches through a
        # tunneled chip — the 2^20 north-star trace build went 1790 s ->
        # tens of seconds.  Bit-equality with the device chain is pinned
        # by `tests/test_big_prove.py::test_streamed_polys_host_chain`.
        w, ws = prover.initial_w, prover.w_sign
        b, bsn = prover.initial_b, prover.b_sign
        rows_int = [ml_math.flatten_state_interleaved(w, ws, b, bsn)]
        for i in range(bs):
            w, ws, b, bsn = ml_math.ref_sgd_step(
                w, ws, b, bsn, prover.x_batch[i], prover.x_batch_sign[i],
                prover.y_batch[i], prover.learning_rate, prover.precision)
            rows_int.append(ml_math.flatten_state_interleaved(w, ws, b,
                                                              bsn))
        states = f128.from_ints(np.asarray(rows_int, dtype=object))
    else:
        w0 = f128.from_ints(np.asarray(prover.initial_w, dtype=object))
        ws0 = f128.from_ints(np.asarray(prover.w_sign, dtype=object))
        b0 = f128.from_ints(np.asarray(prover.initial_b, dtype=object))
        bs0 = f128.from_ints(np.asarray(prover.b_sign, dtype=object))
        xb = f128.from_ints(np.asarray(prover.x_batch, dtype=object))
        yb = f128.from_ints(np.asarray(prover.y_batch, dtype=object))
        # eager per-sample chain (small jitted kernels; a fused scan graph
        # is a pathological XLA compile — see `_raw_states_chain`)
        w_seq, ws_seq, b_seq, bs_seq = _raw_states_chain(
            (w0, ws0, b0, bs0), xb, yb, prover.learning_rate,
            prover.precision)

        def _cat(init, seq):
            return jnp.concatenate([init[:, None], seq], axis=1)

        states = _interleave_flatten(_cat(w0, w_seq), _cat(ws0, ws_seq),
                                     _cat(b0, b_seq), _cat(bs0, bs_seq))
    # states: (8, bs+1, 120) — row 0 = initial, row i = after sample i-1

    rowmap = jnp.asarray(np.minimum(np.arange(n), bs).astype(np.int32))

    # ONE jit per block kind, buffer donated: eager per-op materialization
    # of raw/mask/sum/transpose (0.8 GB each at 2^20) next to the 8 GB
    # buffer OOMs; inside a jit XLA frees/reuses them immediately.
    @functools.partial(_jax.jit, donate_argnums=(0,))
    def store_state_block(buf, state_cols, mask, rmap, start):
        raw = jnp.take(state_cols, rmap, axis=1)       # (8, n, B)
        vals = f128.add(raw, mask)
        # stored PACKED: (4, W, n) canonical u32 words — half the HBM
        # of the 8x16-bit limb form (the 2^20 table is 3.85 GB vs 7.7 GB;
        # `prover/big._slice_cols` unpacks per streamed block)
        return _jax.lax.dynamic_update_slice(
            buf, f128.to_uint32_words(
                ntt.interpolate_bitrev(jnp.swapaxes(vals, 1, 2))),
            (0, start, 0))

    @functools.partial(_jax.jit, donate_argnums=(0,))
    def store_mask_block(buf, mask, start):
        return _jax.lax.dynamic_update_slice(
            buf, f128.to_uint32_words(
                ntt.interpolate_bitrev(jnp.swapaxes(mask, 1, 2))),
            (0, start, 0))

    buf = jnp.zeros((4, 2 * half, n), jnp.uint32)
    for s in range(0, half, col_block):
        e = min(s + col_block, half)
        mask = jnp.asarray(_u64_masks_to_limbs(prover.masks[:, s:e]))
        buf = store_state_block(buf, states[:, :, s:e], mask, rowmap,
                                jnp.int32(s))
        buf = store_mask_block(buf, mask, jnp.int32(half + s))
    buf.block_until_ready()

    # boundary rows (row 0 and n-1) from the small state table + masks
    s_ints = f128.to_ints(np.asarray(states[:, [0, bs]]))   # (2,120) object
    boundary = []
    for r, mrow in ((0, prover.masks[0]), (1, prover.masks[n - 1])):
        masked = [(int(s_ints[r, c]) + int(mrow[c])) % ref.P
                  for c in range(half)]
        boundary.append(masked + [int(m) for m in mrow])
    prover._boundary = boundary
    return buf
