"""Pallas TPU kernels for f128 — fused limb arithmetic in VMEM.

The jnp path (`ops/f128.py`) materializes every `mul` result to HBM (an
`optimization_barrier` keeps XLA-CPU compiles sane), so chained field ops
pay an HBM round trip each.  These kernels keep the whole limb dataflow in
VMEM/registers: one read of the operands, one write of the result, however
long the chain.

Kernels:
  * `mul(a, b)`        — elementwise product (drop-in for `f128.mul`)
  * `mul_add(a, b, c)` — a*b + c fused
  * `pow7(x)`          — x^7 (2 squarings + 2 muls fused), the MiMC round

All share the (8,) + batch limb layout and the red128 (< 2^128, lazy)
representation.  Bit-exactness vs the jnp path is tested in
`tests/test_pallas.py` (interpret mode on CPU, compiled on TPU).

Enable/disable: `available()` is True on the TPU backend (or when
ZKSTARK_FORCE_PALLAS=interpret forces interpreter mode for testing);
`ops/f128.py` does NOT auto-dispatch — hot paths opt in explicitly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import f128

_LANE = 128          # TPU lane width
_TILE_ROWS = 64      # sublane rows per grid step (64*128 elems per tile)


def _interpret() -> bool:
    return os.environ.get("ZKSTARK_FORCE_PALLAS") == "interpret"


def available() -> bool:
    """Pallas kernels are usable: real TPU backend or forced interpret."""
    if _interpret():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


# ---------------------------------------------------------------------------
# Kernel bodies (operate on loaded (rows, 128) u32 limb lists)
# ---------------------------------------------------------------------------


def _load_limbs(ref):
    return [ref[i] for i in range(8)]


def _store_limbs(ref, limbs):
    for i in range(8):
        ref[i] = limbs[i]


def _mul_limbs(a_l, b_l):
    """Product of two 8-limb red128 values -> 8-limb red128 (no barrier)."""
    zero = jnp.zeros_like(a_l[0])
    acc = [zero] * 16
    for i in range(8):
        for j in range(8):
            pp = a_l[i] * b_l[j]
            acc[i + j] = acc[i + j] + (pp & f128.LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (pp >> f128.LIMB_BITS)
    t = f128._carry_norm(acc, 16)
    return f128._reduce_red128(t, 2 ** 256)


def _add_limbs(a_l, b_l):
    s = [x + y for x, y in zip(a_l, b_l)]
    s, c = f128._carry_norm_with_carry(s, 8)
    s, c2 = f128._carry_norm_with_carry(f128._add_fold(s, c), 8)
    return f128._carry_norm(f128._add_fold(s, c2), 8)


def _mul_kernel(a_ref, b_ref, o_ref):
    _store_limbs(o_ref, _mul_limbs(_load_limbs(a_ref), _load_limbs(b_ref)))


def _mul_add_kernel(a_ref, b_ref, c_ref, o_ref):
    prod = _mul_limbs(_load_limbs(a_ref), _load_limbs(b_ref))
    _store_limbs(o_ref, _add_limbs(prod, _load_limbs(c_ref)))


def _pow7_kernel(x_ref, o_ref):
    x = _load_limbs(x_ref)
    x2 = _mul_limbs(x, x)
    x4 = _mul_limbs(x2, x2)
    _store_limbs(o_ref, _mul_limbs(_mul_limbs(x4, x2), x))


def _sub_limbs(a_l, b_l):
    """red128 subtraction (mirrors `f128._sub_impl`)."""
    d, w = f128._sub_limbs_with_borrow(a_l, b_l)
    d, w2 = f128._sub_const_with_borrow(d, f128._FOLD_LIMBS, k=w)
    d, _ = f128._sub_const_with_borrow(d, f128._FOLD_LIMBS, k=(w & w2))
    return d


def _add_kernel(a_ref, b_ref, o_ref):
    _store_limbs(o_ref, _add_limbs(_load_limbs(a_ref), _load_limbs(b_ref)))


def _sub_kernel(a_ref, b_ref, o_ref):
    _store_limbs(o_ref, _sub_limbs(_load_limbs(a_ref), _load_limbs(b_ref)))


# ---------------------------------------------------------------------------
# pallas_call wrappers: flatten batch -> (8, M, 128), tile the row axis
# ---------------------------------------------------------------------------


def _call_elementwise(kernel, arity, *arrays):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = jnp.broadcast_shapes(*(a.shape[1:] for a in arrays))

    def _bcast(a):
        extra = len(shape) - (a.ndim - 1)
        return jnp.broadcast_to(
            a.reshape((8,) + (1,) * extra + a.shape[1:]), (8,) + shape)

    arrays = [_bcast(a) for a in arrays]
    n = int(np.prod(shape)) if shape else 1
    tile = _TILE_ROWS * _LANE
    m_pad = -(-n // tile) * tile
    rows = m_pad // _LANE

    def prep(a):
        flat = a.reshape(8, n)
        if m_pad != n:
            flat = jnp.concatenate(
                [flat, jnp.zeros((8, m_pad - n), jnp.uint32)], axis=1)
        return flat.reshape(8, rows, _LANE)

    ins = [prep(a) for a in arrays]
    grid = (rows // _TILE_ROWS,)
    spec = pl.BlockSpec((8, _TILE_ROWS, _LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, rows, _LANE), jnp.uint32),
        grid=grid,
        in_specs=[spec] * arity,
        out_specs=spec,
        interpret=_interpret(),
    )(*ins)
    return out.reshape(8, m_pad)[:, :n].reshape((8,) + shape)


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise red128 product — Pallas twin of `f128.mul`."""
    return _call_elementwise(_mul_kernel, 2, a, b)


@jax.jit
def mul_add(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """a*b + c fused in one VMEM pass."""
    return _call_elementwise(_mul_add_kernel, 3, a, b, c)


@jax.jit
def pow7(x: jnp.ndarray) -> jnp.ndarray:
    """x^7 fused (the MiMC round nonlinearity, `src/helper.rs:213-220`)."""
    return _call_elementwise(_pow7_kernel, 1, x)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise red128 sum — Pallas twin of `f128.add`."""
    return _call_elementwise(_add_kernel, 2, a, b)


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise red128 difference — Pallas twin of `f128.sub`."""
    return _call_elementwise(_sub_kernel, 2, a, b)


# ---------------------------------------------------------------------------
# Fused NTT: every butterfly stage of one transform in a single VMEM pass
# ---------------------------------------------------------------------------
#
# This is the replacement for winterfell's concurrent NTT engine (inside
# `DefaultTraceLde`, reference `src/training/prover.rs:273-281`): the jnp
# stage loop (`ops/ntt._apply_stages`) materializes 3 arrays to HBM per
# stage; this kernel keeps the whole transform resident in VMEM — one HBM
# read of the inputs, one write of the results, log2(n) stages of pure VPU
# work in between.
#
# Butterfly-by-roll formulation (Mosaic has no in-kernel strided reshapes,
# but lane rolls are native): on bit-reversed input, stage s pairs positions
# (i, i + half) within blocks of m = 2^s.  With
#     t = tw_s * roll(x, -half)        (tw_s zero on upper half-positions)
#     out = where(lower, x + t, roll(x, +half) - roll(t, +half))
# every lane computes its butterfly output with only elementwise ops and
# static circular shifts.  The upper lanes of `t` are garbage but provably
# never read (roll(t, +half) at an upper position pulls from a lower one).

#: fused-NTT size cap: twiddle table is (8, log2 n, n) u32 in VMEM, and a
#: full 8-row block at 2^13 would blow the scoped-VMEM budget (larger
#: transforms go through the four-step decomposition in `ops/ntt.py`).
NTT_MAX_LOG2 = 12
#: minimum size — the roll trick needs at least one full lane row.
NTT_MIN_LOG2 = 7


def ntt_supported(logn: int, batch: int) -> bool:
    """Can `ntt_stages` handle a (batch, 2^logn) transform directly?"""
    if not (NTT_MIN_LOG2 <= logn <= NTT_MAX_LOG2 + 1):
        return False
    if logn == NTT_MAX_LOG2 + 1:
        return batch <= 4  # single sub-8-row block still fits VMEM
    return True


def _ntt_stages_kernel(x_ref, tw_ref, mask_ref, o_ref, *, logn: int,
                       rows: int):
    """fori_loop over the log2(n) stages (dynamic roll shifts keep the
    Mosaic kernel one-stage-sized — an unrolled version compiles ~10x
    slower for zero runtime win)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << logn

    def roll(v, shift):
        return pltpu.roll(v, shift=shift, axis=v.ndim - 1)

    def stage(s, xl):  # s = 0 .. logn-1; block size m = 2^(s+1)
        xl = list(xl)
        half = jax.lax.shift_left(jnp.int32(1), s)
        twl = [jnp.broadcast_to(tw_ref[i, pl.ds(s, 1), :], (rows, n))
               for i in range(8)]
        rolled = [roll(v, n - half) for v in xl]           # x[i+half]
        t = _mul_limbs(twl, rolled)
        added = _add_limbs(xl, t)
        x_back = [roll(v, half) for v in xl]               # x[i-half]
        t_back = [roll(v, half) for v in t]                # t[i-half]
        subbed = _sub_limbs(x_back, t_back)
        lower = jnp.broadcast_to(mask_ref[pl.ds(s, 1), :] != 0, (rows, n))
        return tuple(jnp.where(lower, a, d)
                     for a, d in zip(added, subbed))

    xl = jax.lax.fori_loop(0, logn, stage,
                           tuple(x_ref[i] for i in range(8)))
    _store_limbs(o_ref, list(xl))


# ---------------------------------------------------------------------------
# DIF (Gentleman–Sande) fused NTT: natural input -> bit-reversed output
# ---------------------------------------------------------------------------
#
# Used by the four-step decomposition (`ops/ntt._four_step`): DIF needs no
# input bit-reverse gather, and its output order is absorbed into the
# four-step's single final unscramble permutation — so the two inner
# transforms cost zero data permutations.
#
# Work reduction vs the DIT roll kernel (which pays one FULL-width mul per
# stage, half of it on garbage lanes): DIF's first stages pair CONTIGUOUS
# half-blocks, so while the half-block width is >= one 128-lane row the
# butterfly runs as static slices with HALF-width muls (no waste), and the
# final stage (m=2, twiddle w_2^0=1) needs no mul at all.  Profile (v5e,
# 2^20): the stage kernel is 91% of four-step time and runs at the
# empirical u32 streaming ceiling, so op-count cuts translate ~1:1.

#: sliced (half-width-mul) DIF stages: measured fastest with block halves
#: down to 64 lanes (A/B on v5e: half>=64 gave -9% vs half>=128; half>=32
#: regressed), capped so the unrolled block count stays small.
_DIF_MAX_SLICED = 6


def _dif_n_sliced(logn: int) -> int:
    return min(max(0, logn - 6), _DIF_MAX_SLICED)


def _ntt_stages_dif_kernel(*refs, logn: int, rows: int, has_scale: bool):
    """DIF stages, natural -> bit-reversed.  Stage s (1-based) has block
    size m = n >> (s-1): out[lower] = u + v, out[upper] = (u - v) * w_m^i.

    Layout: sliced stages unrolled (static slices, half-width muls), middle
    stages as a fori_loop over the roll formulation, last stage (m=2)
    mul-free.  With `has_scale`, inputs are multiplied elementwise by the
    extra operand first (the four-step mid twiddle, fused so it costs no
    extra HBM pass)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_scale:
        x_ref, stw_ref, tw_ref, mask_ref, scale_ref, o_ref = refs
    else:
        x_ref, stw_ref, tw_ref, mask_ref, o_ref = refs
        scale_ref = None
    n = 1 << logn
    n_sliced = _dif_n_sliced(logn)

    def roll(v, shift):
        return pltpu.roll(v, shift=shift, axis=v.ndim - 1)

    xl = [x_ref[i] for i in range(8)]
    if scale_ref is not None:
        xl = _mul_limbs(xl, [scale_ref[i] for i in range(8)])

    # -- sliced stages: contiguous half-blocks, half-width muls ------------
    for s in range(1, n_sliced + 1):
        m = n >> (s - 1)
        half = m >> 1
        twl = [jnp.broadcast_to(stw_ref[i, pl.ds(s - 1, 1), :half],
                                (rows, half)) for i in range(8)]
        segs = [[] for _ in range(8)]
        for b in range(1 << (s - 1)):
            off = b * m
            u = [v[:, off:off + half] for v in xl]
            w = [v[:, off + half:off + m] for v in xl]
            su = _add_limbs(u, w)
            t = _mul_limbs(_sub_limbs(u, w), twl)
            for i in range(8):
                segs[i].append(su[i])
                segs[i].append(t[i])
        xl = [jnp.concatenate(parts, axis=1) for parts in segs]

    # -- middle stages: roll formulation ----------------------------------
    # The twiddle mul's result is only read at upper half-positions (the
    # final `where` picks `summ` at lower ones), so a plain full-width mul
    # wastes half its lanes.  When the row tile splits into two 8-aligned
    # halves, PACK them: rotate the second half's butterfly differences
    # down by `half` onto the lower lane positions of the first half's,
    # and run ONE mul at half the volume (the table holds each position's
    # own twiddle at upper lanes and its +half neighbour's at lower lanes
    # — see `ntt._dif_tables`).  ~2x less mul work on the last ~5 stages;
    # the two extra rolls + selects are noise next to a 64-product limb
    # mul.  Measured bit-exact vs the unpacked path.
    packed_rows = rows % 16 == 0

    def stage(r, xl):
        xl = list(xl)
        s = r + n_sliced + 1                       # stage number (traced)
        half = jax.lax.shift_right_logical(jnp.int32(n), s)
        summ = _add_limbs(xl, [roll(v, n - half) for v in xl])
        diff = _sub_limbs([roll(v, half) for v in xl], xl)
        if packed_rows:
            r2 = rows // 2
            low_h = jnp.broadcast_to(mask_ref[pl.ds(r, 1), :] != 0,
                                     (r2, n))
            twl = [jnp.broadcast_to(tw_ref[i, pl.ds(r, 1), :], (r2, n))
                   for i in range(8)]
            pk = [jnp.where(low_h, roll(v[r2:], n - half), v[:r2])
                  for v in diff]
            tp = _mul_limbs(twl, pk)
            t = [jnp.concatenate([a, roll(a, half)], axis=0) for a in tp]
        else:
            twl = [jnp.broadcast_to(tw_ref[i, pl.ds(r, 1), :], (rows, n))
                   for i in range(8)]
            t = _mul_limbs(twl, diff)
        lower = jnp.broadcast_to(mask_ref[pl.ds(r, 1), :] != 0, (rows, n))
        return tuple(jnp.where(lower, a, d) for a, d in zip(summ, t))

    n_roll = max(0, logn - 1 - n_sliced)
    xl = jax.lax.fori_loop(0, n_roll, stage, tuple(xl))

    # -- final stage (m=2): twiddle = 1, pure add/sub ----------------------
    xl = list(xl)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    even = (lane & 1) == 0
    summ = _add_limbs(xl, [roll(v, n - 1) for v in xl])
    diff = _sub_limbs([roll(v, 1) for v in xl], xl)
    _store_limbs(o_ref, [jnp.where(even, a, d)
                         for a, d in zip(summ, diff)])


def ntt_stages_dif(x: jnp.ndarray, stw: jnp.ndarray, tw_ext: jnp.ndarray,
                   masks: jnp.ndarray, scale: jnp.ndarray = None
                   ) -> jnp.ndarray:
    """All DIF butterfly stages fused: natural-order input ->
    BIT-REVERSED output (out[p] = X[rev(p)]).

    x: (8, B, n) u32 red128 limbs.  stw: (8, S, n/2) sliced-stage twiddles
    (stage s at [:, s-1, :n>>s]); tw_ext: (8, R, n) roll-stage twiddles in
    natural position order (zero on lower half-positions); masks: (R, n)
    u32, 1 on lower half-positions.  Tables from `ntt._dif_tables`.
    `scale` (optional, same shape as x): elementwise pre-multiplier fused
    into the kernel (the four-step mid twiddle).
    Bit-exact vs take(ntt natural output, bitrev)."""
    return _dif_dit_call(_ntt_stages_dif_kernel, x, stw, tw_ext, masks,
                         scale)


def _ntt_stages_dit_kernel(*refs, logn: int, rows: int, has_scale: bool):
    """DIT stages, BIT-REVERSED input -> natural output — the execution
    mirror of `_ntt_stages_dif_kernel` (same op-count optimizations):
    stage 1 (m=2, twiddle 1) is mul-free, the small-m stages run the
    packed roll formulation, and the last stages (half >= 64 lanes) run
    as contiguous static slices with half-width muls.  Stage s has block
    size m = 2^s: out[j] = u + t, out[j+m/2] = u - t with u = x[j],
    t = w_m^(j mod m) * x[j+m/2].  With `has_scale`, inputs are
    multiplied by the extra operand first (the four-step mid twiddle)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_scale:
        x_ref, stw_ref, tw_ref, mask_ref, scale_ref, o_ref = refs
    else:
        x_ref, stw_ref, tw_ref, mask_ref, o_ref = refs
        scale_ref = None
    n = 1 << logn
    n_sliced = _dif_n_sliced(logn)

    def roll(v, shift):
        return pltpu.roll(v, shift=shift, axis=v.ndim - 1)

    xl = [x_ref[i] for i in range(8)]
    if scale_ref is not None:
        xl = _mul_limbs(xl, [scale_ref[i] for i in range(8)])

    # -- stage 1 (m=2): twiddle = 1, pure add/sub --------------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    even = (lane & 1) == 0
    summ = _add_limbs(xl, [roll(v, n - 1) for v in xl])
    diff = _sub_limbs([roll(v, 1) for v in xl], xl)
    xl = [jnp.where(even, a, d) for a, d in zip(summ, diff)]

    # -- small-m stages: roll formulation, packed mul ----------------------
    # t = tw * x[j+half] is only read at LOWER half-positions (directly,
    # and via roll(+half) for the upper outputs), so two 8-aligned row
    # halves share one half-volume mul exactly like the DIF kernel's
    # packed path (table: own twiddle at lower lanes, +half neighbour's
    # at upper — `ntt._dit_tables`).
    packed_rows = rows % 16 == 0

    def stage(r, xl):
        xl = list(xl)
        s = r + 2                                   # block size m = 2^s
        half = jax.lax.shift_left(jnp.int32(1), s - 1)
        rolled = [roll(v, n - half) for v in xl]    # x[p+half] at p
        if packed_rows:
            r2 = rows // 2
            low_h = jnp.broadcast_to(mask_ref[pl.ds(r, 1), :] != 0,
                                     (r2, n))
            twl = [jnp.broadcast_to(tw_ref[i, pl.ds(r, 1), :], (r2, n))
                   for i in range(8)]
            pk = [jnp.where(low_h, v[:r2], roll(v[r2:], half))
                  for v in rolled]
            tp = _mul_limbs(twl, pk)
            t = [jnp.concatenate([a, roll(a, n - half)], axis=0)
                 for a in tp]
        else:
            twl = [jnp.broadcast_to(tw_ref[i, pl.ds(r, 1), :], (rows, n))
                   for i in range(8)]
            t = _mul_limbs(twl, rolled)
        summ = _add_limbs(xl, t)
        diffd = _sub_limbs([roll(v, half) for v in xl],
                           [roll(v, half) for v in t])
        lower = jnp.broadcast_to(mask_ref[pl.ds(r, 1), :] != 0, (rows, n))
        return tuple(jnp.where(lower, a, d) for a, d in zip(summ, diffd))

    n_roll = max(0, logn - 1 - n_sliced)
    xl = jax.lax.fori_loop(0, n_roll, stage, tuple(xl))

    # -- large-m stages: contiguous half-blocks, half-width muls -----------
    xl = list(xl)
    for q in range(n_sliced):
        s = logn - n_sliced + 1 + q
        m = 1 << s
        half = m >> 1
        twl = [jnp.broadcast_to(stw_ref[i, pl.ds(q, 1), :half],
                                (rows, half)) for i in range(8)]
        segs = [[] for _ in range(8)]
        for b in range(n >> s):
            off = b * m
            u = [v[:, off:off + half] for v in xl]
            w = [v[:, off + half:off + m] for v in xl]
            t = _mul_limbs(twl, w)
            su = _add_limbs(u, t)
            sd = _sub_limbs(u, t)
            for i in range(8):
                segs[i].append(su[i])
                segs[i].append(sd[i])
        xl = [jnp.concatenate(parts, axis=1) for parts in segs]
    _store_limbs(o_ref, xl)


def _dif_dit_call(kern_body, x, stw, tw_ext, masks, scale):
    """Shared pallas_call wrapper for the DIF and DIT stage kernels
    (identical tiling, specs and scale-operand handling)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[-1]
    logn = n.bit_length() - 1
    b = x.shape[1]
    # ~10 live (rows, n) u32 planes per limb mid-mul; 2^16 elems/tile
    # blew the 16M scoped-vmem limit
    if b <= max(1, (1 << 15) // n):
        rows = b
    else:
        rows = max(8, (1 << 15) // n)
    b_pad = -(-b // rows) * rows
    if b_pad != b:
        pad = jnp.zeros((8, b_pad - b, n), jnp.uint32)
        x = jnp.concatenate([x, pad], axis=1)
        if scale is not None and scale.shape[1] == b:
            scale = jnp.concatenate([scale, pad], axis=1)

    data_spec = pl.BlockSpec((8, rows, n), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        data_spec,
        pl.BlockSpec((8, stw.shape[1], n // 2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tw_ext.shape[1], n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((masks.shape[0], n), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, stw, tw_ext, masks]
    if scale is not None:
        sb = scale.shape[1]
        if sb == b_pad:
            in_specs.append(data_spec)
        elif rows <= sb and sb % rows == 0 and b_pad % sb == 0:
            # scale repeats every `sb` rows: tile via the index map
            n_tiles = sb // rows
            in_specs.append(pl.BlockSpec(
                (8, rows, n), lambda i: (0, i % n_tiles, 0),
                memory_space=pltpu.VMEM))
        elif rows % sb == 0:
            scale = jnp.tile(scale, (1, rows // sb, 1))
            in_specs.append(pl.BlockSpec(
                (8, rows, n), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM))
        else:
            reps = (b_pad + sb - 1) // sb
            scale = jnp.tile(scale, (1, reps, 1))[:, :b_pad]
            in_specs.append(data_spec)
        args.append(scale)
    kern = functools.partial(kern_body, logn=logn, rows=rows,
                             has_scale=scale is not None)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, b_pad, n), jnp.uint32),
        grid=(b_pad // rows,),
        in_specs=in_specs,
        out_specs=data_spec,
        interpret=_interpret(),
    )(*args)
    return out[:, :b] if b_pad != b else out


def ntt_stages_dit(x: jnp.ndarray, stw: jnp.ndarray, tw_ext: jnp.ndarray,
                   masks: jnp.ndarray, scale: jnp.ndarray = None
                   ) -> jnp.ndarray:
    """All DIT butterfly stages fused: BIT-REVERSED input (in[p] =
    c[rev(p)]) -> natural-order transform output.

    x: (8, B, n) u32 red128 limbs.  stw: (8, S, n/2) sliced-stage twiddles
    (last S stages, largest blocks); tw_ext: (8, R, n) roll-stage twiddle
    table (own twiddle at lower positions, +half neighbour's at upper);
    masks: (R, n) u32, 1 on lower half-positions.  Tables from
    `ntt._dit_tables`.  `scale` (optional): elementwise pre-multiplier
    fused into the kernel (the four-step mid twiddle).
    Bit-exact vs ntt(take(x, bitrev))."""
    return _dif_dit_call(_ntt_stages_dit_kernel, x, stw, tw_ext, masks,
                         scale)


def ntt_stages(x: jnp.ndarray, tw_ext: jnp.ndarray,
               masks: jnp.ndarray) -> jnp.ndarray:
    """All log2(n) butterfly stages on bit-reversed input, fused.

    x: (8, B, n) u32 red128 limbs (any batch B; transform along last axis).
    tw_ext: (8, L, n) stage twiddles in natural position order (zero on
    upper half-positions); masks: (L, n) u32, 1 on lower half-positions.
    Returns (8, B, n) in natural order.  Bit-exact vs `ntt._apply_stages`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[-1]
    logn = n.bit_length() - 1
    b = x.shape[1]
    # Rows per grid step: Mosaic requires the block's second-to-last dim to
    # be a multiple of 8 (or the full axis), and the kernel keeps ~10 live
    # (rows, n) u32 planes per limb mid-mul — cap rows*n at 2^15 elements.
    if b <= max(1, (1 << 15) // n):
        rows = b                       # whole batch in one block
    else:
        rows = max(8, (1 << 15) // n)  # multiple of 8 by construction
    b_pad = -(-b // rows) * rows
    if b_pad != b:
        x = jnp.concatenate(
            [x, jnp.zeros((8, b_pad - b, n), jnp.uint32)], axis=1)

    kern = functools.partial(_ntt_stages_kernel, logn=logn, rows=rows)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, b_pad, n), jnp.uint32),
        grid=(b_pad // rows,),
        in_specs=[
            pl.BlockSpec((8, rows, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tw_ext.shape[1], n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((masks.shape[0], n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, rows, n), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x, tw_ext, masks)
    return out[:, :b] if b_pad != b else out
