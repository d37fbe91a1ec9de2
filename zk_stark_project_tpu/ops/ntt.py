"""Radix-2 NTT / iNTT / coset LDE over f128 — JAX, TPU-shaped.

This replaces the engine inside winterfell's `DefaultTraceLde`
(`src/training/prover.rs:273-281`): polynomial interpolation of trace
columns and blowup-16 coset low-degree extension (`src/main.rs:98-107`
options), plus the FRI fold's half-size transforms.

Design notes (TPU-first):
  * Stage loop with fully-vectorized butterflies: each of the log2(n) stages
    is ONE field mul + add + sub over n/2 lanes (reshape views, no gathers),
    so the compiled graph is tiny and the work is pure VPU throughput.
  * Twiddle tables are built on device by repeated doubling (log2(n) muls),
    cached per (log2n, inverse); stage twiddles are strided views.
  * Transforms are batched over leading axes: values shape (8, C, n)
    transforms each of C columns independently — the multi-column trace LDE
    is one call.
  * Natural order in, natural order out (bit-reverse permutation applied on
    input, host-precomputed index table).

Bit-exact vs `f128_ref.ntt`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import f128
from . import f128_ref as ref

P = ref.P


@functools.lru_cache(maxsize=None)
def _bitrev_np(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _root_int(logn: int, inverse: bool) -> int:
    w = ref.root_of_unity(logn)
    return ref.inv(w) if inverse else w


@functools.lru_cache(maxsize=None)
def _twiddles(logn: int, inverse: bool) -> jnp.ndarray:
    """Powers w^0..w^(n/2-1) of the size-n root, shape (8, n/2), on device.

    Built under `ensure_compile_time_eval` so the cached table is a concrete
    array even when the first call happens inside another jit trace (an
    lru-cached tracer would escape its trace and poison later calls)."""
    n = 1 << logn
    if n == 1:
        return f128.ones((1,))
    w = _root_int(logn, inverse)

    with jax.ensure_compile_time_eval():
        powers = f128.ones((1,))
        step = f128.from_int(w)  # w^(2^0)
        cur = 1
        while cur < n // 2:
            # powers: w^0..w^(cur-1); append w^cur * powers
            # (table building always uses the jnp mul: pallas kernels may
            # not be traced under compile-time eval)
            scale = f128._mul_jnp(powers[:, cur - 1:cur], step)
            powers = jnp.concatenate(
                [powers, f128._mul_jnp(powers, scale)], axis=1)
            cur *= 2
        if powers.shape[1] > n // 2:
            powers = powers[:, : n // 2]
        # cache HOST numpy: a cached device array would be pinned to the
        # mesh/devices of whatever trace first built it and poison reuse
        # under a different mesh (shard_map Manual-mesh aval mismatch)
        return np.asarray(jax.block_until_ready(powers))


@functools.lru_cache(maxsize=None)
def _n_inv_limbs(logn: int) -> jnp.ndarray:
    return np.asarray(ref.to_limbs(ref.inv(1 << logn)), dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def _stage_tables(logn: int, inverse: bool):
    """Natural-position stage twiddles + lower-half masks for the fused
    Pallas NTT kernel: tw_ext[s-1, i] = w_m^(i mod m) on lower
    half-positions (m = 2^s), 0 elsewhere; masks[s-1, i] = 1 iff lower.
    Host numpy (concrete regardless of enclosing traces)."""
    n = 1 << logn
    tw_full = np.asarray(_twiddles(logn, inverse))        # (8, n/2)
    tw_ext = np.zeros((8, logn, n), dtype=np.uint32)
    masks = np.zeros((logn, n), dtype=np.uint32)
    idx = np.arange(n)
    for s in range(1, logn + 1):
        m = 1 << s
        j = idx % m
        lower = j < (m >> 1)
        src = np.minimum(j * (n // m), n // 2 - 1)
        tw_ext[:, s - 1, :] = np.where(lower[None, :], tw_full[:, src], 0)
        masks[s - 1] = lower.astype(np.uint32)
    return tw_ext, masks


def _apply_stages(a: jnp.ndarray, logn: int, inverse: bool) -> jnp.ndarray:
    """Cooley-Tukey DIT stages on bit-reversed input.  a: (8, ..., n)."""
    n = 1 << logn
    from . import f128_pallas as fp

    batch = int(np.prod(a.shape[1:-1])) if a.ndim > 2 else 1
    if f128.use_pallas() and fp.ntt_supported(logn, batch):
        tw_ext, masks = _stage_tables(logn, inverse)
        flat = a.reshape((8, -1, n))
        out = fp.ntt_stages(flat, jnp.asarray(tw_ext), jnp.asarray(masks))
        return out.reshape(a.shape)

    tw_full = _twiddles(logn, inverse)  # (8, n/2) powers of w_n
    batch = a.shape[1:-1]
    for s in range(1, logn + 1):
        m = 1 << s
        half = m // 2
        # stage twiddles: w_m^k = w_n^(k * n/m), k in [0, half)
        tw = tw_full[:, :: n // m][:, :half]  # (8, half)
        v = a.reshape((8,) + batch + (n // m, m))
        u = v[..., :half]
        t = f128.mul(v[..., half:], tw.reshape((8,) + (1,) * len(batch) + (1, half)))
        a = jnp.concatenate([f128.add(u, t), f128.sub(u, t)], axis=-1)
        a = a.reshape((8,) + batch + (n,))
    return a


@functools.lru_cache(maxsize=None)
def _dif_tables(logn: int, inverse: bool):
    """Twiddle tables for the fused DIF kernel (`f128_pallas.ntt_stages_dif`).

    Returns (stw, tw_ext, masks) host numpy:
      * stw (8, S, n/2): sliced-stage tables, stage s (1-based, block size
        m = n >> (s-1)) at [:, s-1, :m/2] holding w_m^0..w_m^(m/2-1);
      * tw_ext (8, R, n): roll-stage twiddles in natural position order —
        at roll index r (stage s = S+1+r), position j holds
        w_m^(j mod m - m/2) on upper half-positions and w_m^(j mod m) on
        lower ones.  The lower values are what position j+m/2 needs: the
        kernel's packed roll stages rotate the second row-half's
        butterfly differences down by m/2 and share ONE half-volume mul
        between two row groups (`f128_pallas._ntt_stages_dif_kernel`);
        the unpacked fallback never reads `t` at lower positions (the
        final `where` discards them), so one table serves both paths;
      * masks (R, n): 1 on lower half-positions.
    """
    from . import f128_pallas as fp

    n = 1 << logn
    tw_full = np.asarray(_twiddles(logn, inverse))        # (8, n/2)
    n_sliced = fp._dif_n_sliced(logn)
    stw = np.zeros((8, max(n_sliced, 1), n // 2), np.uint32)
    for s in range(1, n_sliced + 1):
        half = n >> s                                     # m/2
        idx = np.arange(half) << (s - 1)                  # w_m^i = w_n^(i*2^(s-1))
        stw[:, s - 1, :half] = tw_full[:, idx]
    n_roll = max(0, logn - 1 - n_sliced)
    tw_ext = np.zeros((8, max(n_roll, 1), n), np.uint32)
    masks = np.zeros((max(n_roll, 1), n), np.uint32)
    pos = np.arange(n)
    for r in range(n_roll):
        s = n_sliced + 1 + r
        m = n >> (s - 1)
        half = m >> 1
        j = pos % m
        upper = j >= half
        exp = np.where(upper, j - half, j)       # w_m^(j mod m [- m/2])
        src = exp << (s - 1)
        tw_ext[:, r, :] = tw_full[:, src]
        masks[r] = (~upper).astype(np.uint32)
    return stw, tw_ext, masks


@functools.lru_cache(maxsize=None)
def _dit_tables(logn: int, inverse: bool):
    """Twiddle tables for the fused DIT kernel (`f128_pallas.ntt_stages_dit`)
    — the execution mirror of `_dif_tables`.  Stage s has block size
    m = 2^s (ascending): stage 1 is mul-free, stages 2..logn-S run the
    roll formulation, the last S = `_dif_n_sliced` stages are sliced.

    Returns (stw, tw_ext, masks):
      * stw (8, S, n/2): sliced-stage tables, sliced index q (stage
        s = logn-S+1+q, m = 2^s) at [:, q, :m/2] holding w_m^0..;
      * tw_ext (8, R, n): roll-stage twiddles, roll index r (stage
        s = r+2): position j holds w_m^(j mod m) on lower half-positions
        and w_m^(j mod m - m/2) on upper (the packed-mul neighbour);
      * masks (R, n): 1 on lower half-positions.
    """
    from . import f128_pallas as fp

    n = 1 << logn
    tw_full = np.asarray(_twiddles(logn, inverse))        # (8, n/2)
    n_sliced = fp._dif_n_sliced(logn)
    stw = np.zeros((8, max(n_sliced, 1), n // 2), np.uint32)
    for q in range(n_sliced):
        s = logn - n_sliced + 1 + q
        m = 1 << s
        half = m >> 1
        idx = np.arange(half) << (logn - s)               # w_m^i
        stw[:, q, :half] = tw_full[:, idx]
    n_roll = max(0, logn - 1 - n_sliced)
    tw_ext = np.zeros((8, max(n_roll, 1), n), np.uint32)
    masks = np.zeros((max(n_roll, 1), n), np.uint32)
    pos = np.arange(n)
    for r in range(n_roll):
        s = r + 2
        m = 1 << s
        half = m >> 1
        j = pos % m
        upper = j >= half
        exp = np.where(upper, j - half, j) << (logn - s)
        tw_ext[:, r, :] = tw_full[:, exp]
        masks[r] = (~upper).astype(np.uint32)
    return stw, tw_ext, masks


def _dit(values: jnp.ndarray, logn: int, inverse: bool,
         scale: jnp.ndarray = None) -> jnp.ndarray:
    """DIT transform along the last axis: BIT-REVERSED input (in[p] =
    c[rev(p)]) -> natural-order output, no 1/n scaling.  Pallas kernel
    when supported, else the jnp mirror (scale + DIT stage loop).

    `scale` (optional): (8, R, n) elementwise pre-multiplier where the
    flattened batch repeats every R rows — fused into the kernel (the
    four-step mid twiddle)."""
    from . import f128_pallas as fp

    n = 1 << logn
    batch = int(np.prod(values.shape[1:-1])) if values.ndim > 2 else 1
    if f128.use_pallas() and fp.ntt_supported(logn, batch):
        stw, tw_ext, masks = _dit_tables(logn, inverse)
        flat = values.reshape((8, -1, n))
        out = fp.ntt_stages_dit(flat, jnp.asarray(stw), jnp.asarray(tw_ext),
                                jnp.asarray(masks), scale=scale)
        return out.reshape(values.shape)
    if scale is not None:
        flat = values.reshape((8, -1, n))
        reps = flat.shape[1] // scale.shape[1]
        values = f128.mul(flat, jnp.tile(scale, (1, reps, 1))
                          ).reshape(values.shape)
    return _apply_stages(values, logn, inverse)


def _dif(values: jnp.ndarray, logn: int, inverse: bool,
         scale: jnp.ndarray = None) -> jnp.ndarray:
    """DIF transform along the last axis: natural input -> BIT-REVERSED
    output (out[p] = X[rev(p)]), no 1/n scaling.  Pallas kernel when
    supported, else the jnp mirror (gather + DIT stages + gather).

    `scale` (optional): (8, R, n) elementwise pre-multiplier where the
    flattened batch repeats every R rows — fused into the kernel (the
    four-step mid twiddle), multiplied explicitly on the mirror path."""
    from . import f128_pallas as fp

    n = 1 << logn
    batch = int(np.prod(values.shape[1:-1])) if values.ndim > 2 else 1
    if f128.use_pallas() and fp.ntt_supported(logn, batch):
        stw, tw_ext, masks = _dif_tables(logn, inverse)
        flat = values.reshape((8, -1, n))
        out = fp.ntt_stages_dif(flat, jnp.asarray(stw), jnp.asarray(tw_ext),
                                jnp.asarray(masks), scale=scale)
        return out.reshape(values.shape)
    if scale is not None:
        flat = values.reshape((8, -1, n))
        reps = flat.shape[1] // scale.shape[1]
        values = f128.mul(flat, jnp.tile(scale, (1, reps, 1))
                          ).reshape(values.shape)
    rev = jnp.asarray(_bitrev_np(logn))
    a = jnp.take(values, rev, axis=-1)
    a = _apply_stages(a, logn, inverse)
    return jnp.take(a, rev, axis=-1)




def _four_step(values: jnp.ndarray, logn: int, inverse: bool) -> jnp.ndarray:
    """Four-step (transpose) NTT for transforms beyond the fused-kernel
    VMEM cap, built on DIF inner transforms so NO per-transform bit-reverse
    gathers are paid: with a[j1, j2] (j = j1*n2 + j2) and k = k1 + n1*k2,

        B[j2, rev(k1)]          = DIF over j1
        C = B * w^(j2*k1)         (table columns pre-permuted by rev(k1))
        D[rev(k1), rev(k2)]     = DIF over j2
        A[k]                    = D via ONE final unscramble gather

    The mid twiddle table w^(j2*k1) is built on device by repeated
    doubling.  Same index math as `parallel/dntt.py`, single-chip."""
    n = 1 << logn
    l1 = min(logn - logn // 2, 12)
    l2 = logn - l1
    n1, n2 = 1 << l1, 1 << l2
    batch = values.shape[:-1]
    v = values.reshape(batch + (n1, n2))
    v = jnp.swapaxes(v, -1, -2)                      # (..., n2, j1)
    v = _dif(v, l1, inverse)                         # B[j2, rev(k1)]
    v = jnp.swapaxes(v, -1, -2)                      # (..., rev(k1), j2)
    # mid twiddle w^(j2*k1), built directly in pass-2 orientation —
    # Tt[i, j2] = w^(j2 * rev(k1=i)): row i is the geometric sequence of
    # ratio w^rev(i) — and FUSED into the pass-2 kernel as its input
    # scale, so the multiply costs no separate HBM pass.  (An outer-
    # product build from two pre-permuted small factors was tried and
    # measured slower on the chained harness.)
    from ..prover import poly as _poly
    base = jnp.take(jnp.asarray(
        _offset_powers(l1, _root_int(logn, inverse), False)),  # (8, n1) w^m
        jnp.asarray(_bitrev_np(l1).astype(np.int32)), axis=-1)
    tw_t = _poly.powers_of_b(base, n2)               # (8, n1, n2)
    v = _dif(v, l2, inverse, scale=tw_t)             # D[rev(k1), rev(k2)]
    # final unscramble to natural k = k1 + n1*k2 as STRUCTURED moves (a
    # single flat (n,) gather has pathological locality — measured 3x
    # slower at 2^24): un-reverse each axis, then transpose k2-major.
    v = jnp.take(v, jnp.asarray(_bitrev_np(l1).astype(np.int32)), axis=-2)
    v = jnp.take(v, jnp.asarray(_bitrev_np(l2).astype(np.int32)), axis=-1)
    out = jnp.swapaxes(v, -1, -2).reshape(batch + (n,))
    if inverse:
        out = f128.mul(out, jnp.broadcast_to(
            _n_inv_limbs(logn).reshape((8,) + (1,) * (out.ndim - 1)),
            out.shape))
    return out


def _four_step_split(logn: int):
    l1 = min(logn - logn // 2, 12)
    return l1, logn - l1


def _four_step_bitrev(values: jnp.ndarray, logn: int,
                      inverse: bool) -> jnp.ndarray:
    """Four-step NTT, natural input -> GLOBAL-BIT-REVERSED output, with
    ZERO permutation passes: the DIF inner transforms leave the grid as
    D[rev(k1), rev(k2)] (k = k1 + n1*k2), whose flat index
    rev_l1(k1)*n2 + rev_l2(k2) IS rev_n(k) — so dropping `_four_step`'s
    final two un-reverse gathers + transpose yields the bitrev layout
    for free.  The 1/n scaling for inverse transforms is elementwise
    (order-independent)."""
    n = 1 << logn
    l1, l2 = _four_step_split(logn)
    n1, n2 = 1 << l1, 1 << l2
    batch = values.shape[:-1]
    v = values.reshape(batch + (n1, n2))
    v = jnp.swapaxes(v, -1, -2)                      # (..., n2, j1)
    v = _dif(v, l1, inverse)                         # B[j2, rev(k1)]
    v = jnp.swapaxes(v, -1, -2)                      # (..., rev(k1), j2)
    from ..prover import poly as _poly
    base = jnp.take(jnp.asarray(
        _offset_powers(l1, _root_int(logn, inverse), False)),
        jnp.asarray(_bitrev_np(l1).astype(np.int32)), axis=-1)
    tw_t = _poly.powers_of_b(base, n2)               # (8, n1, n2)
    v = _dif(v, l2, inverse, scale=tw_t)             # D[rev(k1), rev(k2)]
    return v.reshape(batch + (n,))


def _four_step_from_bitrev(values: jnp.ndarray, logn: int,
                           inverse: bool) -> jnp.ndarray:
    """Four-step NTT of coefficients stored in GLOBAL-BIT-REVERSED order
    -> natural-order output, zero permutation passes (the dual of
    `_four_step_bitrev`).

    With storage grid S[r1, r2] (r1 = rev_l1(k1), r2 = rev_l2(k2),
    k = k1 + n1*k2) and output index j = jA*n2 + jB:

        T[r1, jB]  = DIT over axis -1          (rev(k2)-ordered input)
        U          = T * w^(jB * rev(r1))        (fused into pass 2)
        V[jB, jA]  = DIT over r1 after one transpose
        A[j]       = V via one transpose + reshape
    """
    n = 1 << logn
    l1, l2 = _four_step_split(logn)
    n1, n2 = 1 << l1, 1 << l2
    batch = values.shape[:-1]
    v = values.reshape(batch + (n1, n2))             # S[r1, r2]
    v = _dit(v, l2, inverse)                         # T[r1, jB]
    v = jnp.swapaxes(v, -1, -2)                      # (..., jB, r1)
    from ..prover import poly as _poly
    # mid twiddle in pass-2 orientation: M[jB, r1] = w^(jB * rev(r1)) —
    # bitrev-ordered powers of w^jB per row, built by level doubling
    base = jnp.asarray(_offset_powers(l2, _root_int(logn, inverse),
                                      False))       # (8, n2): w^jB
    tw_t = _poly.powers_of_b_bitrev(base, n1)        # (8, n2, n1)
    v = _dit(v, l1, inverse, scale=tw_t)             # V[jB, jA]
    v = jnp.swapaxes(v, -1, -2)                      # (..., jA, jB)
    return v.reshape(batch + (n,))


def _scale_n_inv(a: jnp.ndarray, logn: int) -> jnp.ndarray:
    return f128.mul(a, jnp.broadcast_to(
        _n_inv_limbs(logn).reshape((8,) + (1,) * (a.ndim - 1)), a.shape))


@functools.partial(jax.jit, static_argnums=(1,))
def ntt_bitrev(values: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """NTT/iNTT of natural-order input with BIT-REVERSED output
    (out[p] = X[rev(p)]) — no unscramble pass at any size.  The prover's
    internal coefficient convention: an iNTT -> coset-NTT round trip via
    `ntt_from_bitrev` pays zero data permutations."""
    n = values.shape[-1]
    logn = n.bit_length() - 1
    assert 1 << logn == n, "NTT size must be a power of two"
    if n == 1:
        return values
    from . import f128_pallas as fp

    batch = int(np.prod(values.shape[1:-1])) if values.ndim > 2 else 1
    if (f128.use_pallas() and logn > fp.NTT_MAX_LOG2
            and not fp.ntt_supported(logn, batch)):
        out = _four_step_bitrev(values, logn, inverse)
    elif f128.use_pallas() and fp.ntt_supported(logn, batch):
        out = _dif(values, logn, inverse)
    else:
        rev = jnp.asarray(_bitrev_np(logn))
        out = jnp.take(_apply_stages(jnp.take(values, rev, axis=-1),
                                     logn, inverse), rev, axis=-1)
    return _scale_n_inv(out, logn) if inverse else out


@functools.partial(jax.jit, static_argnums=(1,))
def ntt_from_bitrev(values: jnp.ndarray,
                    inverse: bool = False) -> jnp.ndarray:
    """NTT/iNTT of BIT-REVERSED-order input (in[p] = c[rev(p)]) with
    natural-order output — no unscramble pass at any size."""
    n = values.shape[-1]
    logn = n.bit_length() - 1
    assert 1 << logn == n, "NTT size must be a power of two"
    if n == 1:
        return values
    from . import f128_pallas as fp

    batch = int(np.prod(values.shape[1:-1])) if values.ndim > 2 else 1
    if (f128.use_pallas() and logn > fp.NTT_MAX_LOG2
            and not fp.ntt_supported(logn, batch)):
        out = _four_step_from_bitrev(values, logn, inverse)
    elif f128.use_pallas() and fp.ntt_supported(logn, batch):
        out = _dit(values, logn, inverse)
    else:
        # bit-reversed input is exactly what the DIT stage loop wants
        out = _apply_stages(values, logn, inverse)
    return _scale_n_inv(out, logn) if inverse else out


@functools.partial(jax.jit, static_argnums=(1,))
def ntt(values: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order NTT/iNTT over the size-n subgroup.  values: (8, ..., n)."""
    n = values.shape[-1]
    logn = n.bit_length() - 1
    assert 1 << logn == n, "NTT size must be a power of two"
    if n == 1:
        return values
    from . import f128_pallas as fp

    batch = int(np.prod(values.shape[1:-1])) if values.ndim > 2 else 1
    if (f128.use_pallas() and logn > fp.NTT_MAX_LOG2
            and not fp.ntt_supported(logn, batch)):
        return _four_step(values, logn, inverse)
    rev = jnp.asarray(_bitrev_np(logn))
    if f128.use_pallas() and fp.ntt_supported(logn, batch):
        # DIF kernel + output un-reverse: same single gather as the DIT
        # path's input bit-reverse, but the DIF kernel does half-width
        # muls on its sliced stages and a mul-free last stage (~26%
        # faster at 2^10, measured v5e).
        a = jnp.take(_dif(values, logn, inverse), rev, axis=-1)
    else:
        a = _apply_stages(jnp.take(values, rev, axis=-1), logn, inverse)
    if inverse:
        a = f128.mul(a, jnp.broadcast_to(
            _n_inv_limbs(logn).reshape((8,) + (1,) * (a.ndim - 1)), a.shape))
    return a


def interpolate(evals: jnp.ndarray) -> jnp.ndarray:
    """Evaluations over the size-n subgroup (natural order) -> coefficients."""
    return ntt(evals, inverse=True)


@functools.lru_cache(maxsize=None)
def _offset_powers(log2_n: int, offset: int, inverse: bool,
                   bitrev: bool = False) -> jnp.ndarray:
    """offset^0..offset^(n-1) (or inverse offset), shape (8, n); with
    `bitrev`, out[:, p] = offset^rev(p) (bit b of the index contributes
    exponent 2^(log2_n-1-b) — same doubling cost).  Concrete even under
    an enclosing trace (see `_twiddles`)."""
    n = 1 << log2_n
    o = ref.inv(offset) if inverse else (offset % P)

    with jax.ensure_compile_time_eval():
        powers = f128.ones((1,))
        for lev in range(log2_n):
            e = (1 << (log2_n - 1 - lev)) if bitrev else (1 << lev)
            scale = f128.from_int(pow(o, e, P))
            powers = jnp.concatenate(
                [powers, f128._mul_jnp(powers, scale)], axis=1)
        return np.asarray(jax.block_until_ready(powers[:, :n]))


#: above this domain size, offset-power tables are built IN-GRAPH (a
#: (8, 2^24) host table embedded as an HLO constant is 512 MB — it blows
#: the remote-compile request limit and bloats every executable; the
#: doubling build costs ~n muls, one extra NTT stage)
_TABLE_CONST_MAX_LOG2 = 18


def _offset_powers_traced(log2_n: int, offset: int, inverse: bool,
                          bitrev: bool = False) -> jnp.ndarray:
    """(8, n) table of offset^0..offset^(n-1) (offset^rev(i) with
    `bitrev`) built inside the current trace by repeated doubling — only
    log2_n small (8, 1) constants enter the graph, so big-domain
    executables stay compile-service-sized."""
    n = 1 << log2_n
    o = ref.inv(offset) if inverse else (offset % P)
    powers = f128.ones((1,))
    for k in range(log2_n):
        e = (1 << (log2_n - 1 - k)) if bitrev else (1 << k)
        scale = f128.from_ints([pow(o, e, P)])       # tiny (8, 1) constant
        powers = jnp.concatenate(
            [powers, f128.mul(powers, scale)], axis=1)
    return powers[:, :n]


def offset_powers_any(log2_n: int, offset: int, inverse: bool,
                      bitrev: bool = False) -> jnp.ndarray:
    """Offset-power table, constant for small domains, in-graph for big."""
    if log2_n <= _TABLE_CONST_MAX_LOG2:
        return jnp.asarray(_offset_powers(log2_n, offset, inverse, bitrev))
    return _offset_powers_traced(log2_n, offset, inverse, bitrev)


@functools.partial(jax.jit, static_argnums=(1, 2))
def coset_evaluate(coeffs: jnp.ndarray, offset: int, blowup: int = 1) -> jnp.ndarray:
    """Evaluate polys over the coset offset*<w_N> with N = blowup * n.

    coeffs: (8, ..., n).  Returns (8, ..., N) evaluations in natural domain
    order (domain element i = offset * w_N^i).  This is the trace LDE
    (blowup 16 in the reference's options, `src/main.rs:98-107`).
    """
    n = coeffs.shape[-1]
    N = n * blowup
    if blowup > 1:
        pad = jnp.zeros(coeffs.shape[:-1] + (N - n,), dtype=jnp.uint32)
        coeffs = jnp.concatenate([coeffs, pad], axis=-1)
    logN = N.bit_length() - 1
    po = offset_powers_any(logN, offset, False)  # (8, N)
    scaled = f128.mul(coeffs, po.reshape((8,) + (1,) * (coeffs.ndim - 2) + (N,)))
    return ntt(scaled)


@functools.partial(jax.jit, static_argnums=(1,))
def coset_interpolate(evals: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Inverse of coset_evaluate at blowup 1: evals over offset*<w_n> ->
    coefficients."""
    n = evals.shape[-1]
    logn = n.bit_length() - 1
    coeffs = ntt(evals, inverse=True)
    po_inv = offset_powers_any(logn, offset, True)
    return f128.mul(coeffs, po_inv.reshape((8,) + (1,) * (coeffs.ndim - 2) + (n,)))


@functools.partial(jax.jit, static_argnums=(1,))
def interpolate_bitrev(evals: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
    """Evaluations over offset*<w_n> (natural domain order) ->
    coefficients in BIT-REVERSED storage order (out[p] = c[rev(p)]) —
    zero permutation passes.  offset=1 is the plain trace-subgroup
    interpolation; otherwise the offset un-scaling multiplies by a
    bitrev-ordered inverse-power table (elementwise, no gather)."""
    n = evals.shape[-1]
    logn = n.bit_length() - 1
    coeffs = ntt_bitrev(evals, inverse=True)
    if offset == 1:
        return coeffs
    po_inv = offset_powers_any(logn, offset, True, bitrev=True)
    return f128.mul(coeffs, po_inv.reshape(
        (8,) + (1,) * (coeffs.ndim - 2) + (n,)))


@functools.partial(jax.jit, static_argnums=(1, 2))
def coset_evaluate_from_bitrev(coeffs_br: jnp.ndarray, offset: int,
                               blowup: int = 1) -> jnp.ndarray:
    """Evaluate polys stored in BIT-REVERSED coefficient order over the
    coset offset*<w_N> (N = blowup*n), natural domain order out.

    Degree-raising zero-pad in bitrev storage is interleaved stuffing,
    not a concat: coefficient k < n sits at rev_N(k) = blowup*rev_n(k),
    so out[p] = c_br[p/blowup] iff blowup | p — ONE lax.pad with
    interior padding (an (..., n, blowup) expand-and-reshape materializes
    a lane-padded temp: 4 GB at 2^20/blowup-16, OOM'd the DEEP phase).
    The offset scale uses a bitrev-ordered power table."""
    n = coeffs_br.shape[-1]
    N = n * blowup
    if blowup > 1:
        cfg = [(0, 0, 0)] * (coeffs_br.ndim - 1) + [(0, blowup - 1,
                                                     blowup - 1)]
        coeffs_br = jax.lax.pad(coeffs_br, jnp.uint32(0), cfg)
    logN = N.bit_length() - 1
    po = offset_powers_any(logN, offset, False, bitrev=True)
    scaled = f128.mul(coeffs_br, po.reshape(
        (8,) + (1,) * (coeffs_br.ndim - 2) + (N,)))
    return ntt_from_bitrev(scaled)


# ---------------------------------------------------------------------------
# Host-side domain helpers
# ---------------------------------------------------------------------------


def domain_points(log2_n: int, offset: int = 1) -> np.ndarray:
    """Python-int ndarray of the domain offset * <w_n> in natural order."""
    n = 1 << log2_n
    w = ref.root_of_unity(log2_n)
    out = np.zeros(n, dtype=object)
    cur = offset % P
    for i in range(n):
        out[i] = cur
        cur = (cur * w) % P
    return out
