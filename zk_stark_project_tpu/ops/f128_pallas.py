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


# ---------------------------------------------------------------------------
# pallas_call wrappers: flatten batch -> (8, M, 128), tile the row axis
# ---------------------------------------------------------------------------


def _call_elementwise(kernel, arity, *arrays):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = jnp.broadcast_shapes(*(a.shape[1:] for a in arrays))
    arrays = [jnp.broadcast_to(a, (8,) + shape) for a in arrays]
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
