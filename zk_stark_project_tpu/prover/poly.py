"""Polynomial helpers on device: power tables and single-point evaluation.

Used for out-of-domain (DEEP) evaluation of trace/composition polynomials at
the Fiat–Shamir point z — the step winterfell does inside its prover channel
after the constraint commitment.  Evaluation is a dot product against a
powers-of-z table built by repeated doubling (log n field muls), with a
log-depth pairwise reduction for the sum (TPUs want trees, not scans).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import f128


@functools.partial(jax.jit, static_argnums=(1,))
def powers_of(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[x^0, x^1, ..., x^(n-1)] for a traced element x: (8,) -> (8, n).

    n must be a power of two (doubling construction).
    """
    assert n & (n - 1) == 0
    powers = f128.ones((1,))
    step = x.reshape(8, 1)
    cur = 1
    while cur < n:
        # powers holds x^0..x^(cur-1); step == x^cur (as (8,1))
        powers = jnp.concatenate([powers, f128.mul(powers, step)], axis=1)
        step = f128.mul(step, step)
        cur *= 2
    return powers


def tree_sum(values: jnp.ndarray) -> jnp.ndarray:
    """Field sum along the last axis via log-depth pairwise adds.

    values: (8, ..., D) with D a power of two -> (8, ...).
    """
    d = values.shape[-1]
    assert d & (d - 1) == 0
    while d > 1:
        v = values.reshape(values.shape[:-1] + (d // 2, 2))
        values = f128.add(v[..., 0], v[..., 1])
        d //= 2
    return values[..., 0]


@jax.jit
def eval_at(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomials at one traced point.

    coeffs: (8, ..., n) (n a power of two); x: (8,).  Returns (8, ...).
    """
    n = coeffs.shape[-1]
    pows = powers_of(x, n)  # (8, n)
    pows = pows.reshape((8,) + (1,) * (coeffs.ndim - 2) + (n,))
    return tree_sum(f128.mul(coeffs, pows))


def tree_sum_axis1(values: jnp.ndarray) -> jnp.ndarray:
    """Field sum along axis 1 (any K — zero-padded to a power of two),
    log-depth pairwise adds."""
    k = values.shape[1]
    kp = 1 << max(0, (k - 1)).bit_length()
    if kp != k:
        pad = jnp.zeros((8, kp - k) + values.shape[2:], dtype=jnp.uint32)
        values = jnp.concatenate([values, pad], axis=1)
    while kp > 1:
        v = values.reshape((8, kp // 2, 2) + values.shape[2:])
        values = f128.add(v[:, :, 0], v[:, :, 1])
        kp //= 2
    return values[:, 0]


@jax.jit
def combine(values: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Random linear combination along axis 1: sum_k coeffs[k] * values[:,k].

    values: (8, K, ...); coeffs: (8, K).  Returns (8, ...).

    ONE batched field mul + a log-depth reduction: K-step accumulation chains
    compile pathologically on XLA (the graph holds K inlined limb-muls) and
    serialize on the VPU; this shape is both the fast and the compilable one.
    """
    k = values.shape[1]
    prod = f128.mul(values,
                    coeffs.reshape((8, k) + (1,) * (values.ndim - 2)))
    return tree_sum_axis1(prod)


# ---------------------------------------------------------------------------
# Batched (multi-proof) variants: a client axis C sits between the limb axis
# and the data axes; every op broadcasts over it (prover/batch.py).
# ---------------------------------------------------------------------------


def tree_sum_axis(values: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Field sum along `axis` (any K — zero-padded to a power of two),
    log-depth pairwise adds.  axis must be positive and not 0 (the limb
    axis)."""
    assert axis > 0
    k = values.shape[axis]
    kp = 1 << max(0, (k - 1)).bit_length()
    if kp != k:
        pad_shape = list(values.shape)
        pad_shape[axis] = kp - k
        values = jnp.concatenate(
            [values, jnp.zeros(pad_shape, dtype=jnp.uint32)], axis=axis)
    while kp > 1:
        shape = (values.shape[:axis] + (kp // 2, 2) + values.shape[axis + 1:])
        v = values.reshape(shape)
        idx_a = (slice(None),) * axis + (slice(None), 0)
        idx_b = (slice(None),) * axis + (slice(None), 1)
        values = f128.add(v[idx_a], v[idx_b])
        kp //= 2
    return jnp.squeeze(values, axis=axis)


@functools.partial(jax.jit, static_argnums=(2,))
def combine_axis(values: jnp.ndarray, coeffs: jnp.ndarray,
                 axis: int) -> jnp.ndarray:
    """Random linear combination along `axis`: values (8, ..., K, ...) with
    K at `axis`; coeffs (8, ..., K) matching values' shape up to `axis`.
    Returns values with `axis` summed out."""
    k = values.shape[axis]
    assert coeffs.shape[-1] == k and coeffs.ndim == axis + 1
    prod = f128.mul(values,
                    coeffs.reshape(coeffs.shape +
                                   (1,) * (values.ndim - coeffs.ndim)))
    return tree_sum_axis(prod, axis)


@functools.partial(jax.jit, static_argnums=(1,))
def powers_of_b(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Batched power table: x (8,) + B -> (8,) + B + (n,) of x^0..x^(n-1).

    Same doubling construction as `powers_of`, elementwise over the batch.
    """
    assert n & (n - 1) == 0
    powers = f128.ones(x.shape[1:] + (1,))
    step = x[..., None]
    cur = 1
    while cur < n:
        powers = jnp.concatenate([powers, f128.mul(powers, step)], axis=-1)
        step = f128.mul(step, step)
        cur *= 2
    return powers


def powers_of_b_bitrev(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Batched BIT-REVERSED power table: x (8,) + B -> (8,) + B + (n,)
    with out[..., p] = x^rev_log2n(p).

    Same doubling as `powers_of_b` with the level weights reversed: bit
    b of p contributes exponent 2^(L-1-b) instead of 2^b, so each
    doubling level multiplies by x^(2^(L-1-level)) — equally cheap, and
    it lets bit-reversed-convention NTT pipelines build their scale
    tables without any gather."""
    assert n & (n - 1) == 0
    logn = n.bit_length() - 1
    powers = f128.ones(x.shape[1:] + (1,))
    for lev in range(logn):
        step = x[..., None]
        for _ in range(logn - 1 - lev):
            step = f128.mul(step, step)          # x^(2^(L-1-lev))
        powers = jnp.concatenate([powers, f128.mul(powers, step)], axis=-1)
    return powers


@jax.jit
def eval_at_b(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched single-point evaluation: coeffs (8, C, ..., n); x (8, C).
    Returns (8, C, ...)."""
    n = coeffs.shape[-1]
    pows = powers_of_b(x, n)  # (8, C, n)
    shape = pows.shape[:2] + (1,) * (coeffs.ndim - 3) + (n,)
    return tree_sum(f128.mul(coeffs, pows.reshape(shape)))


@jax.jit
def eval_at_b_bitrev(coeffs_br: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """`eval_at_b` for coefficients stored in BIT-REVERSED order: the
    power table is built bitrev-ordered, the sum is order-free."""
    n = coeffs_br.shape[-1]
    pows = powers_of_b_bitrev(x, n)  # (8, C, n)
    shape = pows.shape[:2] + (1,) * (coeffs_br.ndim - 3) + (n,)
    return tree_sum(f128.mul(coeffs_br, pows.reshape(shape)))
