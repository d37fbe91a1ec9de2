"""Signed fixed-point (value, sign) arithmetic over f128 — JAX, branch-free.

Exact port of the reference's algebra (`src/signed.rs:11-48`): every number is
a pair (v, s) with s in {0, 1}; negative x is encoded as MAX - |x| + 1 where
MAX = u128::MAX **reduced into the field** (NOT p-1 — see `src/signed.rs:3`,
`src/helper.rs:16`; u128::MAX mod p = 45*2^40 - 2).  The reference semantics
(reduce-then-use) are replicated exactly, quirks included (SURVEY.md pin #1).

  cleanse(v, s)   = (1-s)*v + s*(MAX - v + 1)
  add((a,sa),(b,sb)): ind = sa*sb; ind ? (MAX+1 - a_c - b_c) : (a+b); sign=ind
  mul: prod = a_c*b_c; sign = sa XOR sb (algebraically); sign ? MAX-prod+1 : prod
  div: same with field inverse of b_c (`src/signed.rs:42-48`)

All formulas are polynomial in the inputs so the same code evaluates
concretely in trace building and symbolically in AIR constraint evaluation
(the reference's generic-over-FieldElement trick, `src/signed.rs:17-48`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import f128
from . import f128_ref as ref

#: MAX = u128::MAX as a field element (canonical): 45*2^40 - 2.
MAX_INT = ref.U128_MAX_REDUCED
#: MAX + 1 (mod p) = 45*2^40 - 1.
MAX_P1_INT = (MAX_INT + 1) % ref.P

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _c(x: int, shape):
    return f128.full(shape, x)


def cleanse(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """(1-s)*v + s*(MAX - v + 1)  (`src/signed.rs:11-14`)."""
    shape = v.shape[1:]
    one = f128.ones(shape)
    max_e = _c(MAX_INT, shape)
    t1 = f128.mul(f128.sub(one, s), v)
    t2 = f128.mul(s, f128.add(f128.sub(max_e, v), one))
    return f128.add(t1, t2)


def add(a: jnp.ndarray, s_a: jnp.ndarray, b: jnp.ndarray, s_b: jnp.ndarray) -> Pair:
    """Signed add (`src/signed.rs:17-26`): sign of result = s_a * s_b."""
    shape = a.shape[1:]
    one = f128.ones(shape)
    max_p1 = _c(MAX_P1_INT, shape)
    a_c = cleanse(a, s_a)
    b_c = cleanse(b, s_b)
    ind = f128.mul(s_a, s_b)
    wrapped = f128.sub(f128.sub(max_p1, a_c), b_c)
    normal = f128.add(a, b)
    c = f128.add(f128.mul(ind, wrapped),
                 f128.mul(f128.sub(one, ind), normal))
    return c, ind


def sub(a: jnp.ndarray, s_a: jnp.ndarray, b: jnp.ndarray, s_b: jnp.ndarray) -> Pair:
    """a + (-b): flip b's sign (`src/signed.rs:28-31`)."""
    one = f128.ones(b.shape[1:])
    return add(a, s_a, b, f128.sub(one, s_b))


def _signed_result(prod: jnp.ndarray, sign: jnp.ndarray) -> jnp.ndarray:
    shape = prod.shape[1:]
    one = f128.ones(shape)
    max_p1 = _c(MAX_P1_INT, shape)
    wrapped = f128.sub(max_p1, prod)
    return f128.add(f128.mul(sign, wrapped),
                    f128.mul(f128.sub(one, sign), prod))


def _xor_sign(s_a: jnp.ndarray, s_b: jnp.ndarray) -> jnp.ndarray:
    """s_a + s_b - 2*s_a*s_b (`src/signed.rs:36`)."""
    two_ab = f128.mul_scalar(f128.mul(s_a, s_b), 2)
    return f128.sub(f128.add(s_a, s_b), two_ab)


def mul(a: jnp.ndarray, s_a: jnp.ndarray, b: jnp.ndarray, s_b: jnp.ndarray) -> Pair:
    """Signed mul (`src/signed.rs:33-39`)."""
    prod = f128.mul(cleanse(a, s_a), cleanse(b, s_b))
    sign = _xor_sign(s_a, s_b)
    return _signed_result(prod, sign), sign


def div(a: jnp.ndarray, s_a: jnp.ndarray, b: jnp.ndarray, s_b: jnp.ndarray) -> Pair:
    """Signed div via field inverse (`src/signed.rs:42-48`)."""
    q = f128.mul(cleanse(a, s_a), f128.inv(cleanse(b, s_b)))
    sign = _xor_sign(s_a, s_b)
    return _signed_result(q, sign), sign


def div_by_inv(a: jnp.ndarray, s_a: jnp.ndarray, b_c_inv: jnp.ndarray,
               s_b: jnp.ndarray) -> Pair:
    """div with a precomputed inverse of the *cleansed* divisor.

    Fast path for division by public scalars (pr, lr, ac, k) inside hot
    loops; identical result to `div` when b_c_inv == inv(cleanse(b, s_b)).
    """
    q = f128.mul(cleanse(a, s_a), b_c_inv)
    sign = _xor_sign(s_a, s_b)
    return _signed_result(q, sign), sign


# ---------------------------------------------------------------------------
# Host-side (python int) encoding helpers — mirror `src/helper.rs:25-52`.
# ---------------------------------------------------------------------------


def f64_to_felt(x: float) -> int:
    """Scale by 1e6 and round (`src/helper.rs:25-27`).  Returns canonical int.

    Matches Rust `(x * 1e6).round() as u128`: negative inputs saturate to 0
    (Rust float->unsigned cast clamps), which is why the reference encodes
    negatives via `f64_to_signed_felt` instead.
    """
    v = round(x * 1e6)
    if v < 0:
        v = 0
    return v % ref.P


def encode_signed(x: int) -> Tuple[int, int]:
    """Encode a python int as (value, sign) (`src/helper.rs:40-47`)."""
    if x >= 0:
        return x % ref.P, 0
    return (2**128 - 1 - (-x) + 1) % ref.P, 1


def f64_to_signed_felt(x: float, scale: float = 1e6) -> Tuple[int, int]:
    """`src/helper.rs:50-52`."""
    return encode_signed(round(x * scale))


def decode_signed(v: int, s: int) -> float:
    """Approximate decode back to float (for tests/analytics only)."""
    if s == 0:
        return (v % ref.P) / 1e6
    # negative: v = (u128::MAX - |x| + 1) mod p  =>  |x| = (MAX_P1 - v) mod p
    mag = (MAX_P1_INT - v) % ref.P
    return -mag / 1e6


# Python-int oracle versions of the signed ops (for golden tests)
def ref_cleanse(v: int, s: int) -> int:
    return ((1 - s) * v + s * ((MAX_INT - v + 1) % ref.P)) % ref.P


def ref_add(a: int, s_a: int, b: int, s_b: int) -> Tuple[int, int]:
    a_c, b_c = ref_cleanse(a, s_a), ref_cleanse(b, s_b)
    ind = (s_a * s_b) % ref.P
    c = (ind * ((MAX_P1_INT - a_c - b_c) % ref.P) + (1 - ind) * (a + b)) % ref.P
    return c, ind


def ref_sub(a: int, s_a: int, b: int, s_b: int) -> Tuple[int, int]:
    return ref_add(a, s_a, b, (1 - s_b) % ref.P)


def ref_mul(a: int, s_a: int, b: int, s_b: int) -> Tuple[int, int]:
    prod = (ref_cleanse(a, s_a) * ref_cleanse(b, s_b)) % ref.P
    sign = (s_a + s_b - 2 * s_a * s_b) % ref.P
    res = (sign * ((MAX_P1_INT - prod) % ref.P) + (1 - sign) * prod) % ref.P
    return res, sign


def ref_div(a: int, s_a: int, b: int, s_b: int) -> Tuple[int, int]:
    q = (ref_cleanse(a, s_a) * ref.inv(ref_cleanse(b, s_b))) % ref.P
    sign = (s_a + s_b - 2 * s_a * s_b) % ref.P
    res = (sign * ((MAX_P1_INT - q) % ref.P) + (1 - sign) * q) % ref.P
    return res, sign
