"""f128 field arithmetic on 32-bit TPU lanes (JAX).

TPUs have no native 64/128-bit integer types, so a field element is stored as
**8 little-endian limbs of 16 bits, each held in a uint32 lane**, stacked on a
*leading* axis: an array of field elements with batch shape `S` is a uint32
array of shape `(8,) + S`.  The leading limb axis keeps each limb plane
contiguous so every op is a plain elementwise VPU op over the batch.

Representation: **lazy ("red128")** — values are kept in [0, 2^128), i.e.
reduced mod 2^128-headroom but *not* necessarily < p.  Canonicalization
(`canon`) happens only at protocol boundaries (hashing, serialization,
equality).  This matters twice over:

  * it removes all data-dependent selects / borrow chains from the hot path
    (sums/products are folded with the sparse-modulus identity
    2^128 = 45*2^40 - 1 (mod p) using pure multiply-adds — FOLD has only
    three nonzero 16-bit limbs), and
  * XLA's optimizer handles the resulting pure adder-tree graphs far better
    than compare/select chains (orders of magnitude faster compiles).

This is the TPU-native replacement for winterfell's `f128::BaseElement`
(reference dependency: `Cargo.toml:11`; used everywhere as `Felt`, e.g.
`src/main.rs:34`).  Bit-exactness is tested against `ops/f128_ref.py`.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import f128_ref as ref

P = ref.P
NUM_LIMBS = ref.NUM_LIMBS
LIMB_BITS = ref.LIMB_BITS
LIMB_MASK = ref.LIMB_MASK

_U32 = jnp.uint32

# NOTE: must NOT go through ref.to_limbs (it reduces mod P, which would
# yield the limbs of 0 and silently turn `canon` into a no-op for values
# in [p, 2^128) — the signed encoding puts every negative number there).
_P_LIMBS = np.array([(P >> (16 * i)) & 0xFFFF for i in range(NUM_LIMBS)],
                    dtype=np.uint32)
#: 2^128 mod p = 45*2^40 - 1 = 0x2CFFFFFFFFFF -> 16-bit limbs [ffff, ffff, 2cff, 0...]
_FOLD = 45 * 2**40 - 1
_FOLD_LIMBS = [(_FOLD >> (16 * i)) & 0xFFFF for i in range(NUM_LIMBS)]
_FOLD_NNZ = [(i, v) for i, v in enumerate(_FOLD_LIMBS) if v]  # 3 nonzero limbs

# Once the value bound drops to TERM = 2^129 - FOLD, the top "limb" is 0 or 1
# and (lo + FOLD) stays < 2^128, so one final in-place fold finishes.
_TERM_BOUND = 2**129 - _FOLD


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


def from_int(x: int) -> jnp.ndarray:
    """Pack one python int (reduced mod p) -> (8,) uint32."""
    return jnp.asarray(ref.to_limbs(x % P), dtype=_U32)


def from_ints(xs, shape=None) -> jnp.ndarray:
    """Pack a (nested) sequence of python ints -> (8,) + batch-shape uint32.

    Three object-dtype passes (mod, mask, shift) then pure-numpy limb
    splits — this converts every transcript coefficient, so it is hot."""
    batch_shape = np.shape(xs) if shape is None else shape
    flat = np.asarray(xs, dtype=object).ravel()
    if flat.size == 0:
        return jnp.zeros((NUM_LIMBS,) + tuple(batch_shape), dtype=_U32)
    red = flat % P
    lo = (red & ((1 << 64) - 1)).astype(np.uint64)
    hi = (red >> 64).astype(np.uint64)
    arr = np.empty((NUM_LIMBS, flat.size), dtype=np.uint32)
    for i in range(4):
        arr[i] = ((lo >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(
            np.uint32)
        arr[i + 4] = ((hi >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(
            np.uint32)
    return jnp.asarray(arr.reshape((NUM_LIMBS,) + tuple(batch_shape)))


def to_ints(limbs) -> np.ndarray:
    """Unpack (8,) + S uint32 -> object ndarray of python ints (canonical).

    The 16-bit limbs are first packed into two uint64 halves with pure
    numpy (fast), so only THREE object-dtype passes remain (shift, or,
    mod) — this path converts every proof opening, so it is hot."""
    a = np.asarray(limbs, dtype=np.uint64)
    flat = a.reshape(NUM_LIMBS, -1)
    lo = (flat[0] | (flat[1] << np.uint64(16)) | (flat[2] << np.uint64(32))
          | (flat[3] << np.uint64(48)))
    hi = (flat[4] | (flat[5] << np.uint64(16)) | (flat[6] << np.uint64(32))
          | (flat[7] << np.uint64(48)))
    out = (lo.astype(object) | (hi.astype(object) << 64)) % P
    return out.reshape(a.shape[1:]) if a.ndim > 1 else out.reshape(())


def to_int(limbs) -> int:
    return int(to_ints(limbs))


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros((NUM_LIMBS,) + tuple(shape), dtype=_U32)


def ones(shape=()) -> jnp.ndarray:
    z = np.zeros((NUM_LIMBS,) + tuple(shape), dtype=np.uint32)
    z[0] = 1
    return jnp.asarray(z)


def full(shape, x: int) -> jnp.ndarray:
    l = np.array(ref.to_limbs(x % P), dtype=np.uint32)
    return jnp.asarray(
        np.broadcast_to(l.reshape((NUM_LIMBS,) + (1,) * len(tuple(shape))),
                        (NUM_LIMBS,) + tuple(shape)).copy()
    )


# ---------------------------------------------------------------------------
# Limb helpers (python lists of uint32 arrays, statically unrolled under jit)
# ---------------------------------------------------------------------------


def _unstack(a: jnp.ndarray) -> List[jnp.ndarray]:
    return [a[i] for i in range(a.shape[0])]


def _stack(limbs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(limbs, axis=0)


def _carry_norm(limbs: List[jnp.ndarray], out_len: int) -> List[jnp.ndarray]:
    """Propagate carries so every output limb is < 2^16.  Inputs may hold up
    to 2^32-1; the true value must fit in out_len limbs."""
    out = []
    carry = None
    for i in range(out_len):
        t = limbs[i] if i < len(limbs) else None
        if t is None:
            t = carry if carry is not None else jnp.zeros_like(limbs[0])
        elif carry is not None:
            t = t + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return out


def _carry_norm_with_carry(limbs: List[jnp.ndarray], out_len: int):
    """Like _carry_norm but also returns the final carry-out."""
    out = []
    carry = jnp.zeros_like(limbs[0])
    for i in range(out_len):
        t = (limbs[i] if i < len(limbs) else jnp.zeros_like(limbs[0])) + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return out, carry


def _add_fold(limbs: List[jnp.ndarray], k: jnp.ndarray) -> List[jnp.ndarray]:
    """limbs + k * FOLD as raw (un-normalized) limb adds; k must be small
    enough that limb values stay < 2^32 (k < 2^15 is always safe)."""
    out = list(limbs)
    for i, v in _FOLD_NNZ:
        out[i] = out[i] + k * jnp.uint32(v)
    return out


def _mul_fold_acc(hi: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """hi * FOLD via the 3 nonzero FOLD limbs -> un-normalized accumulator
    (column sums < 6 * 2^16, safe in uint32)."""
    zero = jnp.zeros_like(hi[0])
    acc = [zero] * (len(hi) + 4)
    for j, v in _FOLD_NNZ:
        vv = jnp.uint32(v)
        for i, h in enumerate(hi):
            pp = h * vv  # 16x16 -> 32-bit exact
            acc[i + j] = acc[i + j] + (pp & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (pp >> LIMB_BITS)
    return acc


def _reduce_red128(limbs: List[jnp.ndarray], bound: int) -> List[jnp.ndarray]:
    """Fold a normalized limb vector with value < `bound` down to 8 limbs
    < 2^128 (red128, NOT canonical).  Static fold count from the python-int
    bound; no selects, no borrows — pure multiply-add + carry chains."""
    cur, b = limbs, bound
    while b > _TERM_BOUND:
        hi_max = (b - 1) >> 128
        hi_limbs = (hi_max.bit_length() + 15) // 16
        hi = cur[NUM_LIMBS:NUM_LIMBS + hi_limbs]
        acc = _mul_fold_acc(hi)  # hi * FOLD
        # + lo
        for i in range(NUM_LIMBS):
            if i < len(acc):
                acc[i] = acc[i] + cur[i]
            else:
                acc.append(cur[i])
        new_bound = 2**128 + hi_max * _FOLD + 1
        out_len = max(((new_bound - 1).bit_length() + 15) // 16, NUM_LIMBS + 1)
        cur = _carry_norm(acc, out_len)
        b = new_bound
    if len(cur) > NUM_LIMBS and b > 2**128:
        # top limb is 0 or 1; bound <= 2^129 - FOLD guarantees lo + FOLD < 2^128
        top = cur[NUM_LIMBS]
        cur = _carry_norm(_add_fold(cur[:NUM_LIMBS], top), NUM_LIMBS)
    return cur[:NUM_LIMBS]


def _sub_limbs_with_borrow(a: List[jnp.ndarray], b: List[jnp.ndarray]):
    """a - b limb-wise (both normalized 16-bit).  Returns (diff, borrow_out)."""
    assert len(a) == len(b)
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(len(a)):
        d = a[i] - b[i] - borrow  # uint32 wraparound
        out.append(d & LIMB_MASK)
        borrow = (d >> LIMB_BITS) & jnp.uint32(1)
    return out, borrow


def _sub_const_with_borrow(a: List[jnp.ndarray], c_limbs, k=None):
    """a - c (c a constant limb vector, optionally scaled by 0/1 array k)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(len(a)):
        ci = jnp.uint32(int(c_limbs[i]))
        sub_i = ci * k if k is not None else ci
        d = a[i] - sub_i - borrow
        out.append(d & LIMB_MASK)
        borrow = (d >> LIMB_BITS) & jnp.uint32(1)
    return out, borrow


# ---------------------------------------------------------------------------
# Public field ops (inputs/outputs red128: < 2^128, equal mod p)
# ---------------------------------------------------------------------------


def _add_impl(a, b):
    a_l, b_l = _unstack(a), _unstack(b)
    s = [x + y for x, y in zip(a_l, b_l)]  # < 2^17
    s, c = _carry_norm_with_carry(s, NUM_LIMBS)
    # carry in {0,1}: + c*FOLD; may carry once more (then the second value is
    # tiny, no further carry)
    s, c2 = _carry_norm_with_carry(_add_fold(s, c), NUM_LIMBS)
    s = _carry_norm(_add_fold(s, c2), NUM_LIMBS)
    return _stack(s)


def _sub_impl(a, b):
    a_l, b_l = _unstack(a), _unstack(b)
    d, w = _sub_limbs_with_borrow(a_l, b_l)
    # borrowed: true value = a-b+2^128; subtract FOLD (=2^128-p) to get a-b+p.
    # 2^128 - FOLD = p, so at most two corrections are ever needed.
    d, w2 = _sub_const_with_borrow(d, _FOLD_LIMBS, k=w)
    d, _ = _sub_const_with_borrow(d, _FOLD_LIMBS, k=(w & w2))
    return _stack(d)


def _mul_impl(a, b):
    a_l, b_l = _unstack(a), _unstack(b)
    if a.shape[1:] != b.shape[1:]:
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a_l = [jnp.broadcast_to(x, shape) for x in a_l]
        b_l = [jnp.broadcast_to(x, shape) for x in b_l]
    zero = jnp.zeros_like(a_l[0])
    acc = [zero] * (2 * NUM_LIMBS)  # column sums < 16 * 2^16 = 2^20
    for i in range(NUM_LIMBS):
        for j in range(NUM_LIMBS):
            pp = a_l[i] * b_l[j]  # 16x16 -> 32-bit exact in uint32
            acc[i + j] = acc[i + j] + (pp & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (pp >> LIMB_BITS)
    t = _carry_norm(acc, 2 * NUM_LIMBS)
    out = _stack(_reduce_red128(t, 2**256))
    # Materialization point: without it XLA's fusion pass merges chained muls
    # into one mega-kernel whose fan-out recomputation grows exponentially
    # (hours-long CPU compiles).  Pallas kernels own the fused fast path.
    return jax.lax.optimization_barrier(out)


def _mul_scalar_impl(a, c: int):
    a_l = _unstack(a)
    prods = [x * jnp.uint32(c) for x in a_l]  # < 2^32
    t = _carry_norm(prods, NUM_LIMBS + 1)
    return _stack(_reduce_red128(t, (2**128) * max(c, 1)))


def _canon_impl(a):
    """Subtract p once if needed -> canonical (< p).  Boundary-only op."""
    a_l = _unstack(a)
    diff, borrow = _sub_const_with_borrow(a_l, _P_LIMBS)
    keep = borrow.astype(bool)  # borrow => a < p => keep a
    return _stack([jnp.where(keep, a_l[i], diff[i]) for i in range(NUM_LIMBS)])


add = jax.jit(_add_impl)
sub = jax.jit(_sub_impl)
_mul_jnp = jax.jit(_mul_impl)
mul_scalar = jax.jit(_mul_scalar_impl, static_argnums=1)
canon = jax.jit(_canon_impl)


@functools.lru_cache(maxsize=None)
def _pallas_backend_default() -> bool:
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False
    if on_tpu:
        # first confirmed-TPU moment in any process: switch the persistent
        # compile cache to the committed, host-portable TPU dir so every
        # executable compiled from here on is warm for the next sandbox
        from .. import use_tpu_compile_cache

        use_tpu_compile_cache()
    return on_tpu


def use_pallas() -> bool:
    """True when field muls should run as Pallas kernels (TPU backend, or
    forced via ZKSTARK_PALLAS=1 / ZKSTARK_FORCE_PALLAS=interpret).  The jnp
    path stays the CPU/test default: its per-mul optimization_barrier keeps
    XLA-CPU compiles tractable, while the Pallas path owns TPU fusion."""
    import os

    env = os.environ.get("ZKSTARK_PALLAS")
    if env == "0":
        return False
    if env == "1" or os.environ.get("ZKSTARK_FORCE_PALLAS") == "interpret":
        return True
    return _pallas_backend_default()


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field product, dispatching to the fused Pallas kernel on TPU (one
    VMEM pass, no per-mul HBM materialization) and to the barriered jnp
    limb path elsewhere."""
    if use_pallas():
        from . import f128_pallas

        return f128_pallas.mul(a, b)
    return _mul_jnp(a, b)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return sub(zeros(a.shape[1:]), a)


def sqr(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


@functools.lru_cache(maxsize=None)
def _pow_bits(e: int):
    return tuple(int(b) for b in bin(e)[2:])


def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a static non-negative python-int exponent (unrolled; use only
    for small exponents — for the inverse use `inv`)."""
    if e == 0:
        return ones(a.shape[1:])
    bits = _pow_bits(e)
    result = a
    for bit in bits[1:]:
        result = mul(result, result)
        if bit:
            result = mul(result, a)
    return result


@jax.jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2): multiplicative inverse (inv(0) = 0; dividing by zero is a
    caller bug).  Square-and-multiply in a fori_loop: small compiled graph."""
    e = P - 2
    bits_msb_first = [int(b) for b in bin(e)[2:]]
    nbits = len(bits_msb_first)
    bits_arr = jnp.asarray(bits_msb_first, dtype=jnp.uint32)

    def body(i, acc):
        acc = mul(acc, acc)
        with_mul = mul(acc, a)
        take = bits_arr[i].astype(bool)
        return jnp.where(take, with_mul, acc)

    return jax.lax.fori_loop(1, nbits, body, a)


def batch_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of every element (fully parallel pow)."""
    return inv(a)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Equality mod p -> bool array (batch shape).  Canonicalizes both."""
    return jnp.all(canon(a) == canon(b), axis=0)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canon(a) == 0, axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(mask, a, b) with mask of batch shape."""
    return jnp.where(mask[None, ...], a, b)


# ---------------------------------------------------------------------------
# Conversions for hashing/serialization: canonical little-endian u128 words —
# exactly winterfell's `Serializable` layout for f128.
# ---------------------------------------------------------------------------


@jax.jit
def to_uint32_words(a: jnp.ndarray) -> jnp.ndarray:
    """(8,) + S red128 limbs -> (4,) + S uint32 canonical LE words."""
    a_l = _unstack(_canon_impl(a))
    words = []
    for i in range(0, NUM_LIMBS, 2):
        words.append(a_l[i] | (a_l[i + 1] << LIMB_BITS))
    return _stack(words)


@jax.jit
def from_uint32_words(w: jnp.ndarray) -> jnp.ndarray:
    """(4,) + S uint32 LE words (any u128 bit pattern) -> red128 limbs."""
    w_l = _unstack(w)
    limbs = []
    for x in w_l:
        limbs.append(x & LIMB_MASK)
        limbs.append(x >> LIMB_BITS)
    return _stack(limbs)
