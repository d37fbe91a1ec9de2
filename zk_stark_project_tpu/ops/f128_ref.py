"""Golden (oracle) implementation of the f128 STARK field using Python ints.

Field: GF(p) with p = 2^128 - 45*2^40 + 1 — the same 128-bit field the
reference uses via winterfell's `f128::BaseElement` (reference:
`src/helper.rs:16`, `Cargo.toml:11`).  This module is the slow,
obviously-correct oracle against which the JAX limb implementation
(`ops/f128.py`) is tested bit-exactly (the reference's float-oracle test
pattern, `src/helper.rs:508-542`, transplanted to exact integers).

Everything here is arbitrary-precision Python int arithmetic — no numpy,
no JAX — so it cannot be wrong in interesting ways.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

# ---------------------------------------------------------------------------
# Field constants
# ---------------------------------------------------------------------------

#: Field modulus: 2^128 - 45*2^40 + 1 (two-adicity 40).
P: int = 2**128 - 45 * 2**40 + 1

#: Multiplicative generator of GF(p)* (quadratic non-residue; same value
#: winterfell uses for f128's GENERATOR, and hence the LDE coset offset).
GENERATOR: int = 3

#: Two-adicity of p - 1 = 2^40 * (2^88 - 45).
TWO_ADICITY: int = 40

#: Canonical 2^40-th root of unity: GENERATOR^((p-1)/2^40) mod p.
#: Equals winterfell f128's TWO_ADIC_ROOT_OF_UNITY
#: (23953097886125630542083529559205016746).
TWO_ADIC_ROOT: int = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)

#: u128::MAX reduced into the field — the reference's signed-encoding "MAX"
#: (`src/signed.rs:3`, `src/helper.rs:16`).  NOTE: the reference defines MAX
#: as u128::MAX, *not* p-1; reduced mod p it equals 45*2^40 - 2.
U128_MAX_REDUCED: int = (2**128 - 1) % P


def add(a: int, b: int) -> int:
    return (a + b) % P


def sub(a: int, b: int) -> int:
    return (a - b) % P


def neg(a: int) -> int:
    return (-a) % P


def mul(a: int, b: int) -> int:
    return (a * b) % P


def inv(a: int) -> int:
    if a % P == 0:
        raise ZeroDivisionError("inverse of zero in GF(p)")
    return pow(a, P - 2, P)


def div(a: int, b: int) -> int:
    return mul(a, inv(b))


def batch_inv(xs: "Sequence[int]") -> "List[int]":
    """Montgomery batch inversion: ONE modexp + 3(n-1) modmuls for n
    inverses (vs n 128-bit modexps).  The host verifier's per-query
    denominators ride this (a ~60 us modexp each adds up at 40 queries x
    2 denominators x 9 proofs per pipeline)."""
    n = len(xs)
    if n == 0:
        return []
    pref = [1] * (n + 1)
    for i, x in enumerate(xs):
        pref[i + 1] = pref[i] * x % P
    if pref[n] == 0:
        raise ZeroDivisionError("inverse of zero in GF(p)")
    inv_total = pow(pref[n], P - 2, P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = pref[i] * inv_total % P
        inv_total = inv_total * (xs[i] % P) % P
    return out


def exp(a: int, e: int) -> int:
    return pow(a, e, P)


def root_of_unity(log2_n: int) -> int:
    """Primitive 2^log2_n-th root of unity (mirrors winterfell's
    `get_root_of_unity`): TWO_ADIC_ROOT^(2^(40 - log2_n))."""
    if not 0 <= log2_n <= TWO_ADICITY:
        raise ValueError(f"log2_n must be in [0, {TWO_ADICITY}], got {log2_n}")
    return pow(TWO_ADIC_ROOT, 1 << (TWO_ADICITY - log2_n), P)


# ---------------------------------------------------------------------------
# Limb packing helpers (shared convention with ops/f128.py):
# 8 little-endian limbs of 16 bits each, stored in uint32 lanes.
# ---------------------------------------------------------------------------

NUM_LIMBS: int = 8
LIMB_BITS: int = 16
LIMB_MASK: int = (1 << LIMB_BITS) - 1


def to_limbs(x: int) -> List[int]:
    """Split a canonical field element into 8 little-endian 16-bit limbs."""
    x %= P
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NUM_LIMBS)]


def from_limbs(limbs: Sequence[int]) -> int:
    assert len(limbs) == NUM_LIMBS
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs)) % P


# ---------------------------------------------------------------------------
# Reference NTT (decimation-in-time, natural order in/out) — oracle for
# ops/ntt.py.  O(n log n) with python ints; fine for test sizes <= 2^12.
# ---------------------------------------------------------------------------


def ntt(values: Sequence[int], invert: bool = False) -> List[int]:
    """In-order radix-2 NTT over GF(p).  `len(values)` must be a power of 2."""
    n = len(values)
    assert n & (n - 1) == 0, "NTT size must be a power of two"
    logn = n.bit_length() - 1
    a = [v % P for v in values]
    # bit-reverse permutation
    rev = _bit_reverse_indices(logn)
    a = [a[rev[i]] for i in range(n)]
    w_n = root_of_unity(logn)
    if invert:
        w_n = inv(w_n)
    length = 2
    while length <= n:
        w_layer = pow(w_n, n // length, P)
        for start in range(0, n, length):
            w = 1
            half = length // 2
            for k in range(half):
                u = a[start + k]
                t = (a[start + k + half] * w) % P
                a[start + k] = (u + t) % P
                a[start + k + half] = (u - t) % P
                w = (w * w_layer) % P
        length *= 2
    if invert:
        n_inv = inv(n)
        a = [(v * n_inv) % P for v in a]
    return a


def _bit_reverse_indices(logn: int) -> List[int]:
    n = 1 << logn
    rev = [0] * n
    for i in range(n):
        r = 0
        x = i
        for _ in range(logn):
            r = (r << 1) | (x & 1)
            x >>= 1
        rev[i] = r
    return rev


def interpolate(evals: Sequence[int]) -> List[int]:
    """Coefficients of the unique poly of degree < n with the given
    evaluations over the size-n subgroup (natural order)."""
    return ntt(evals, invert=True)


def evaluate_poly(coeffs: Sequence[int], x: int) -> int:
    """Horner evaluation at a single point."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def coset_evaluate(coeffs: Sequence[int], offset: int, n: int) -> List[int]:
    """Evaluate poly (len(coeffs) <= n) over the coset offset*<w_n>,
    natural order."""
    scaled = list(coeffs) + [0] * (n - len(coeffs))
    f = 1
    for i in range(len(scaled)):
        scaled[i] = (scaled[i] * f) % P
        f = (f * offset) % P
    return ntt(scaled)
