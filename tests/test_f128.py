"""Bit-exact tests of the JAX f128 limb arithmetic vs the python-int oracle.

Mirrors the reference's oracle-test pattern (`src/helper.rs:414-690`), with
exact integers instead of float tolerance.
"""

import numpy as np
import pytest

from zk_stark_project_tpu.ops import f128, f128_ref as ref

P = ref.P


def _rand_elems(rng, n, special_frac=0.25):
    """Random field elements with a healthy dose of boundary cases."""
    specials = [0, 1, 2, P - 1, P - 2, 2**64 - 1, 2**64, 2**127,
                ref.U128_MAX_REDUCED, 45 * 2**40 - 1, 2**128 - 1 - (P - 1)]
    out = []
    for _ in range(n):
        if rng.random() < special_frac:
            out.append(rng.choice(specials) % P)
        else:
            out.append(rng.getrandbits(128) % P)
    return out


def test_pack_roundtrip(rng):
    xs = _rand_elems(rng, 64)
    limbs = f128.from_ints(xs)
    assert limbs.shape == (8, 64)
    back = f128.to_ints(limbs)
    assert [int(v) for v in back] == xs


@pytest.mark.parametrize("op,ref_op", [
    ("add", ref.add), ("sub", ref.sub), ("mul", ref.mul),
])
def test_binary_ops(rng, op, ref_op):
    a = _rand_elems(rng, 256)
    b = _rand_elems(rng, 256)
    got = f128.to_ints(getattr(f128, op)(f128.from_ints(a), f128.from_ints(b)))
    want = [ref_op(x, y) for x, y in zip(a, b)]
    assert [int(v) for v in got] == want


def test_neg(rng):
    a = _rand_elems(rng, 128)
    got = f128.to_ints(f128.neg(f128.from_ints(a)))
    assert [int(v) for v in got] == [ref.neg(x) for x in a]


def test_mul_scalar(rng):
    a = _rand_elems(rng, 128)
    for c in [0, 1, 2, 45, 7, 65535]:
        got = f128.to_ints(f128.mul_scalar(f128.from_ints(a), c))
        assert [int(v) for v in got] == [ref.mul(x, c) for x in a]


def test_inv(rng):
    a = [x for x in _rand_elems(rng, 64) if x != 0]
    got = f128.to_ints(f128.inv(f128.from_ints(a)))
    assert [int(v) for v in got] == [ref.inv(x) for x in a]


def test_pow_const(rng):
    a = _rand_elems(rng, 32)
    for e in [0, 1, 2, 7, 64, P - 2]:
        got = f128.to_ints(f128.pow_const(f128.from_ints(a), e))
        assert [int(v) for v in got] == [pow(x, e, P) for x in a]


def test_uint32_words_roundtrip(rng):
    # includes non-canonical u128 patterns (e.g. u128::MAX) which must reduce
    xs = [rng.getrandbits(128) for _ in range(64)] + [2**128 - 1, P, P + 5]
    words = np.array(
        [[(x >> (32 * i)) & 0xFFFFFFFF for x in xs] for i in range(4)],
        dtype=np.uint32,
    )
    got = f128.to_ints(f128.from_uint32_words(words))
    assert [int(v) for v in got] == [x % P for x in xs]

    # and the reverse direction on canonical values
    limbs = f128.from_ints([x % P for x in xs])
    w = np.asarray(f128.to_uint32_words(limbs), dtype=np.uint64)
    vals = [int(sum(int(w[i, k]) << (32 * i) for i in range(4))) for k in range(len(xs))]
    assert vals == [x % P for x in xs]


def test_eq_select(rng):
    a = _rand_elems(rng, 32)
    la = f128.from_ints(a)
    lb = f128.from_ints(list(a))
    assert bool(np.all(np.asarray(f128.eq(la, lb))))
    m = np.zeros(32, dtype=bool)
    m[::2] = True
    sel = f128.select(m, la, f128.zeros((32,)))
    want = [x if m[i] else 0 for i, x in enumerate(a)]
    assert [int(v) for v in f128.to_ints(sel)] == want


def test_batch_shapes(rng):
    # 2-D batch
    a = _rand_elems(rng, 24)
    b = _rand_elems(rng, 24)
    la = f128.from_ints(np.array(a, dtype=object).reshape(4, 6))
    lb = f128.from_ints(np.array(b, dtype=object).reshape(4, 6))
    got = f128.to_ints(f128.mul(la, lb)).ravel()
    assert [int(v) for v in got] == [ref.mul(x, y) for x, y in zip(a, b)]


def test_canon_values_above_p():
    """Regression: canon must reduce values in [p, 2^128) — the signed
    encoding (MAX = u128::MAX, `src/helper.rs:16`) puts every negative
    fixed-point number there.  A reduced-mod-P p-limb table once made
    canon a silent no-op (commitments then hashed non-canonical bytes)."""
    import numpy as np

    bad = [ref.P, ref.P + 1, 2 ** 128 - 1, 2 ** 128 - 49400943249919,
           ref.P - 1, 0, 1]
    w = np.zeros((4, len(bad)), np.uint32)
    for i, x in enumerate(bad):
        for k in range(4):
            w[k, i] = (x >> (32 * k)) & 0xFFFFFFFF
    a = f128.from_uint32_words(np.asarray(w))
    c = np.asarray(f128.canon(a))
    for i, x in enumerate(bad):
        got = sum(int(c[j, i]) << (16 * j) for j in range(8))
        assert got == x % ref.P, (i, x)
    words = np.asarray(f128.to_uint32_words(a))
    for i, x in enumerate(bad):
        got = sum(int(words[k, i]) << (32 * k) for k in range(4))
        assert got == x % ref.P, (i, x)


def test_batch_inv_matches_single(rng):
    from zk_stark_project_tpu.ops import f128_ref as ref

    xs = [rng.randrange(1, ref.P) for _ in range(23)] + [1, ref.P - 1]
    assert ref.batch_inv(xs) == [ref.inv(x) for x in xs]
    assert ref.batch_inv([]) == []
    import pytest

    with pytest.raises(ZeroDivisionError):
        ref.batch_inv([5, 0, 7])
