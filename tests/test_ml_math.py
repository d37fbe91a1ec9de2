"""ML-in-the-field math tests — the reference's float-oracle pattern
(`src/helper.rs:414-690`): run the field-encoded implementation, compare
against a plain-f64 reference after decoding, plus bit-exact JAX vs
python-int-oracle checks.
"""

import numpy as np
import pytest

from zk_stark_project_tpu.models import ml_math
from zk_stark_project_tpu.models.ml_math import AC, FE
from zk_stark_project_tpu.ops import f128
from zk_stark_project_tpu.ops import f128_ref as ref
from zk_stark_project_tpu.ops.signed import (decode_signed, f64_to_felt,
                                             f64_to_signed_felt)

LR = f64_to_felt(0.0001)
PR = f64_to_felt(1e6)


def encode_matrix(m):
    vals = [[f64_to_signed_felt(x, 1e6)[0] for x in row] for row in m]
    signs = [[f64_to_signed_felt(x, 1e6)[1] for x in row] for row in m]
    return vals, signs


def encode_vec(v):
    vals = [f64_to_signed_felt(x, 1e6)[0] for x in v]
    signs = [f64_to_signed_felt(x, 1e6)[1] for x in v]
    return vals, signs


@pytest.fixture
def model(np_rng):
    w = np_rng.normal(0, 1.0, size=(AC, FE))
    b = np_rng.normal(0, 1.0, size=(AC,))
    x = np_rng.normal(0, 1.0, size=(FE,))
    y = [0.0] * AC
    y[3] = 1e6  # one-hot at activation 3, scaled by precision
    return w, b, x, y


def float_forward(w, b, x):
    return w @ x + b


def float_mse_prime(y, out):
    return 2.0 * (out - y) / AC


def float_backward(w, b, x, err, lr):
    b2 = b - err / lr
    w2 = w - np.outer(err, x) / lr / 1e6
    return w2, b2


def test_forward_matches_float_oracle():
    """The reference's own forward-correctness case
    (`src/helper.rs:580-615`) — all-positive, division-exact values with
    pr = f64_to_felt(1.0).  (Field division is exact integer semantics:
    random values yield non-divisible sums whose quotients are arbitrary
    field elements — the reference's tests avoid that too, so the float
    oracle only applies to division-exact inputs.)"""
    w = [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]
    b = [0.1, 0.2]
    x = [1.0, 2.0, 3.0]
    wv, ws = encode_matrix(w)
    bv, bs = encode_vec(b)
    xv, xs = encode_vec(x)
    out, out_s = ml_math.ref_forward(wv, ws, bv, bs, xv, xs, f64_to_felt(1.0))
    decoded = [decode_signed(v, 1 if s else 0) for v, s in zip(out, out_s)]
    expected = np.asarray(w) @ np.asarray(x) + np.asarray(b)
    np.testing.assert_allclose(decoded, expected, atol=1e-5)


def test_mse_prime_reference_semantics():
    """Documents a reference quirk we replicate bit-exactly: `sub(a, b)`
    flips b's sign *bit* without re-encoding b's value
    (`src/signed.rs:28-31`), so for two positive operands the mixed-sign
    branch of add_generic fires with ind=0 and the result is the RAW SUM
    a + b, sign 0.  Hence mse_prime(y=1.0, pred=1.5) = 2*(1.5 &plus; 1.0)/2
    = 2.5, not 0.5.  (The reference's own unit test `test_subtract_zero_sign`
    at `src/helper.rs:438-446` contradicts its implementation; per SURVEY.md
    pin #2 we match the implementation, which is what its prover executes.)
    Divisions here are exact: 2e6*m / 2e6 = m."""
    ac = 2
    y = [f64_to_felt(1.0), 0]
    out = [f64_to_felt(1.5), f64_to_felt(0.25)]
    out_s = [0, 0]
    r, r_s = ml_math.ref_mse_prime(y, out, out_s, ac)
    assert decode_signed(r[0], 1 if r_s[0] else 0) == 2.5
    assert decode_signed(r[1], 1 if r_s[1] else 0) == 0.25


def test_jax_sgd_step_bit_exact_vs_oracle(model):
    w, b, x, y = model
    wv, ws = encode_matrix(w)
    bv, bs = encode_vec(b)
    xv, xs = encode_vec(x)
    yv = [round(v) for v in y]

    jw = f128.from_ints(np.asarray(wv, dtype=object))
    jws = f128.from_ints(np.asarray(ws, dtype=object))
    jb = f128.from_ints(np.asarray(bv, dtype=object))
    jbs = f128.from_ints(np.asarray(bs, dtype=object))
    jx = f128.from_ints(np.asarray(xv, dtype=object))
    jxs = f128.from_ints(np.asarray(xs, dtype=object))
    jy = f128.from_ints(np.asarray(yv, dtype=object))

    w2, ws2, b2, bs2 = ml_math.sgd_step(jw, jws, jb, jbs, jx, jxs, jy, LR, PR)
    rw2, rws2, rb2, rbs2 = ml_math.ref_sgd_step(wv, ws, bv, bs, xv, xs, yv,
                                                LR, PR)
    assert f128.to_ints(w2).tolist() == rw2
    assert f128.to_ints(ws2).tolist() == rws2
    assert f128.to_ints(b2).tolist() == rb2
    assert f128.to_ints(bs2).tolist() == rbs2


def test_one_hot(np_rng):
    v = ml_math.label_to_one_hot(4.0, AC, 1e6)
    assert sum(1 for x in v if x != 0) == 1
    assert v[3] == 1_000_000
    assert ml_math.label_to_one_hot(0.5, AC, 1e6)[0] == 1_000_000
    # out-of-range label -> all zeros
    assert all(x == 0 for x in ml_math.label_to_one_hot(99.0, AC, 1e6))


def test_state_flatten_roundtrip(np_rng):
    w = [[int(np_rng.integers(0, 1000)) for _ in range(FE)] for _ in range(AC)]
    ws = [[int(np_rng.integers(0, 2)) for _ in range(FE)] for _ in range(AC)]
    b = [int(np_rng.integers(0, 1000)) for _ in range(AC)]
    bs = [int(np_rng.integers(0, 2)) for _ in range(AC)]
    flat = ml_math.flatten_state_interleaved(w, ws, b, bs)
    assert len(flat) == 2 * ml_math.STATE_CELLS
    w2, b2, ws2, bs2 = ml_math.split_state_with_sign(flat, AC, FE)
    assert (w2, b2, ws2, bs2) == (w, b, ws, bs)
