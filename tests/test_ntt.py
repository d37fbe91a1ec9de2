"""NTT/iNTT/coset LDE: JAX vs python-int oracle, bit-exact."""

import numpy as np
import pytest

from zk_stark_project_tpu.ops import f128, f128_ref as ref, ntt

P = ref.P


def _rand(rng, n):
    return [rng.getrandbits(128) % P for _ in range(n)]


@pytest.mark.parametrize("logn", [1, 2, 4, 6, 8])
def test_ntt_matches_oracle(rng, logn):
    n = 1 << logn
    vals = _rand(rng, n)
    got = f128.to_ints(ntt.ntt(f128.from_ints(vals)))
    want = ref.ntt(vals)
    assert [int(v) for v in got] == want


@pytest.mark.parametrize("logn", [1, 4, 8])
def test_intt_roundtrip(rng, logn):
    n = 1 << logn
    vals = _rand(rng, n)
    limbs = f128.from_ints(vals)
    back = f128.to_ints(ntt.ntt(ntt.ntt(limbs), inverse=True))
    assert [int(v) for v in back] == vals


def test_intt_matches_oracle(rng):
    n = 64
    vals = _rand(rng, n)
    got = f128.to_ints(ntt.ntt(f128.from_ints(vals), inverse=True))
    want = ref.ntt(vals, invert=True)
    assert [int(v) for v in got] == want


def test_batched_columns(rng):
    """(8, C, n) transforms C independent columns."""
    n, C = 32, 3
    cols = [_rand(rng, n) for _ in range(C)]
    stacked = f128.from_ints(np.array(cols, dtype=object))  # (8, C, n)
    got = f128.to_ints(ntt.ntt(stacked))
    for c in range(C):
        assert [int(v) for v in got[c]] == ref.ntt(cols[c])


def test_coset_lde_matches_oracle(rng):
    """Blowup-16 coset evaluation with generator offset (the trace LDE)."""
    n, blowup = 16, 16
    coeffs = _rand(rng, n)
    got = f128.to_ints(
        ntt.coset_evaluate(f128.from_ints(coeffs), ref.GENERATOR, blowup))
    want = ref.coset_evaluate(coeffs, ref.GENERATOR, n * blowup)
    assert [int(v) for v in got] == want
    # sanity: first evaluation = poly(offset)
    assert int(got[0]) == ref.evaluate_poly(coeffs, ref.GENERATOR)


def test_coset_interpolate_roundtrip(rng):
    n = 64
    coeffs = _rand(rng, n)
    ev = ntt.coset_evaluate(f128.from_ints(coeffs), ref.GENERATOR, 1)
    back = f128.to_ints(ntt.coset_interpolate(ev, ref.GENERATOR))
    assert [int(v) for v in back] == coeffs


def test_domain_points():
    pts = ntt.domain_points(3, offset=ref.GENERATOR)
    w = ref.root_of_unity(3)
    assert pts[0] == ref.GENERATOR
    assert pts[1] == (ref.GENERATOR * w) % P
    assert len(pts) == 8


@pytest.mark.parametrize("logn,inverse", [(8, False), (9, True), (10, False)])
def test_four_step_matches_direct(rng, logn, inverse):
    """The DIF-based four-step decomposition (used above the Pallas VMEM
    cap on TPU) must match the direct transform at any size — exercises
    the DIF mirror, the rev-permuted mid-twiddle table and the final
    unscramble gather on CPU."""
    n = 1 << logn
    vals = _rand(rng, n)
    limbs = f128.from_ints(vals)
    got = f128.to_ints(ntt._four_step(limbs, logn, inverse))
    want = ref.ntt(vals, invert=inverse)
    assert [int(v) for v in got] == want


def test_four_step_batched(rng):
    """Four-step over a batched (8, C, n) stack, forward and inverse."""
    n, C = 256, 3
    cols = [_rand(rng, n) for _ in range(C)]
    stacked = f128.from_ints(np.array(cols, dtype=object))
    got = f128.to_ints(ntt._four_step(stacked, 8, False))
    for c in range(C):
        assert [int(v) for v in got[c]] == ref.ntt(cols[c])


def test_dif_mirror_order(rng):
    """_dif: natural input -> bit-reversed output, no scaling."""
    logn, n = 6, 64
    vals = _rand(rng, n)
    out = f128.to_ints(ntt._dif(f128.from_ints(vals), logn, False))
    want = ref.ntt(vals)
    revd = [want[int(r)] for r in ntt._bitrev_np(logn)]
    assert [int(v) for v in out] == revd
