"""Pallas f128 kernels: bit-exactness vs the jnp limb path.

These compile via Mosaic and therefore only run on a real TPU backend
(the suite's virtual-CPU mesh can only use interpret mode, whose XLA-CPU
compiles take minutes per shape — measured 125 s for one tile).  On TPU:

    JAX_PLATFORMS='' python -m pytest tests/test_pallas.py

The same checks are scripted in `analytics/validate_pallas.py` for ad-hoc
runs on TPU hardware.
"""

import jax
import numpy as np
import pytest

from zk_stark_project_tpu.ops import f128
from zk_stark_project_tpu.ops import f128_pallas as fp
from zk_stark_project_tpu.ops import f128_ref as ref

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas kernels need the TPU backend (interpret mode compiles "
           "are minutes-per-shape on XLA-CPU)")


def _rand_felts(np_rng, n, hi=None):
    hi = hi if hi is not None else ref.P
    vals = [int(np_rng.integers(0, 2 ** 62)) * int(np_rng.integers(0, 2 ** 60))
            % hi for _ in range(n)]
    return vals


def _canon_eq(a, b):
    return bool((f128.canon(a) == f128.canon(b)).all())


def test_mul_bit_exact(np_rng):
    vals_a = _rand_felts(np_rng, 300) + [0, 1, ref.P - 1, 2 ** 127, 2 ** 64]
    vals_b = _rand_felts(np_rng, 300) + [ref.P - 1, 0, 2 ** 127, 1, 2 ** 64]
    a = f128.from_ints(np.asarray(vals_a, dtype=object))
    b = f128.from_ints(np.asarray(vals_b, dtype=object))
    assert _canon_eq(fp.mul(a, b), f128.mul(a, b))


def test_mul_add_and_pow7(np_rng):
    a = f128.from_ints(np.asarray(_rand_felts(np_rng, 200), dtype=object))
    b = f128.from_ints(np.asarray(_rand_felts(np_rng, 200), dtype=object))
    c = f128.from_ints(np.asarray(_rand_felts(np_rng, 200), dtype=object))
    assert _canon_eq(fp.mul_add(a, b, c), f128.add(f128.mul(a, b), c))
    assert _canon_eq(fp.pow7(a), f128.pow_const(a, 7))


def test_batch_shapes(np_rng):
    vals = _rand_felts(np_rng, 6 * 9)
    a = f128.from_ints(np.asarray(vals, dtype=object)).reshape(8, 6, 9)
    b = f128.from_ints(np.asarray(list(reversed(vals)),
                                  dtype=object)).reshape(8, 6, 9)
    got = fp.mul(a, b)
    assert got.shape == (8, 6, 9)
    assert _canon_eq(got, f128.mul(a, b))


def test_red128_inputs(np_rng):
    # red128 (non-canonical, < 2^128) inputs must work: craft via words
    ints = [2 ** 128 - 1, ref.P, ref.P + 12345, 2 ** 127 + 2 ** 40]
    words = np.zeros((4, len(ints)), dtype=np.uint32)
    for i, x in enumerate(ints):
        for w in range(4):
            words[w, i] = (x >> (32 * w)) & 0xFFFFFFFF
    a = f128.from_uint32_words(np.asarray(words))
    b = f128.from_ints(np.asarray(_rand_felts(np_rng, len(ints)),
                                  dtype=object))
    assert _canon_eq(fp.mul(a, b), f128.mul(a, b))


def test_ntt_stages_bit_exact(np_rng):
    # fused all-stages NTT kernel vs the python-int oracle, fwd + inverse
    from zk_stark_project_tpu.ops import ntt

    n = 256
    vals = _rand_felts(np_rng, n)
    a = f128.from_ints(np.asarray(vals, dtype=object))
    assert f128.use_pallas()  # tpu backend => kernel path taken
    got_f = [int(x) for x in f128.to_ints(ntt.ntt(a))]
    assert got_f == ref.ntt(list(vals))
    got_i = [int(x) for x in f128.to_ints(ntt.ntt(a, inverse=True))]
    assert got_i == ref.ntt(list(vals), invert=True)
    # batched 2-column transform
    cols = [_rand_felts(np_rng, n), _rand_felts(np_rng, n)]
    a2 = f128.from_ints(np.asarray(cols, dtype=object))
    got2 = f128.to_ints(ntt.ntt(a2))
    assert all([int(x) for x in got2[i]] == ref.ntt(cols[i])
               for i in range(2))


def test_ntt_dif_kernel_bit_exact(np_rng):
    """DIF kernel: natural input -> bit-reversed output, vs the int oracle."""
    import random

    from zk_stark_project_tpu.ops import ntt

    r = random.Random(9)
    for logn in (7, 10):
        n = 1 << logn
        vals = [r.getrandbits(128) % ref.P for _ in range(n)]
        out = f128.to_ints(ntt._dif(f128.from_ints(vals), logn, False))
        want = ref.ntt(vals)
        revd = [want[int(i)] for i in ntt._bitrev_np(logn)]
        assert [int(v) for v in out] == revd


def test_ntt_dif_kernel_packed_rows(np_rng):
    """rows % 16 == 0 engages the packed roll-stage mul (two row-halves
    share one half-volume twiddle mul); must stay bit-exact."""
    import random

    from zk_stark_project_tpu.ops import ntt

    r = random.Random(13)
    logn, n, b = 10, 1024, 16          # rows = b = 16 -> packed path
    cols = [[r.getrandbits(128) % ref.P for _ in range(n)]
            for _ in range(b)]
    x = f128.from_ints(np.asarray(cols, dtype=object))
    out = ntt._dif(x, logn, False)
    rev = ntt._bitrev_np(logn)
    for i in range(b):
        want = ref.ntt(list(cols[i]))
        assert [int(v) for v in f128.to_ints(out[:, i])] == \
            [want[int(j)] for j in rev]


def test_ntt_dif_kernel_fused_scale(np_rng):
    """The fused input-scale operand (four-step mid twiddle) matches an
    explicit pre-multiply."""
    import random

    import jax.numpy as jnp

    from zk_stark_project_tpu.ops import ntt

    r = random.Random(11)
    logn, n, b = 8, 256, 4
    vals = [[r.getrandbits(128) % ref.P for _ in range(n)] for _ in range(b)]
    sc = [[r.getrandbits(128) % ref.P for _ in range(n)] for _ in range(2)]
    x = f128.from_ints(np.asarray(vals, dtype=object))
    s = f128.from_ints(np.asarray(sc, dtype=object))
    fused = ntt._dif(x, logn, False, scale=s)
    explicit = ntt._dif(
        f128.mul(x, jnp.tile(s, (1, 2, 1))), logn, False)
    assert _canon_eq(fused, explicit)
