"""Multi-chip sharding tests on the virtual 8-device CPU mesh: distributed
four-step NTT (all-to-all butterfly exchange) vs the single-device NTT, and
data-parallel batched commitments vs per-trace commitments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from zk_stark_project_tpu.ops import f128, f128_ref as ref, ntt
from zk_stark_project_tpu.parallel import batch_prove, dntt


@pytest.fixture
def mesh8():
    devices = np.array(jax.devices()[:8])
    return Mesh(devices, ("tp",))


def test_dntt_matches_single_device(mesh8, np_rng):
    n = 1 << 8
    vals_int = [int(np_rng.integers(0, 2 ** 63)) for _ in range(n)]
    x = f128.from_ints(np.asarray(vals_int, dtype=object))
    expected = ntt.ntt(x)
    got = dntt.dntt_natural(x, mesh8, "tp")
    assert f128.to_ints(got).tolist() == f128.to_ints(expected).tolist()


def test_dntt_uneven_split(np_rng):
    # 4-device mesh, N1 != N2
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("tp",))
    n = 1 << 7
    vals_int = [int(np_rng.integers(0, 2 ** 63)) for _ in range(n)]
    x = f128.from_ints(np.asarray(vals_int, dtype=object))
    expected = ntt.ntt(x)
    got = dntt.dntt_natural(x, mesh, "tp")
    assert f128.to_ints(got).tolist() == f128.to_ints(expected).tolist()


def test_batched_commit_matches_sequential(np_rng):
    from zk_stark_project_tpu.prover.stark import commit_rows

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("dp",))
    c, w, n = 4, 6, 16
    traces_int = np_rng.integers(0, 2 ** 62, size=(c, w, n))
    traces = jnp.stack([
        f128.from_ints(np.asarray(traces_int[i], dtype=object))
        for i in range(c)])
    lde, roots = batch_prove.batched_commit(traces, ref.GENERATOR, 4, mesh,
                                            "dp")
    assert lde.shape == (c, 8, w, n * 4)
    for i in range(c):
        polys = ntt.interpolate(traces[i])
        expect_lde = ntt.coset_evaluate(polys, ref.GENERATOR, 4)
        tree = commit_rows(expect_lde)
        assert np.asarray(roots[i]).tolist() == tree.root.tolist()
