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


# ---------------------------------------------------------------------------
# Multi-host plumbing (single-process degradation path)
# ---------------------------------------------------------------------------


def test_multihost_single_process_degrades():
    """With no coordinator configured, initialize() must not start a
    distributed service and must report the local device set."""
    import os

    from zk_stark_project_tpu.parallel import multihost

    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        assert k not in os.environ, f"test env leaked {k}"
    info = multihost.initialize()
    assert info.enabled is False
    assert info.num_processes == 1 and info.process_id == 0
    assert info.global_device_count == len(jax.devices())
    assert info.local_device_count == len(jax.local_devices())


def test_multihost_global_mesh_shape():
    from zk_stark_project_tpu.parallel import multihost

    mesh = multihost.global_mesh(tp=4)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.shape["tp"] == 4
    assert mesh.shape["dp"] * mesh.shape["tp"] == len(jax.devices())
    # default tp = local device count; single-host -> dp == 1
    full = multihost.global_mesh()
    assert full.shape["tp"] == len(jax.local_devices())
    assert full.shape["dp"] == 1


def test_multihost_requested_flag(monkeypatch):
    from zk_stark_project_tpu.parallel import multihost

    assert multihost.requested(True)
    assert not multihost.requested(False)
    monkeypatch.setenv("ZKSTARK_MULTIHOST", "1")
    assert multihost.requested(False)


def test_dcn_dntt_plan_volumes():
    """The DCN four-step plan's byte accounting: one all-to-all crossing
    hosts, everything else local/ICI."""
    from zk_stark_project_tpu.parallel import multihost

    plan = multihost.dcn_dntt_plan(log2_n=24, hosts=4, chips_per_host=4)
    n_bytes = (1 << 24) * 16
    assert plan["devices"] == 16
    assert plan["local_bytes_per_chip"] == n_bytes // 16
    assert 0 < plan["dcn_bytes_per_host"] < n_bytes
    single = multihost.dcn_dntt_plan(log2_n=20, hosts=1, chips_per_host=8)
    assert single["dcn_bytes_per_host"] == 0


@pytest.mark.slow
def test_multihost_two_process_commit():
    """REAL 2-process `jax.distributed` run: spawn two CPU processes that
    form a 4-device global mesh, run a dp-sharded commit with the client
    axis split ACROSS processes, and replicate the roots back through a
    cross-process collective (round-3 verdict: `parallel/multihost.py` had
    never executed with >1 process)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST OK pid={i} procs=2 devices=4" in out, out[-1500:]
