"""AOT warm-start cache (`prover/aot.py`) — artifact round trip on CPU.

On the real TPU the wrapper activates automatically; here we force-enable
it against a temp dir and check the behaviors that matter: export-on-miss,
deserialize-on-hit (bit-identical result without re-tracing the live
function), key separation by static config / shapes, pytree arguments
(the fused prover passes dicts and tuples of arrays), and the disabled
passthrough.  The fused-prover wiring itself is exercised bit-exactly on
the TPU bench (every proof is verified) and by `tests/test_fused_prove.py`.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from zk_stark_project_tpu.prover import aot


@pytest.fixture
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "enabled", lambda: True)
    aot._resolve_cached.cache_clear()
    yield tmp_path
    aot._resolve_cached.cache_clear()


def test_aot_export_then_load(aot_env):
    live_traces = []

    @jax.jit
    def f(x):
        live_traces.append(1)
        return x * jnp.uint32(3) + jnp.uint32(1)

    x = jnp.arange(8, dtype=jnp.uint32)
    y1 = aot.call("t_roundtrip", ("cfg",), f, x)
    files = [p for p in os.listdir(aot_env) if p.endswith(".jaxexp")]
    assert len(files) == 1 and files[0].startswith("t_roundtrip-")
    assert live_traces, "first call must trace the live fn to export it"

    # fresh resolution state (simulates a new process): must load the
    # artifact, not re-trace the live function
    aot._resolve_cached.cache_clear()
    live_traces.clear()
    y2 = aot.call("t_roundtrip", ("cfg",), f, x)
    assert not live_traces, "artifact hit must not re-trace the live fn"
    assert jnp.array_equal(y1, y2)


def test_aot_pytree_args(aot_env):
    """Dict + tuple-of-array args, multi-output — the dispatch-A shape."""
    @jax.jit
    def f(params, pair):
        a, b = pair
        return {"s": params["w"] + a}, (b * jnp.uint32(2), b)

    params = {"w": jnp.arange(4, dtype=jnp.uint32)}
    pair = (jnp.ones((4,), jnp.uint32), jnp.full((2,), 7, jnp.uint32))
    out1 = aot.call("t_tree", (), f, params, pair)
    aot._resolve_cached.cache_clear()
    out2 = aot.call("t_tree", (), f, params, pair)
    assert jnp.array_equal(out1[0]["s"], out2[0]["s"])
    assert jnp.array_equal(out1[1][0], out2[1][0])
    assert jnp.array_equal(out1[1][1], out2[1][1])


def test_aot_key_separation(aot_env):
    @jax.jit
    def f(x):
        return x + jnp.uint32(1)

    x = jnp.arange(4, dtype=jnp.uint32)
    aot.call("t_keys", ("a",), f, x)
    aot.call("t_keys", ("b",), f, x)          # different static config
    aot.call("t_keys", ("a",), f, x[:2])      # different shape
    files = [p for p in os.listdir(aot_env) if p.startswith("t_keys-")]
    assert len(files) == 3


def test_aot_corrupt_artifact_falls_back(aot_env):
    """A truncated/garbage artifact must re-export, not crash."""
    @jax.jit
    def f(x):
        return x * jnp.uint32(5)

    x = jnp.arange(4, dtype=jnp.uint32)
    y1 = aot.call("t_corrupt", (), f, x)
    (name,) = [p for p in os.listdir(aot_env) if p.startswith("t_corrupt-")]
    with open(os.path.join(aot_env, name), "wb") as fh:
        fh.write(b"not a jax export")
    aot._resolve_cached.cache_clear()
    y2 = aot.call("t_corrupt", (), f, x)
    assert jnp.array_equal(y1, y2)


def test_aot_disabled_is_passthrough(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", str(tmp_path))
    monkeypatch.setenv("ZKSTARK_NO_AOT", "1")

    @jax.jit
    def f(x):
        return x - jnp.uint32(1)

    x = jnp.ones((4,), jnp.uint32)
    y = aot.call("t_off", (), f, x)
    assert jnp.array_equal(y, jnp.zeros((4,), jnp.uint32))
    assert not os.listdir(tmp_path)
