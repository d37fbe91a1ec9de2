"""Validate + time the Pallas f128 kernels on real TPU hardware.

    python -m zk_stark_project_tpu.analytics.validate_pallas

Checks bit-exactness vs the jnp limb path across value ranges and batch
shapes, then reports blocked per-op timings (which, on a tunneled chip,
include the host<->device roundtrip — treat them as upper bounds).
"""

from __future__ import annotations

import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ..ops import f128
    from ..ops import f128_pallas as fp
    from ..ops import f128_ref as ref

    print(f"backend: {jax.default_backend()}, "
          f"pallas available: {fp.available()}")
    if not fp.available():
        print("pallas unavailable on this backend — nothing to validate")
        return 1

    rng = np.random.default_rng(7)

    def felts(n):
        return f128.from_ints(np.asarray(
            [int(rng.integers(0, 2 ** 62)) * int(rng.integers(0, 2 ** 60))
             % ref.P for _ in range(n)], dtype=object))

    def check(name, got, want):
        ok = bool((f128.canon(got) == f128.canon(want)).all())
        print(f"  {name}: {'OK' if ok else 'MISMATCH'}")
        assert ok, name

    a, b, c = felts(2048), felts(2048), felts(2048)
    edge = f128.from_ints(np.asarray(
        [0, 1, ref.P - 1, 2 ** 127, 2 ** 64, ref.P - 2 ** 40] * 4,
        dtype=object))
    print("bit-exactness:")
    check("mul", fp.mul(a, b), f128.mul(a, b))
    check("mul edge", fp.mul(edge, edge), f128.mul(edge, edge))
    check("mul_add", fp.mul_add(a, b, c), f128.add(f128.mul(a, b), c))
    check("pow7", fp.pow7(a), f128.pow_const(a, 7))
    a2 = a[:, :60].reshape(8, 6, 10)
    b2 = b[:, :60].reshape(8, 6, 10)
    check("2d batch", fp.mul(a2, b2), f128.mul(a2, b2))

    n = 1 << 20
    big_a = jax.random.randint(jax.random.PRNGKey(0), (8, n), 0, 1 << 16,
                               dtype=jnp.int32).astype(jnp.uint32)
    big_b = jax.random.randint(jax.random.PRNGKey(1), (8, n), 0, 1 << 16,
                               dtype=jnp.int32).astype(jnp.uint32)
    print(f"timings at n=2^20 (blocked; includes transport):")
    for name, fn, args in [
            ("jnp mul", f128.mul, (big_a, big_b)),
            ("pallas mul", fp.mul, (big_a, big_b)),
            ("pallas pow7", fp.pow7, (big_a,)),
            ("pallas mul_add", fp.mul_add, (big_a, big_b, big_b))]:
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(5):
            jax.block_until_ready(fn(*args))
        dt = (time.perf_counter() - t0) / 5
        print(f"  {name:15s} {dt * 1e3:8.2f} ms  "
              f"({n / dt / 1e9:6.2f} Gop/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
