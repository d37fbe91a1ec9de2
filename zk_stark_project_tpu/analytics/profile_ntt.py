"""Four-step NTT component profile — where does the 2^20/2^24 transform
spend its time on the chip?

Times each pass of `ops/ntt._four_step` separately (warm, slope of k
chained iterations inside one executable so the tunnel RTT cancels):

  * inner Pallas stage kernel (`f128_pallas.ntt_stages`) per half
  * bit-reverse gather (`jnp.take`)
  * mid twiddle table build (`poly.powers_of_b`)
  * mid twiddle multiply
  * transpose (swapaxes copy)
  * the full `ntt.ntt` for reference

Usage:  python -m zk_stark_project_tpu.analytics.profile_ntt [log2_n ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import f128, f128_pallas as fp, f128_ref as ref, ntt
from ..prover import poly


def _timeit(fn, *args, reps: int = 5):
    jax.block_until_ready(fn(*args))   # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _chained(fn, k: int):
    """fn chained k times inside one jit (RTT cancels in the slope)."""

    @jax.jit
    def run(x):
        for _ in range(k):
            x = fn(x)
        return x

    return run


def profile(logn: int) -> None:
    n = 1 << logn
    l1 = min(logn - logn // 2, 12)
    l2 = logn - l1
    n1, n2 = 1 << l1, 1 << l2
    rng = np.random.default_rng(0)
    x = f128.from_ints(np.asarray(
        rng.integers(0, 2 ** 62, size=n), dtype=object))
    k = 4 if logn >= 22 else 8

    t_full1 = _timeit(_chained(lambda v: ntt.ntt(v), 1), x)
    t_full2 = _timeit(_chained(lambda v: ntt.ntt(v), k + 1), x)
    t_full = (t_full2 - t_full1) / k
    bfs = (n // 2) * logn
    print(f"n=2^{logn}: full NTT {t_full * 1e3:8.3f} ms   "
          f"{bfs / t_full / 1e9:6.2f} G butterflies/s")

    xm = x.reshape(8, n1, n2)

    def inner(v):  # the two half-transforms as used by _four_step
        return ntt.ntt(v)

    t1 = _timeit(_chained(inner, 1), xm)
    t2 = _timeit(_chained(inner, k + 1), xm)
    print(f"  inner ntt (batch {n1} x {n2}):      {(t2 - t1) / k * 1e3:8.3f} ms")

    rev = jnp.asarray(ntt._bitrev_np(l2))

    def gather(v):
        return jnp.take(v, rev, axis=-1)

    t1 = _timeit(_chained(gather, 1), xm)
    t2 = _timeit(_chained(gather, k + 1), xm)
    print(f"  bitrev gather:                  {(t2 - t1) / k * 1e3:8.3f} ms")

    stages_tw, stages_mask = ntt._stage_tables(l2, False)
    tw_j = jnp.asarray(stages_tw)
    mask_j = jnp.asarray(stages_mask)

    def stages_only(v):
        return fp.ntt_stages(v.reshape(8, -1, n2), tw_j, mask_j).reshape(v.shape)

    if fp.available() and fp.ntt_supported(l2, n1):
        t1 = _timeit(_chained(stages_only, 1), xm)
        t2 = _timeit(_chained(stages_only, k + 1), xm)
        print(f"  pallas stage kernel only (DIT): {(t2 - t1) / k * 1e3:8.3f} ms")

        def dif_only(v):
            return ntt._dif(v, l2, False)

        t1 = _timeit(_chained(dif_only, 1), xm)
        t2 = _timeit(_chained(dif_only, k + 1), xm)
        print(f"  pallas stage kernel only (DIF): {(t2 - t1) / k * 1e3:8.3f} ms")

    w_pows = ntt._offset_powers(l2, ntt._root_int(logn, False), False)

    @jax.jit
    def tw_build(v):
        tw = poly.powers_of_b(jnp.asarray(w_pows), n1)
        return f128.mul(v, jnp.swapaxes(tw, -1, -2))

    t_tw = _timeit(tw_build, xm)
    print(f"  twiddle build+mul (1 dispatch):  {t_tw * 1e3:8.3f} ms")

    def transpose(v):
        return jnp.swapaxes(v, -1, -2).reshape(v.shape)

    t1 = _timeit(_chained(transpose, 1), xm)
    t2 = _timeit(_chained(transpose, k + 1), xm)
    print(f"  transpose copy:                 {(t2 - t1) / k * 1e3:8.3f} ms")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [20, 24]
    for s in sizes:
        profile(s)
