"""Speed-of-light / MFU-style utilization analysis for the NTT hot path.

BASELINE.md's north star is "NTT butterflies/s/chip at speed-of-light".
This tool derives that ceiling EMPIRICALLY rather than from spec sheets:

  1. measure the chip's sustained elementwise uint32 multiply-add rate
     (the VPU integer peak that limb arithmetic can actually reach —
     a pure `a*b+c` stream on a VMEM-resident block, no memory games);
  2. count the integer ops one f128 butterfly costs via XLA cost
     analysis of the compiled butterfly kernel (mul + add + sub on
     8x16-bit limbs, lazy reduction);
  3. speed_of_light = peak_ops / ops_per_butterfly, and
     utilization = measured_butterflies_per_s / speed_of_light.

Run on the real chip:

    python -m zk_stark_project_tpu.analytics.speed_of_light [--reps 5]

Prints JSON lines and appends to SPEED.md-ready CSV (see `--csv`).
The reference records no equivalent numbers at all (BASELINE.md: its only
figures are ETA estimates in `batch_automation.py:37-38`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Optional

import numpy as np


def _timeit(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_rtt(reps: int = 9) -> float:
    """Median dispatch+sync round trip for a trivial executable — the
    latency floor every phase pays (large on a tunneled chip)."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.uint32)
    f = jax.jit(lambda v: v + 1)
    np.asarray(f(x))
    return _timeit(lambda: np.asarray(f(x)), reps)


def measure_u32_peak(reps: int = 5, log2_n: int = 22,
                     k_rounds: int = 2048) -> dict:
    """Sustained uint32 multiply-add rate on a compute-bound stream.

    Chains k_rounds dependent mul+add rounds over an n-element block, so
    the VPU work (2*k*n ops) dwarfs both the single HBM pass and the
    dispatch round trip; the result is fetched (4-byte reduction) to
    force completion.  The RTT baseline is subtracted."""
    import jax
    import jax.numpy as jnp

    n = 1 << log2_n
    # keep the k2-k1 work delta >= ~2^35 ops regardless of block size:
    # tunnel RTT jitter is +-ms, so a small-n probe with the default round
    # count degenerates to noise (observed 10x-inflated "peak" at 2^20)
    k_rounds = max(k_rounds, k_rounds * ((1 << 24) >> log2_n))

    @jax.jit
    def chain(a, b, k):
        # dynamic trip count: one compile, RTT cancels in the two-point
        # slope; inner 8-round body keeps loop overhead negligible
        def body(i, x):
            for _ in range(8):
                x = x * b + a
            return x
        return jax.lax.fori_loop(0, k, body, a).sum()

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(1, 2 ** 31, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(1, 2 ** 31, size=n, dtype=np.uint32))
    np.asarray(chain(a, b, 2))
    rtt = measure_rtt()
    k1, k2 = 8, 8 + max(64, k_rounds // 8)
    t1 = _timeit(lambda: np.asarray(chain(a, b, k1)), reps)
    t2 = _timeit(lambda: np.asarray(chain(a, b, k2)), reps)
    t = max((t2 - t1) / (k2 - k1), 1e-9)     # seconds per 8-round body
    ops = 2 * 8 * n                 # one mul + one add per round per elem
    return {
        "section": "u32_peak",
        "backend": jax.default_backend(),
        "elements": n, "rounds_per_body": 8,
        "seconds": round(t, 6),
        "rtt_seconds": round(rtt, 6),
        "u32_ops_per_s": round(ops / t, 1),
    }


def butterfly_op_cost() -> dict:
    """Integer-op count of one radix-2 f128 butterfly via XLA cost
    analysis of the compiled kernel (mul by twiddle + add + sub)."""
    import jax

    from ..ops import f128

    def butterfly(lo, hi, tw):
        prod = f128.mul(hi, tw)
        return f128.add(lo, prod), f128.sub(lo, prod)

    n = 1 << 12
    rng = np.random.default_rng(3)
    args = [f128.from_ints(np.asarray(
        rng.integers(0, 2 ** 62, size=n), dtype=object)) for _ in range(3)]
    lowered = jax.jit(butterfly).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # some backends return a per-computation list
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    return {
        "section": "butterfly_cost",
        "elements": n,
        "xla_flops_total": flops,
        "ops_per_butterfly": round(flops / n, 1) if flops else None,
    }


def device_ntt_seconds(vals, reps: int, body=None, per_iter: int = 1):
    """(device seconds per transform, single-dispatch seconds, (k1, k2)).

    Uses a dynamic-trip-count fori_loop chain — ONE compile, any k — and
    the two-point slope (t(k2) - t(k1)) / (k2 - k1), which cancels the
    dispatch round trip entirely (tunnel RTT jitter is tens of ms —
    bigger than small-n device work, so absolute single-dispatch times
    are unusable for throughput).  `body`: optional per-iteration
    function (default one natural-order `ntt.ntt`); `per_iter` =
    transforms per body call (divides the slope)."""
    import jax

    from ..ops import ntt

    if body is None:
        body = ntt.ntt

    @jax.jit
    def chained(x, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: body(v), x)
        return out[:, :1]

    np.asarray(chained(vals, 2))
    t1 = _timeit(lambda: body(vals).block_until_ready(), reps)
    k1 = 8
    t_k1 = _timeit(lambda: np.asarray(chained(vals, k1)), reps)
    est = max((t_k1 / k1) / 4, 2e-6)     # rough per-transform floor
    k2 = k1 + int(min(4096, max(64, 0.5 / est)))
    t_k2 = _timeit(lambda: np.asarray(chained(vals, k2)), reps)
    t = max((t_k2 - t_k1) / (k2 - k1) / per_iter, 1e-9)
    return t, t1, (k1, k2)


def ntt_utilization(log2_n: int, reps: int, peak_ops: float,
                    ops_per_bfly: Optional[float],
                    bitrev: bool = False) -> dict:
    """Measured butterflies/s vs the derived speed-of-light ceiling.

    With `bitrev`, measures the PROVER's convention instead: one
    iteration = `ntt_bitrev(x, inverse=True)` then `ntt_from_bitrev` —
    the permutation-free round trip every LDE/commit pass runs — at two
    transforms per iteration."""
    import jax

    from ..ops import f128, ntt as _ntt

    n = 1 << log2_n
    rng = np.random.default_rng(11)
    vals = f128.from_ints(np.asarray(
        rng.integers(0, 2 ** 62, size=n), dtype=object))
    if bitrev:
        body = lambda v: _ntt.ntt_from_bitrev(_ntt.ntt_bitrev(v, True))
        t, t1, (k1, k2) = device_ntt_seconds(vals, reps, body, per_iter=2)
    else:
        t, t1, (k1, k2) = device_ntt_seconds(vals, reps)
    bfly = (n // 2) * log2_n
    rate = bfly / t
    out = {
        "section": "ntt_bitrev_utilization" if bitrev else "ntt_utilization",
        "backend": jax.default_backend(),
        "log2_n": log2_n,
        "chain": [k1, k2],
        "seconds": round(t, 6),
        "dispatch_seconds": round(t1, 6),
        "butterflies_per_s": round(rate, 1),
    }
    if ops_per_bfly and peak_ops:
        sol = peak_ops / ops_per_bfly
        out["speed_of_light_bfly_per_s"] = round(sol, 1)
        out["utilization"] = round(rate / sol, 4)
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--sizes", type=int, nargs="*", default=[16, 20])
    parser.add_argument("--peak-log2n", type=int, default=24)
    parser.add_argument("--csv", default=None)
    args = parser.parse_args(argv)

    rows = []
    peak = measure_u32_peak(args.reps, args.peak_log2n)
    rows.append(peak)
    cost = butterfly_op_cost()
    rows.append(cost)
    for logn in args.sizes:
        rows.append(ntt_utilization(logn, args.reps,
                                    peak["u32_ops_per_s"],
                                    cost["ops_per_butterfly"]))
        rows.append(ntt_utilization(logn, args.reps,
                                    peak["u32_ops_per_s"],
                                    cost["ops_per_butterfly"],
                                    bitrev=True))
    for r in rows:
        print(json.dumps(r))
    if args.csv:
        import csv
        import os
        fields = sorted({k for r in rows for k in r})
        exists = os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            if not exists:
                w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
