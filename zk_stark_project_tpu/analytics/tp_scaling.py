"""Tensor-parallel efficiency table: dntt + full `prove_tp` wall-clock
over 1/2/4/8-device meshes.

On a real slice the mesh axes map to chips over ICI; in this environment
only a virtual CPU mesh is available (one real TPU chip, no multi-chip),
so run with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m zk_stark_project_tpu.analytics.tp_scaling [--csv tp_scaling.csv]

CAVEAT recorded in the output: all virtual devices share the host's
physical cores, so wall-clock speedup is bounded by the real core count,
not by D — the `efficiency` column on a CPU mesh measures the overhead of
the sharded program (collectives, per-device dispatch), not chip scaling.
The comm-volume model for a real slice is `parallel/multihost.py::
dcn_dntt_plan`; per-phase collective counts are documented in
`parallel/tp_prove.py`.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List

import numpy as np


def _timeit(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_dntt(log2_n: int, reps: int, counts: List[int]) -> List[dict]:
    import jax
    from jax.sharding import Mesh

    from ..ops import f128
    from ..parallel import dntt

    rng = np.random.default_rng(0xBEEF)
    vals = f128.from_ints(np.asarray(
        rng.integers(0, 2 ** 62, size=1 << log2_n), dtype=object))
    rows, t1 = [], None
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]), ("tp",))
        dntt.dntt(vals, mesh, "tp").block_until_ready()
        t = _timeit(lambda: dntt.dntt(vals, mesh, "tp").block_until_ready(),
                    reps)
        t1 = t if t1 is None else t1
        rows.append({
            "section": "dntt", "backend": jax.default_backend(),
            "log2_n": log2_n, "devices": d, "seconds": round(t, 6),
            "speedup": round(t1 / t, 3),
            "efficiency": round(t1 / (d * t), 3),
        })
    return rows


def bench_prove_tp(reps: int, counts: List[int]) -> List[dict]:
    """End-to-end single-proof wall-clock vs mesh size (aggregation
    statement, fast options — the shape every phase can shard)."""
    import jax
    from jax.sharding import Mesh

    from ..models import aggregation as agg
    from ..models.ml_math import AC, FE
    from ..ops.signed import f64_to_felt
    from ..parallel.tp_prove import prove_tp
    from ..prover import fast_options, prove

    np_rng = np.random.default_rng(0xC0FFEE)
    gw = [[int(np_rng.integers(0, 10 ** 9)) for _ in range(FE)]
          for _ in range(AC)]
    gb = [int(np_rng.integers(0, 10 ** 9)) for _ in range(AC)]
    lw = [[[int(np_rng.integers(0, 10 ** 9)) for _ in range(FE)]
           for _ in range(AC)] for _ in range(8)]
    lb = [[int(np_rng.integers(0, 10 ** 9)) for _ in range(AC)]
          for _ in range(8)]
    p = agg.GlobalUpdateProver(fast_options(), gw, gb, lw, lb,
                               f64_to_felt(8.0), rng=np_rng)
    air = p.air()
    trace = p.build_trace()
    rows, t1 = [], None
    for d in counts:
        if d == 1:
            prove(air, trace)
            t = _timeit(lambda: prove(air, trace), reps)
        else:
            mesh = Mesh(np.array(jax.devices()[:d]), ("tp",))
            prove_tp(air, trace, mesh)
            t = _timeit(lambda: prove_tp(air, trace, mesh), reps)
        t1 = t if t1 is None else t1
        rows.append({
            "section": "prove_tp", "backend": jax.default_backend(),
            "statement": "aggregation", "devices": d,
            "seconds": round(t, 6),
            "speedup": round(t1 / t, 3),
            "efficiency": round(t1 / (d * t), 3),
        })
    return rows


def main(argv=None) -> int:
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--log2n", type=int, default=16)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--csv", default="tp_scaling.csv")
    parser.add_argument("--skip-prove", action="store_true")
    args = parser.parse_args(argv)

    n_avail = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8) if d <= n_avail]
    rows = bench_dntt(args.log2n, args.reps, counts)
    for r in rows:
        print(json.dumps(r), flush=True)
    if not args.skip_prove:
        prows = bench_prove_tp(args.reps, counts)
        rows += prows
        for r in prows:
            print(json.dumps(r), flush=True)

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
