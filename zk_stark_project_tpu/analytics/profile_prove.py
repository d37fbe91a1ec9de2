"""Per-phase wall-clock breakdown of proving — perf triage tool.

Times every fused prover phase (`prover/phases.py`) with blocking
boundaries, for the training statement (batched across 8 devices, like the
CLI) and the aggregation statement.  Use on the real TPU:

    python -m zk_stark_project_tpu.analytics.profile_prove [--bs N] [--reps R]

Output distinguishes device-phase time (executable run + transfer sync)
from host time (Fiat–Shamir transcript, proof assembly, python-int
conversions).
"""

from __future__ import annotations

import argparse
import contextlib
import time

import numpy as np

_PHASES = ("trace_lde_commit", "composition_commit", "ood_eval",
           "deep_fri0", "fri_fold_commit", "fri_fold_final",
           "pow_search", "gather_openings")


@contextlib.contextmanager
def timed_phases(times: dict):
    """Wrap every prover phase with a blocking timer accumulating into
    `times` (phase name -> seconds).  Restores the originals on exit."""
    import jax

    import zk_stark_project_tpu.prover.batch as batch
    import zk_stark_project_tpu.prover.phases as ph

    originals = {}

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            times[name] = times.get(name, 0.0) + time.perf_counter() - t0
            return out
        return inner

    for name in _PHASES:
        originals[name] = getattr(ph, name)
        setattr(batch.phases, name, wrap(name, originals[name]))
    try:
        yield times
    finally:
        for name, fn in originals.items():
            setattr(batch.phases, name, fn)


def profile(bs: int = 1, reps: int = 3, devices_n: int = 8, verbose=True):
    import tempfile

    from ..cli import _build_aggregator, _make_training_prover
    from ..models.training import build_traces_stacked, fetch_boundaries
    from ..ops import f128
    from ..prover import phases, prove
    from ..prover.batch import prove_many
    from ..prover.options import REFERENCE_OPTIONS
    from ..utils.data import create_synthetic_device_data, discover_devices

    with tempfile.TemporaryDirectory() as d:
        create_synthetic_device_data(d, num_devices=devices_n, rows=60,
                                     seed=11)
        devs = discover_devices(d, rng=np.random.default_rng(5))

    opts = REFERENCE_OPTIONS
    results = []
    rng = np.random.default_rng(0)
    for rep in range(reps):
        provers = [_make_training_prover(dev, bs, opts, rng, False, i)
                   for i, dev in enumerate(devs)]
        t_b0 = time.perf_counter()
        if phases.use_fused():
            stacked = build_traces_stacked(provers)
        else:
            import jax.numpy as jnp
            stacked = jnp.stack([tp.build_trace().data for tp in provers],
                                axis=1)
        fetch_boundaries(provers, stacked)
        traces = [tp.build_trace() for tp in provers]
        airs = [tp.air() for tp in provers]
        t_build = time.perf_counter() - t_b0

        times = {}
        with timed_phases(times):
            t0 = time.perf_counter()
            proofs = prove_many(airs, traces)
            train_total = time.perf_counter() - t0

        agg_times = {}
        reps_list = [tp.client_rep() for tp in provers]
        agg = _build_aggregator(reps_list, opts, rng)
        air = agg.air()
        tr = agg.build_trace()
        with timed_phases(agg_times):
            t0 = time.perf_counter()
            prove(air, tr)
            agg_total = time.perf_counter() - t0

        entry = {"build": t_build, "train_total": train_total,
                 "agg_total": agg_total, "train": dict(times),
                 "agg": dict(agg_times)}
        results.append(entry)
        if verbose:
            dev_t = sum(times.values())
            print(f"--- rep {rep}: build x{devices_n} {t_build:.3f}s | "
                  f"train prove {train_total:.3f}s "
                  f"(device {dev_t:.3f}s, host {train_total - dev_t:.3f}s)"
                  f" | agg prove {agg_total:.3f}s")
            for k in sorted(times):
                print(f"  train {k:20s} {times[k] * 1e3:8.1f} ms")
            for k in sorted(agg_times):
                print(f"  agg   {k:20s} {agg_times[k] * 1e3:8.1f} ms")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()
    profile(args.bs, args.reps, args.devices)


if __name__ == "__main__":
    main()
