"""Per-phase wall-clock breakdown of one STARK prove() — perf triage tool.

Runs the training and aggregation statements at reference options with
phase-level timers (device work is block_until_ready'd at each boundary so
the numbers are honest).  Use on the real TPU:

    python -m zk_stark_project_tpu.analytics.profile_prove [--bs N] [--reps R]

The phase split mirrors `prover/stark.py::prove`.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _phase_timed(air, trace):
    """Instrumented copy of prove()'s phase structure (timings only)."""
    import jax.numpy as jnp

    from ..ops import f128, merkle
    from ..ops import f128_ref as ref
    from ..ops import ntt
    from ..prover import fri, poly
    from ..prover.stark import (ProverChannel, build_composition_columns,
                                build_deep_evals, commit_rows,
                                find_pow_nonce, open_rows)

    opts = air.options
    n = air.trace_length
    w = air.trace_width
    big_n = air.lde_domain_size
    log2_big = big_n.bit_length() - 1
    offset = air.domain_offset
    g = air.trace_domain_generator
    m = air.num_composition_columns

    t = {}

    def mark(name, t0):
        t[name] = t.get(name, 0.0) + (time.perf_counter() - t0)

    t0 = time.perf_counter()
    channel = ProverChannel(air)
    mark("0:init_transcript", t0)

    t0 = time.perf_counter()
    trace_polys = ntt.interpolate(trace.data)
    lde = ntt.coset_evaluate(trace_polys, offset, opts.blowup_factor)
    lde.block_until_ready()
    mark("1:lde", t0)

    t0 = time.perf_counter()
    trace_tree = commit_rows(lde)
    trace_root = trace_tree.root_bytes()
    channel.reseed_root(trace_root)
    mark("2:trace_commit", t0)

    t0 = time.perf_counter()
    num_constraints = air.num_transition_constraints + len(air.get_assertions())
    alphas = channel.coin.draw_coefficients(num_constraints, opts.batching)
    comp_cols = build_composition_columns(air, trace_polys, alphas)
    comp_lde = ntt.coset_evaluate(comp_cols, offset, opts.blowup_factor)
    comp_lde.block_until_ready()
    mark("3:composition", t0)

    t0 = time.perf_counter()
    comp_tree = commit_rows(comp_lde)
    channel.reseed_root(comp_tree.root_bytes())
    mark("4:comp_commit", t0)

    t0 = time.perf_counter()
    from ..prover.stark import _ood_eval3
    import jax
    z = channel.coin.draw()
    zg = (z * g) % ref.P
    e_cur, e_nxt, e_comp = jax.device_get(_ood_eval3(
        trace_polys, comp_cols, f128.from_int(z), f128.from_int(zg)))
    ood_cur = [int(x) for x in f128.to_ints(e_cur)]
    ood_nxt = [int(x) for x in f128.to_ints(e_nxt)]
    channel.reseed_elements(ood_cur + ood_nxt)
    ood_comp = [int(x) for x in f128.to_ints(e_comp)]
    channel.reseed_elements(ood_comp)
    mark("5:ood", t0)

    t0 = time.perf_counter()
    deep_coeffs = channel.coin.draw_coefficients(2 * w + m, opts.batching)
    deep = build_deep_evals(lde, comp_lde, deep_coeffs, z, zg,
                            ood_cur, ood_nxt, ood_comp, log2_big, offset)
    deep.block_until_ready()
    mark("6:deep", t0)

    t0 = time.perf_counter()
    fri_prover = fri.FriProver(opts.fri_folding_factor,
                               opts.fri_remainder_max_degree)
    fri_layers, fri_remainder = fri_prover.build_layers(
        channel, deep, offset, n)
    mark("7:fri", t0)

    t0 = time.perf_counter()
    pow_nonce = find_pow_nonce(channel.coin, opts.grinding_bits)
    channel.coin.reseed_with_int(pow_nonce)
    positions = channel.coin.draw_integers(opts.num_queries, big_n)
    mark("8:grinding", t0)

    t0 = time.perf_counter()
    open_rows(lde, trace_tree, positions)
    open_rows(comp_lde, comp_tree, positions)
    fri_prover.open_queries(fri_layers, positions)
    mark("9:openings", t0)

    return t


def profile(bs: int = 1, reps: int = 2, verbose: bool = True):
    import tempfile

    from ..models import ml_math
    from ..models.ml_math import AC, FE
    from ..models.training import TrainingUpdateProver
    from ..ops.signed import f64_to_felt
    from ..prover.options import REFERENCE_OPTIONS
    from ..utils.data import create_synthetic_device_data, discover_devices

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        create_synthetic_device_data(d, num_devices=1, rows=60, seed=11)
        dev = discover_devices(d, rng=np.random.default_rng(5))[0]

    opts = REFERENCE_OPTIONS
    results = []
    for rep in range(reps):
        host_feats, host_labs = dev.next_batch(50)
        zk_feats = [[f64_to_felt(v) for v in row] for row in host_feats[:bs]]
        zk_labs = [ml_math.label_to_one_hot(l, AC, 1e6)
                   for l in host_labs[:bs]]
        w, ws, b, bsn = ml_math.generate_initial_model(FE, AC, 1.0, rng)
        tp = TrainingUpdateProver(
            opts, w, b, ws, bsn, zk_feats, [[0] * FE for _ in range(bs)],
            zk_labs, f64_to_felt(0.0001), f64_to_felt(1e6), bs, rng=rng)
        trace = tp.build_trace()
        air = tp.air()
        t = _phase_timed(air, trace)
        results.append(t)
        if verbose:
            total = sum(t.values())
            print(f"--- training rep {rep} (trace {air.trace_width}x"
                  f"{air.trace_length}, lde {air.lde_domain_size}): "
                  f"{total:.3f}s")
            for k in sorted(t):
                print(f"  {k:20s} {t[k]*1e3:8.1f} ms")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    profile(args.bs, args.reps)


if __name__ == "__main__":
    main()
