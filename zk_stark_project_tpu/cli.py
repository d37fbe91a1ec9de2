"""CLI driver — the reference binary's contract (`src/main.rs:56-74`):

    python -m zk_stark_project_tpu --step {setup|witness|proof} \
        --data-dir DIR --bs N [--verbose] [--seed S]

Same 3-step workflow and the same machine-parseable output lines the
benchmark harness greps ("Proof size: N bytes" etc., `src/main.rs:241,474,
489-491` parsed by `verification/time_memory_analytics/analyze.py:476-482`).

Extra over the reference: `--seed` makes every RNG stream (batch sampling,
model init, masks, blinding) deterministic (SURVEY.md pin #4).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional

import numpy as np

from .models import ml_math
from .models.aggregation import GlobalUpdateProver
from .models.ml_math import AC, FE
from .models.training import TrainingUpdateProver
from .ops import f128_ref as ref
from .ops.signed import f64_to_felt
from .prover import REFERENCE_OPTIONS, ProofOptions, phases, prove
from .utils.data import EdgeDevice, discover_devices
from .verifier import verify

#: host-side sample size (`src/main.rs:77`).
SAMPLE_SIZE = 50


def _train_one_device(device: EdgeDevice, bs: int, options: ProofOptions,
                      rng: np.random.Generator, do_prove: bool,
                      verbose: bool, index: int):
    """One device's training statement: sample -> encode -> trace [-> prove
    -> verify].  Returns (client_rep, proof_size)."""
    tp = _make_training_prover(device, bs, options, rng, verbose, index)
    if tp is None:
        return None, 0
    t0 = time.time()
    trace = tp.build_trace()
    proof_size = 0
    if do_prove:
        air = tp.air()
        proof = prove(air, trace)
        proof_size = proof.size_bytes
        verify(air, proof)
        if verbose:
            print(f"Device {index + 1:>2}: ZK proof for {bs} samples: "
                  f"gen = {int((time.time() - t0) * 1000):>4}ms, "
                  f"size = {proof_size} bytes")
            print(f"Training proof size: {proof_size} bytes")
    # client rep = masked cell (0, last) (`src/main.rs:260`)
    client_rep = trace.get(0, trace.length - 1)
    return client_rep, proof_size


def _make_training_prover(device: EdgeDevice, bs: int, options: ProofOptions,
                          rng: np.random.Generator, verbose: bool,
                          index: int, air_version: str = "v1"
                          ) -> Optional[TrainingUpdateProver]:
    """Sample + encode one device's batch and build its training prover
    (draws masks — call in device order to keep the RNG stream stable).

    `air_version`: "v1" = the reference-faithful masked AIR with inert
    transitions (SURVEY.md pin #3); "v2" = the sound SGD AIR with private
    in-trace sample data (`models/training_v2.py`), natural encoding."""
    host_feats, host_labs = device.next_batch(SAMPLE_SIZE)
    if len(host_feats) < bs:
        if verbose:
            print(f"Warning: Device {index + 1} has fewer samples than "
                  f"ZK batch size", file=sys.stderr)
        return None
    zk_feats = [[f64_to_felt(v) for v in row] for row in host_feats[:bs]]
    zk_labs = [ml_math.label_to_one_hot(l, AC, 1e6) for l in host_labs[:bs]]
    zk_feats_sign = [[0] * FE for _ in range(bs)]
    w, ws, b, bsn = ml_math.generate_initial_model(FE, AC, 1.0, rng)
    lr = f64_to_felt(0.0001)
    pr = f64_to_felt(1e6)
    if air_version == "v2":
        from .models.training_v2 import (TrainingUpdateV2Prover,
                                         signed_pair_to_natural)

        state = [signed_pair_to_natural(w[j][i], ws[j][i])
                 for j in range(AC) for i in range(FE)]
        state += [signed_pair_to_natural(b[j], bsn[j]) for j in range(AC)]
        return TrainingUpdateV2Prover(options, state, zk_feats, zk_labs,
                                      lr, pr, bs, rng=rng)
    return TrainingUpdateProver(options, w, b, ws, bsn, zk_feats,
                                zk_feats_sign, zk_labs, lr, pr, bs, rng=rng)


def _train_all_devices(devices: List[EdgeDevice], bs: int,
                       options: ProofOptions, rng: np.random.Generator,
                       do_prove: bool, verbose: bool):
    """All devices' training statements proved BATCHED (one set of device
    phases for the whole fleet, `prover/batch.py`).  Per-proof transcripts
    are bit-identical to the sequential path.  Returns (client_reps,
    total_proof_size)."""
    from .models.training import build_traces_stacked, fetch_boundaries
    from .ops import f128
    from .prover.batch import prove_many_chunked as prove_many

    provers, indices = [], []
    for i, dev in enumerate(devices):
        tp = _make_training_prover(dev, bs, options, rng, verbose, i)
        if tp is None:
            continue
        provers.append(tp)
        indices.append(i)

    if not provers:
        return [], 0
    if phases.use_fused():
        # one fused executable builds every device's trace; one transfer
        # pulls all boundary rows (client reps + pub inputs)
        stacked = build_traces_stacked(provers)
    else:
        # eager per-op chain (keeps XLA-CPU compile times sane)
        import jax.numpy as jnp
        stacked = jnp.stack([tp.build_trace().data for tp in provers],
                            axis=1)
    fetch_boundaries(provers, stacked)
    traces = [tp.build_trace() for tp in provers]

    client_reps = [tp.client_rep() for tp in provers]
    total_size = 0
    if do_prove and provers:
        t0 = time.time()
        airs = [tp.air() for tp in provers]
        proofs = prove_many(airs, traces)
        gen_ms = int((time.time() - t0) * 1000)
        for i, air, proof in zip(indices, airs, proofs):
            verify(air, proof)
            total_size += proof.size_bytes
            if verbose:
                print(f"Device {i + 1:>2}: ZK proof for {bs} samples: "
                      f"gen = {gen_ms // len(provers):>4}ms (batched), "
                      f"size = {proof.size_bytes} bytes")
                print(f"Training proof size: {proof.size_bytes} bytes")
    return client_reps, total_size


def run_proof_pipeline(devices: List[EdgeDevice], bs: int,
                       options: ProofOptions, rng: np.random.Generator,
                       verbose: bool = False, air_version: str = "v1"):
    """Full `--step proof` pipeline with the aggregation statement proved
    CONCURRENTLY with the training batch.

    The aggregation statement depends only on the client reps — available
    right after trace building, before any proving — and its transcript is
    independent of the training proofs, so the two pipelines' host<->device
    sync latencies overlap (the reference runs them strictly sequentially,
    `src/main.rs:374-493`).  RNG draw order matches the sequential path
    exactly: all provers are constructed on the main thread first.

    Returns (client_reps, total_training_proof_size, agg_proof).
    """
    import threading

    from .models.training import build_traces_stacked, fetch_boundaries
    from .ops import f128
    from .prover.batch import prove_many_chunked as prove_many

    provers, indices = [], []
    for i, dev in enumerate(devices):
        tp = _make_training_prover(dev, bs, options, rng, verbose, i,
                                   air_version)
        if tp is not None:
            provers.append(tp)
            indices.append(i)
    if not provers:
        return [], 0, None

    if air_version == "v2":
        # v2 traces carry private sample columns — host-built per device
        traces = [tp.build_trace() for tp in provers]
    elif phases.use_fused():
        stacked = build_traces_stacked(provers)
        fetch_boundaries(provers, stacked)
        traces = [tp.build_trace() for tp in provers]
    else:
        import jax.numpy as jnp
        stacked = jnp.stack([tp.build_trace().data for tp in provers],
                            axis=1)
        fetch_boundaries(provers, stacked)
        traces = [tp.build_trace() for tp in provers]
    client_reps = [tp.client_rep() for tp in provers]

    # aggregation prover constructed NOW (keeps the rng stream identical to
    # the sequential flow), proved on a side thread
    agg = _build_aggregator(client_reps, options, rng)
    agg_air = agg.air()
    agg_trace = agg.build_trace()
    agg_result = {}

    def _prove_agg():
        try:
            pf = prove(agg_air, agg_trace)
            verify(agg_air, pf)
            agg_result["proof"] = pf
        except Exception as e:  # noqa: BLE001 - surfaced after join
            agg_result["error"] = e

    th = threading.Thread(target=_prove_agg, name="agg-prove")
    th.start()

    total_size = 0
    airs = [tp.air() for tp in provers]
    t0 = time.time()
    # v1 and v2 both ride the batched/fused prover (v2's sgd_v2 kernel:
    # `prover/phases.py::TRANSITION_KERNELS`)
    proofs = prove_many(airs, traces)
    gen_ms = int((time.time() - t0) * 1000)
    for i, air, proof in zip(indices, airs, proofs):
        verify(air, proof)
        total_size += proof.size_bytes
        if verbose:
            print(f"Device {i + 1:>2}: ZK proof for {bs} samples: "
                  f"gen = {gen_ms // len(provers):>4}ms (batched), "
                  f"size = {proof.size_bytes} bytes")
            print(f"Training proof size: {proof.size_bytes} bytes")
    th.join()
    if "error" in agg_result:
        raise agg_result["error"]
    return client_reps, total_size, agg_result["proof"]


def _reps_to_locals(client_reps: List[int]):
    """Collapse client reps into tiled local models (`src/main.rs:264-272`
    — the reference's acknowledged simplification)."""
    local_w, local_b = [], []
    for rep in client_reps:
        v = rep / 1e6  # rep.as_int() as f64 / 1e6
        local_w.append([[f64_to_felt(v)] * FE for _ in range(AC)])
        local_b.append([f64_to_felt(v)] * AC)
    return local_w, local_b


def _build_aggregator(client_reps, options, rng):
    local_w, local_b = _reps_to_locals(client_reps)
    g_w, _, g_b, _ = ml_math.generate_initial_model(FE, AC, 10_000.0, rng)
    k = f64_to_felt(float(len(client_reps)))
    return GlobalUpdateProver(options, g_w, g_b, local_w, local_b, k, rng=rng)


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="zk_stark_project_tpu",
        description="STARK Aggregator with built-in training (TPU-native)")
    parser.add_argument("--step", default="setup",
                        choices=["setup", "witness", "proof"])
    parser.add_argument("--data-dir", default="devices/edge_device/data")
    parser.add_argument("--bs", type=int, default=1)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--seed", type=int, default=None,
                        help="seed all RNG streams (bit-reproducible runs)")
    parser.add_argument("--queries", type=int, default=None,
                        help="override proof options (testing only)")
    parser.add_argument("--blowup", type=int, default=None)
    parser.add_argument("--grinding", type=int, default=None)
    parser.add_argument("--air", default="v1", choices=["v1", "v2"],
                        help="training AIR: v1 = reference-faithful "
                             "(inert transitions, SURVEY.md pin #3); "
                             "v2 = sound SGD constraints, private "
                             "in-trace sample data "
                             "(models/training_v2.py)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (coordinator via "
                             "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                             "JAX_PROCESS_ID or TPU-pod auto-detection); "
                             "degrades to single-process when unconfigured")
    args = parser.parse_args(argv)

    if args.multihost or os.environ.get("ZKSTARK_MULTIHOST") == "1":
        from .parallel import multihost
        info = multihost.initialize()
        if args.verbose:
            print(f"multihost: enabled={info.enabled} "
                  f"process {info.process_id}/{info.num_processes}, "
                  f"{info.local_device_count} local / "
                  f"{info.global_device_count} global devices")

    overall_start = time.time()
    if args.bs <= 0:
        print("ZK circuit batch size must be positive", file=sys.stderr)
        return 1
    if args.bs > SAMPLE_SIZE:
        print(f"ZK circuit batch size ({args.bs}) cannot exceed sample size "
              f"({SAMPLE_SIZE})", file=sys.stderr)
        return 1

    options = REFERENCE_OPTIONS
    if args.queries or args.blowup or args.grinding is not None:
        options = ProofOptions(
            num_queries=args.queries or options.num_queries,
            blowup_factor=args.blowup or options.blowup_factor,
            grinding_bits=(args.grinding if args.grinding is not None
                           else options.grinding_bits),
            fri_folding_factor=options.fri_folding_factor,
            fri_remainder_max_degree=options.fri_remainder_max_degree)

    rng = np.random.default_rng(args.seed)
    devices = discover_devices(args.data_dir, verbose=args.verbose, rng=rng)
    if not devices:
        print("No Device_* data found!", file=sys.stderr)
        return 1
    if args.verbose:
        print(f"-> Found {len(devices)} devices\n")

    step_start = time.time()
    do_prove_training = args.step in ("setup", "proof")

    if args.verbose and do_prove_training:
        print("--- Client Training Updates ---")

    if args.step == "proof":
        # training batch + aggregation proved concurrently
        client_reps, total_training_proof_size, agg_pf = run_proof_pipeline(
            devices, args.bs, options, rng, args.verbose,
            air_version=args.air)
        aggregation_proof_size = agg_pf.size_bytes
        if args.verbose:
            print(f"Proof size: {aggregation_proof_size} bytes")
            print(f"Total training proof size: "
                  f"{total_training_proof_size} bytes")
            print(f"Aggregation proof size: {aggregation_proof_size} bytes")
            print(f"Total proof size: "
                  f"{total_training_proof_size + aggregation_proof_size} "
                  f"bytes")
            print(f"\nStep '{args.step}' completed in: "
                  f"{int((time.time() - step_start) * 1000)}ms")
            print(f"Overall runtime: "
                  f"{int((time.time() - overall_start) * 1000)}ms")
        return 0

    client_reps, total_training_proof_size = _train_all_devices(
        devices, args.bs, options, rng, do_prove_training, args.verbose)

    agg = _build_aggregator(client_reps, options, rng)

    if args.step == "setup":
        if args.verbose:
            print(f"STEP=setup: Generated {len(client_reps)} ZK proofs "
                  f"(bs={args.bs})")
            print(f"Total training proof size: "
                  f"{total_training_proof_size} bytes")
    elif args.step == "witness":
        t = time.time()
        tr = agg.build_trace()
        if args.verbose:
            print(f"witness: {tr.length} rows in "
                  f"{int((time.time() - t) * 1000)}ms")

    if args.verbose:
        print(f"\nStep '{args.step}' completed in: "
              f"{int((time.time() - step_start) * 1000)}ms")
        print(f"Overall runtime: "
              f"{int((time.time() - overall_start) * 1000)}ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
