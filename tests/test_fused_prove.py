"""Whole-proof device-transcript prover (prover/fused.py): bit-identical
proofs vs the host-coin path.

The megagraph costs ~7 min to COMPILE on XLA-CPU, so like the fused
trace-build test this is TPU-or-opt-in (the device-coin primitives are
covered cheaply in test_device_coin.py; bench.py verifies the fused path
in-pipeline on the chip every round)."""

import os

import jax
import numpy as np
import pytest

from zk_stark_project_tpu.models import aggregation as agg
from zk_stark_project_tpu.models.ml_math import AC, FE
from zk_stark_project_tpu.models.toy import make_toy_statement
from zk_stark_project_tpu.ops.signed import f64_to_felt
from zk_stark_project_tpu.prover import fast_options, prove
from zk_stark_project_tpu.prover.options import ProofOptions
from zk_stark_project_tpu.verifier import verify


def test_fused_prove_small_shape_bit_identical(np_rng):
    """The fused device-transcript prover vs the host-coin path, on shapes
    the XLA-CPU compiler handles in CI time (width 4, n=16, 3 queries,
    2-bit grinding so the in-graph while_loop nonce search runs) —
    regression cover for `prover/fused.py` (round-3 verdict: the headline
    fused path was TPU-gated only)."""
    from zk_stark_project_tpu.prover.fused import prove_many_device

    opts = ProofOptions(num_queries=3, blowup_factor=2, grinding_bits=2,
                        fri_folding_factor=2, fri_remainder_max_degree=3)
    pairs = [make_toy_statement(np_rng, opts) for _ in range(2)]
    airs = [a for a, _ in pairs]
    trs = [t for _, t in pairs]
    os.environ["ZKSTARK_DEVICE_TRANSCRIPT"] = "0"   # host-coin baseline
    try:
        base = [prove(a, t) for a, t in zip(airs, trs)]
    finally:
        os.environ.pop("ZKSTARK_DEVICE_TRANSCRIPT", None)
    fused = prove_many_device(airs, trs)
    for b, f, a in zip(base, fused, airs):
        assert f.to_bytes() == b.to_bytes()
        verify(a, f)


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() != "tpu"
    and not os.environ.get("ZKSTARK_RUN_FUSED_PROVE_TEST"),
    reason="megagraph compile is ~7 min on XLA-CPU; set "
           "ZKSTARK_RUN_FUSED_PROVE_TEST=1 to force")
def test_fused_prove_bit_identical(np_rng):
    from zk_stark_project_tpu.prover.fused import prove_many_device

    def mk():
        gw = [[int(np_rng.integers(0, 10 ** 9)) for _ in range(FE)]
              for _ in range(AC)]
        gb = [int(np_rng.integers(0, 10 ** 9)) for _ in range(AC)]
        lw = [[[int(np_rng.integers(0, 10 ** 9)) for _ in range(FE)]
               for _ in range(AC)] for _ in range(8)]
        lb = [[int(np_rng.integers(0, 10 ** 9)) for _ in range(AC)]
              for _ in range(8)]
        return agg.GlobalUpdateProver(fast_options(grinding=4), gw, gb,
                                      lw, lb, f64_to_felt(8.0), rng=np_rng)

    ps = [mk() for _ in range(2)]
    airs = [p.air() for p in ps]
    trs = [p.build_trace() for p in ps]
    os.environ["ZKSTARK_DEVICE_TRANSCRIPT"] = "0"   # host-coin baseline
    try:
        base = [prove(a, t) for a, t in zip(airs, trs)]
    finally:
        os.environ.pop("ZKSTARK_DEVICE_TRANSCRIPT", None)
    fused = prove_many_device(airs, trs)
    for b, f, a in zip(base, fused, airs):
        assert f.to_bytes() == b.to_bytes()
        verify(a, f)
