"""Batched multi-proof prover: bit-identical to sequential prove().

`prover/batch.py` promises each proof in a batch equals what `prove()`
yields for the same statement — every Merkle root, Fiat–Shamir draw, and
opening byte.  That is the property checked here (serialization equality),
plus verification of every batched proof.
"""

import numpy as np
import pytest

from zk_stark_project_tpu.models import ml_math, training
from zk_stark_project_tpu.models.ml_math import AC, FE
from zk_stark_project_tpu.ops.signed import f64_to_felt
from zk_stark_project_tpu.prover import fast_options, prove
from zk_stark_project_tpu.prover.batch import prove_many
from zk_stark_project_tpu.verifier import verify

LR = f64_to_felt(0.0001)
PR = f64_to_felt(1e6)


def _make_provers(np_rng, count, batch_size=1, grinding=0):
    provers = []
    for _ in range(count):
        w, ws, b, bs = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
        x = [[f64_to_felt(float(np_rng.normal(0, 1.0))) for _ in range(FE)]
             for _ in range(batch_size)]
        y = [ml_math.label_to_one_hot(float(np_rng.integers(1, AC + 1)),
                                      AC, 1e6)
             for _ in range(batch_size)]
        provers.append(training.TrainingUpdateProver(
            fast_options(grinding=grinding), w, b, ws, bs, x,
            [[0] * FE for _ in range(batch_size)], y, LR, PR, batch_size,
            rng=np_rng))
    return provers


@pytest.mark.slow
def test_batched_equals_sequential(np_rng):
    provers = _make_provers(np_rng, 3)
    airs = [p.air() for p in provers]
    traces = [p.build_trace() for p in provers]

    batched = prove_many(airs, traces)
    for air, proof in zip(airs, batched):
        verify(air, proof)

    sequential = [prove(air, tr) for air, tr in zip(airs, traces)]
    for bp, sp in zip(batched, sequential):
        assert bp.to_bytes() == sp.to_bytes()


@pytest.mark.slow
def test_batched_with_grinding(np_rng):
    provers = _make_provers(np_rng, 2, grinding=6)
    airs = [p.air() for p in provers]
    traces = [p.build_trace() for p in provers]
    batched = prove_many(airs, traces)
    for air, proof in zip(airs, batched):
        assert proof.pow_nonce >= 0
        verify(air, proof)
    sequential = [prove(air, tr) for air, tr in zip(airs, traces)]
    for bp, sp in zip(batched, sequential):
        assert bp.to_bytes() == sp.to_bytes()


@pytest.mark.slow
def test_single_delegates(np_rng):
    (p,) = _make_provers(np_rng, 1)
    air, trace = p.air(), p.build_trace()
    (proof,) = prove_many([air], [trace])
    verify(air, proof)
    assert proof.to_bytes() == prove(air, trace).to_bytes()
