"""End-to-end training STARK: trace semantics, prove -> verify, adversarial
rejection.  Mirrors `tests/integration_tests.rs` plus the soundness gap
(SURVEY.md §4)."""

import dataclasses

import numpy as np
import pytest

from zk_stark_project_tpu.models import ml_math, training
from zk_stark_project_tpu.models.ml_math import AC, FE
from zk_stark_project_tpu.ops import f128_ref as ref
from zk_stark_project_tpu.ops.signed import f64_to_felt
from zk_stark_project_tpu.prover import Proof, prove, fast_options
from zk_stark_project_tpu.verifier import VerificationError, verify

LR = f64_to_felt(0.0001)
PR = f64_to_felt(1e6)


def make_prover(np_rng, batch_size=1):
    """Deterministic-ish synthetic batch, like
    `tests/integration_tests.rs:14-58`."""
    w, ws, b, bs = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
    x_batch = [[f64_to_felt(float(np_rng.normal(0, 1.0))) for _ in range(FE)]
               for _ in range(batch_size)]
    x_sign = [[0] * FE for _ in range(batch_size)]
    y_batch = [ml_math.label_to_one_hot(float(np_rng.integers(1, AC + 1)),
                                        AC, 1e6)
               for _ in range(batch_size)]
    return training.TrainingUpdateProver(
        fast_options(), w, b, ws, bs, x_batch, x_sign, y_batch,
        LR, PR, batch_size, rng=np_rng)


def test_trace_shape_and_semantics(np_rng):
    p = make_prover(np_rng, batch_size=1)
    trace = p.build_trace()
    assert trace.width == 240
    assert trace.length == training.trace_length_for(1) == 128
    data = np.asarray(trace.data)
    half = 120
    # masked - mask == raw; raw state stops changing after row bs
    raw_rows = []
    for r in [0, 1, 2, trace.length - 1]:
        row = [int(ref.from_limbs(data[:, c, r])) for c in range(240)]
        raw = [(row[i] - row[half + i]) % ref.P for i in range(half)]
        raw_rows.append(raw)
    # row 0 raw == initial state
    init = ml_math.flatten_state_interleaved(p.initial_w, p.w_sign,
                                             p.initial_b, p.b_sign)
    assert raw_rows[0] == [v % ref.P for v in init]
    # row 1 raw == oracle SGD step on the initial state
    w2, ws2, b2, bs2 = ml_math.ref_sgd_step(
        p.initial_w, p.w_sign, p.initial_b, p.b_sign,
        p.x_batch[0], p.x_batch_sign[0], p.y_batch[0], LR, PR)
    expect = ml_math.flatten_state_interleaved(w2, ws2, b2, bs2)
    assert raw_rows[1] == [v % ref.P for v in expect]
    # rows beyond bs hold the same raw state
    assert raw_rows[2] == raw_rows[1] == raw_rows[3]
    # masks differ per row (fresh randomness each row)
    m1 = [int(ref.from_limbs(data[:, half + c, 1])) for c in range(4)]
    m2 = [int(ref.from_limbs(data[:, half + c, 2])) for c in range(4)]
    assert m1 != m2


def test_trace_length_formula():
    # `src/training/prover.rs:65`
    assert training.trace_length_for(1) == 128
    assert training.trace_length_for(2) == 256
    assert training.trace_length_for(50) == 8192


@pytest.mark.slow
def test_prove_verify_roundtrip(np_rng):
    p = make_prover(np_rng, batch_size=1)
    trace = p.build_trace()
    air = p.air()
    proof = prove(air, trace)
    verify(air, proof)
    verify(air, Proof.from_bytes(proof.to_bytes()))


@pytest.mark.slow
def test_tampered_rejected(np_rng):
    p = make_prover(np_rng, batch_size=1)
    trace = p.build_trace()
    air = p.air()
    proof = prove(air, trace)

    bad = Proof.from_bytes(proof.to_bytes())
    bad.trace_openings[2].values[7] = (bad.trace_openings[2].values[7] + 1) % ref.P
    with pytest.raises(VerificationError):
        verify(air, bad)

    # different masked final state in the public inputs must fail
    pi = p.get_pub_inputs()
    fm = list(pi.final_masked)
    fm[0] = (fm[0] + 1) % ref.P
    pi_bad = dataclasses.replace(pi, final_masked=fm)
    air_bad = training.TrainingUpdateAir(p.trace_length, pi_bad, p.options)
    with pytest.raises(VerificationError):
        verify(air_bad, proof)
