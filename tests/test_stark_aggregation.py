"""End-to-end aggregation STARK: prove -> verify, plus adversarial checks
(tamper a proof byte / value -> verification must fail).

The reference covers only the happy path (`tests/integration_tests.rs`);
SURVEY.md §4 flags the soundness-test gap, which these tests close.
"""

import dataclasses

import numpy as np
import pytest

from zk_stark_project_tpu.models import aggregation as agg
from zk_stark_project_tpu.models.ml_math import AC, C, FE
from zk_stark_project_tpu.ops import f128_ref as ref
from zk_stark_project_tpu.ops import mimc
from zk_stark_project_tpu.prover import Proof, prove, fast_options
from zk_stark_project_tpu.prover.options import REFERENCE_OPTIONS
from zk_stark_project_tpu.verifier import VerificationError, verify


def make_prover(np_rng, num_clients=C, opts=None):
    opts = opts or fast_options()
    gw = [[ref.mul(i + 1, j + 2) % 10**9 for j in range(FE)] for i in range(AC)]
    gb = [int(np_rng.integers(0, 10**9)) for _ in range(AC)]
    local_w = [[[int(np_rng.integers(0, 10**9)) for _ in range(FE)]
                for _ in range(AC)] for _ in range(num_clients)]
    local_b = [[int(np_rng.integers(0, 10**9)) for _ in range(AC)]
               for _ in range(num_clients)]
    k = 1_000_000 * num_clients  # f64_to_felt(num_clients)
    return agg.GlobalUpdateProver(opts, gw, gb, local_w, local_b, k,
                                  rng=np_rng)


def test_trace_semantics(np_rng):
    p = make_prover(np_rng)
    rows = p.compute_iterative_trace_rows()
    d = p.d
    assert len(rows) == p.trace_length == 16
    assert all(len(r) == 2 * d for r in rows)
    # transition identity: k*S_next - k*S_curr - U_next == 0
    for r in range(len(rows) - 1):
        for i in range(d):
            lhs = (p.k * rows[r + 1][i] - p.k * rows[r][i]
                   - rows[r + 1][d + i]) % ref.P
            assert lhs == 0
    # row0 state = masked global
    from zk_stark_project_tpu.models import ml_math
    assert rows[0][:d] == ml_math.flatten_state(p.masked_global_w,
                                                p.masked_global_b)
    # digest matches recomputed MiMC of the masked final state
    pi = p.get_pub_inputs()
    assert pi.digest == mimc.ref_mimc_hash_matrix(pi.new_global_w,
                                                  pi.new_global_b)


def test_prove_verify_roundtrip(np_rng):
    p = make_prover(np_rng)
    trace = p.build_trace()
    air = p.air()
    proof = prove(air, trace)
    verify(air, proof)  # must not raise
    # serialization roundtrip verifies too
    proof2 = Proof.from_bytes(proof.to_bytes())
    verify(air, proof2)
    assert proof.size_bytes == len(proof.to_bytes())


def test_tampered_proof_rejected(np_rng):
    p = make_prover(np_rng)
    trace = p.build_trace()
    air = p.air()
    proof = prove(air, trace)

    # tamper an opened trace value
    bad = Proof.from_bytes(proof.to_bytes())
    bad.trace_openings[0].values[0] = (bad.trace_openings[0].values[0] + 1) % ref.P
    with pytest.raises(VerificationError):
        verify(air, bad)

    # tamper the OOD frame
    bad = Proof.from_bytes(proof.to_bytes())
    bad.ood_trace_cur[3] = (bad.ood_trace_cur[3] + 1) % ref.P
    with pytest.raises(VerificationError):
        verify(air, bad)

    # tamper a FRI remainder coefficient
    bad = Proof.from_bytes(proof.to_bytes())
    bad.fri_remainder[0] = (bad.fri_remainder[0] + 1) % ref.P
    with pytest.raises(VerificationError):
        verify(air, bad)

    # tamper a Merkle root
    bad = Proof.from_bytes(proof.to_bytes())
    bad.comp_root = bytes(32)
    with pytest.raises(VerificationError):
        verify(air, bad)


def test_wrong_public_inputs_rejected(np_rng):
    p = make_prover(np_rng)
    trace = p.build_trace()
    air = p.air()
    proof = prove(air, trace)
    # claim a different digest -> transcript diverges -> must fail
    pi = p.get_pub_inputs()
    pi_bad = dataclasses.replace(pi, digest=(pi.digest + 1) % ref.P)
    air_bad = agg.GlobalUpdateAir(p.trace_length, pi_bad, p.options)
    with pytest.raises(VerificationError):
        verify(air_bad, proof)
    # claim a different final state -> assertions change -> must fail
    new_w = [row[:] for row in pi.new_global_w]
    new_w[0][0] = (new_w[0][0] + 1) % ref.P
    pi_bad2 = dataclasses.replace(pi, new_global_w=new_w)
    air_bad2 = agg.GlobalUpdateAir(p.trace_length, pi_bad2, p.options)
    with pytest.raises(VerificationError):
        verify(air_bad2, proof)


def test_tampered_trace_rejected(np_rng):
    """A trace violating the transition constraints must not verify against
    the honest public inputs."""
    p = make_prover(np_rng)
    rows = p.compute_iterative_trace_rows()
    rows[2][5] = (rows[2][5] + 123) % ref.P  # break one state cell
    from zk_stark_project_tpu.prover.trace import TraceTable
    bad_trace = TraceTable.from_rows(rows)
    air = p.air()
    proof = prove(air, bad_trace)
    with pytest.raises(VerificationError):
        verify(air, proof)
