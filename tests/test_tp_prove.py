"""Tensor-parallel single-proof path on the virtual CPU mesh: the sharded
LDE+commit phase must produce a BIT-IDENTICAL proof to the single-device
prover, and its collective structure must actually shard the work."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from zk_stark_project_tpu.models import aggregation as agg
from zk_stark_project_tpu.models import ml_math
from zk_stark_project_tpu.models.ml_math import AC, FE
from zk_stark_project_tpu.ops import f128_ref as ref
from zk_stark_project_tpu.ops.signed import f64_to_felt
from zk_stark_project_tpu.parallel.tp_prove import prove_tp
from zk_stark_project_tpu.prover import fast_options, prove
from zk_stark_project_tpu.verifier import verify


def _mesh(n, name="tp"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), (name,))


def _agg_prover(np_rng, clients=8):
    gw = [[int(np_rng.integers(0, 10 ** 9)) for _ in range(FE)]
          for _ in range(AC)]
    gb = [int(np_rng.integers(0, 10 ** 9)) for _ in range(AC)]
    lw = [[[int(np_rng.integers(0, 10 ** 9)) for _ in range(FE)]
           for _ in range(AC)] for _ in range(clients)]
    lb = [[int(np_rng.integers(0, 10 ** 9)) for _ in range(AC)]
          for _ in range(clients)]
    return agg.GlobalUpdateProver(fast_options(), gw, gb, lw, lb,
                                  f64_to_felt(float(clients)), rng=np_rng)


@pytest.mark.slow
@pytest.mark.parametrize("d", [2, 4])
def test_tp_prove_bit_identical_aggregation(np_rng, d):
    p = _agg_prover(np_rng)
    air = p.air()
    trace = p.build_trace()
    baseline = prove(air, trace)
    tp = prove_tp(air, trace, _mesh(d))
    assert tp.to_bytes() == baseline.to_bytes()
    verify(air, tp)


@pytest.mark.slow
def test_tp_prove_training(np_rng):
    from zk_stark_project_tpu.models.training import TrainingUpdateProver

    w, ws, b, bs = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
    x = [[f64_to_felt(0.5)] * FE]
    y = [ml_math.label_to_one_hot(2.0, AC, 1e6)]
    p = TrainingUpdateProver(fast_options(), w, b, ws, bs, x,
                             [[0] * FE], y, f64_to_felt(1e-4),
                             f64_to_felt(1e6), 1, rng=np_rng)
    air = p.air()
    trace = p.build_trace()
    baseline = prove(air, trace)
    tp = prove_tp(air, trace, _mesh(4))
    assert tp.to_bytes() == baseline.to_bytes()
    verify(air, tp)


@pytest.mark.slow
def test_tp_prove_training_v2(np_rng):
    """The sound v2 AIR (periodic sel column + sgd_v2 transition kernel)
    must ride the tensor-parallel path bit-identically too."""
    from zk_stark_project_tpu.models.training_v2 import (
        D_STATE, TrainingUpdateV2Prover)

    state = [int(np_rng.integers(0, 10 ** 7)) for _ in range(D_STATE)]
    x = [[f64_to_felt(0.5)] * FE]
    y = [ml_math.label_to_one_hot(2.0, AC, 1e6)]
    p = TrainingUpdateV2Prover(fast_options(num_queries=4, blowup=2),
                               state, x, y, f64_to_felt(1e-4),
                               f64_to_felt(1e6), 1, rng=np_rng)
    air = p.air()
    trace = p.build_trace()
    baseline = prove(air, trace)
    tp = prove_tp(air, trace, _mesh(2))
    assert tp.to_bytes() == baseline.to_bytes()
    verify(air, tp)


def test_tp_phase_shards_collectives(np_rng):
    """The sharded phase must keep polys/lde column-sharded and the bottom
    Merkle levels domain-sharded (only the top levels replicated)."""
    import jax.numpy as jnp

    from zk_stark_project_tpu.parallel.tp_prove import tp_trace_lde_commit

    p = _agg_prover(np_rng)
    trace = p.build_trace()
    mesh = _mesh(4)
    stacked = jnp.stack([trace.data], axis=1)
    polys, lde, levels = tp_trace_lde_commit(
        stacked, p.options.blowup_factor, p.air().domain_offset, mesh)
    def shard_count(x):
        return len({sh.device for sh in x.addressable_shards})
    assert shard_count(polys) == 4
    assert shard_count(lde) == 4
    assert shard_count(levels[0]) == 4        # leaves domain-sharded
    assert levels[-1].shape[1] == 1           # root present
    # root equals the single-device commit root
    from zk_stark_project_tpu.prover import phases
    _, _, ref_levels = phases.trace_lde_commit(
        stacked, p.options.blowup_factor, p.air().domain_offset)
    assert np.array_equal(np.asarray(levels[-1]),
                          np.asarray(ref_levels[-1]))


def test_tp_deep_phases_actually_shard(np_rng):
    """The round-3 deepening (composition/DEEP/FRI sharded): at shapes the
    mesh divides, TpPhases must run its sharded kernels (witnessed by its
    cross-phase residents), not silently fall back to the replicated
    implementations — and the proof must still verify bit-identically."""
    from zk_stark_project_tpu.parallel.tp_prove import TpPhases
    from zk_stark_project_tpu.prover.batch import prove_many

    p = _agg_prover(np_rng)
    air = p.air()
    trace = p.build_trace()
    mesh = _mesh(4)
    impl = TpPhases(mesh)
    proof = prove_many([air], [trace], impl=impl)[0]
    # phase-1 resident: domain-sharded LDE rows (consumed by DEEP)
    assert impl._rows is not None
    n_dev = {sh.device for sh in impl._rows.addressable_shards}
    assert len(n_dev) == 4
    # FRI resident: the transposed-coset layer tensor stayed sharded
    assert impl._fri_t is not None
    assert len({sh.device for sh in impl._fri_t.addressable_shards}) == 4
    baseline = prove(air, trace)
    assert proof.to_bytes() == baseline.to_bytes()
    verify(air, proof)


@pytest.mark.slow
def test_tp_fallback_when_mesh_does_not_divide(np_rng):
    """d=8 with fri_folding_factor=4 cannot tilt the FRI layout (factor %
    d != 0) — the per-phase fallback must kick in and the proof must stay
    bit-identical (never an error, never a transcript change)."""
    p = _agg_prover(np_rng)
    air = p.air()
    trace = p.build_trace()
    baseline = prove(air, trace)
    tp = prove_tp(air, trace, _mesh(8))
    assert tp.to_bytes() == baseline.to_bytes()
    verify(air, tp)
