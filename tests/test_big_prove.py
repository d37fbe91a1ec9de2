"""Streaming big-trace prover (`prover/big.py`): transcript/bytes must be
IDENTICAL to the legacy single prover at any size (it is the same proof,
computed in column-block streams)."""

import numpy as np
import pytest

from zk_stark_project_tpu.models import ml_math
from zk_stark_project_tpu.models.ml_math import AC, FE
from zk_stark_project_tpu.models.training import TrainingUpdateProver
from zk_stark_project_tpu.ops.signed import f64_to_felt
from zk_stark_project_tpu.prover import fast_options
from zk_stark_project_tpu.prover.big import prove_big
from zk_stark_project_tpu.prover.stark import prove_single_legacy
from zk_stark_project_tpu.verifier import verify


@pytest.mark.slow
def test_big_prover_bit_identical_small(np_rng):
    opts = fast_options(num_queries=4, blowup=8, grinding=0)
    w, ws, b, bsn = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
    x = [[f64_to_felt(0.25)] * FE]
    y = [ml_math.label_to_one_hot(3.0, AC, 1e6)]
    p = TrainingUpdateProver(opts, w, b, ws, bsn, x, [[0] * FE], y,
                             f64_to_felt(1e-4), f64_to_felt(1e6), 1,
                             rng=np_rng)
    air = p.air()
    baseline = prove_single_legacy(air, p.build_trace())
    # fresh prover state with the SAME masks -> identical trace
    p2 = TrainingUpdateProver(opts, p.initial_w, p.initial_b, p.w_sign,
                              p.b_sign, p.x_batch, p.x_batch_sign,
                              p.y_batch, p.learning_rate, p.precision, 1,
                              masks=p.masks)
    big = prove_big(p2.air(), p2.build_trace())
    assert big.to_bytes() == baseline.to_bytes()
    verify(air, big)


def test_streamed_polys_match_trace_build(np_rng):
    """`build_polys_streamed` must equal interpolate_bitrev(build_trace)
    (the big prover's bit-reversed storage convention) and set the same
    boundary rows."""
    from zk_stark_project_tpu.models.training import build_polys_streamed
    from zk_stark_project_tpu.ops import f128, ntt

    opts = fast_options(num_queries=4, blowup=2)
    w, ws, b, bsn = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
    x = [[f64_to_felt(0.5)] * FE, [f64_to_felt(-0.25)] * FE]
    y = [ml_math.label_to_one_hot(1.0, AC, 1e6),
         ml_math.label_to_one_hot(4.0, AC, 1e6)]
    p = TrainingUpdateProver(opts, w, b, ws, bsn, x, [[0] * FE] * 2, y,
                             f64_to_felt(1e-4), f64_to_felt(1e6), 2,
                             rng=np_rng)
    expected = ntt.interpolate_bitrev(p.build_trace().data)
    pub_expected = p.get_pub_inputs()

    p2 = TrainingUpdateProver(opts, p.initial_w, p.initial_b, p.w_sign,
                              p.b_sign, p.x_batch, p.x_batch_sign,
                              p.y_batch, p.learning_rate, p.precision, 2,
                              masks=p.masks)
    polys = build_polys_streamed(p2, col_block=40)
    assert polys.shape[0] == 4          # packed canonical-word storage
    import numpy as np2
    assert (np2.asarray(f128.from_uint32_words(polys))
            == np2.asarray(f128.canon(expected))).all()
    pub2 = p2.get_pub_inputs()
    assert pub2.initial_masked == pub_expected.initial_masked
    assert pub2.final_masked == pub_expected.final_masked


@pytest.mark.slow
def test_big_prover_sound_v2_bit_identical(np_rng):
    """Round-4 verdict #3: the streaming prover evaluates REAL transition
    constraints (per-coset streamed) — a sound v2 proof from prove_big is
    bit-identical to the legacy path and verifies."""
    from zk_stark_project_tpu.models.training_v2 import (
        D_STATE, TrainingUpdateV2Prover, build_polys_streamed_v2)

    opts = fast_options(num_queries=4, blowup=8, grinding=0)
    state = [int(np_rng.integers(0, 10 ** 7)) for _ in range(D_STATE)]
    x = [[f64_to_felt(float(np_rng.normal())) for _ in range(FE)]]
    y = [ml_math.label_to_one_hot(2.0, AC, 1e6)]
    p = TrainingUpdateV2Prover(opts, state, x, y, f64_to_felt(1e-4),
                               f64_to_felt(1e6), 1, rng=np_rng)
    air = p.air()
    baseline = prove_single_legacy(air, p.build_trace())

    p2 = TrainingUpdateV2Prover(opts, state, x, y, f64_to_felt(1e-4),
                                f64_to_felt(1e6), 1, masks=p.masks)
    big = prove_big(p2.air(), p2.build_trace(), col_block=36)
    assert big.to_bytes() == baseline.to_bytes()
    verify(air, big)

    # the streamed poly builder feeds the same prover identically
    p3 = TrainingUpdateV2Prover(opts, state, x, y, f64_to_felt(1e-4),
                                f64_to_felt(1e6), 1, masks=p.masks)
    polys = build_polys_streamed_v2(p3, col_block=24)
    big2 = prove_big(p3.air(), polys=polys, col_block=36)
    assert big2.to_bytes() == baseline.to_bytes()


def test_streamed_polys_host_chain(np_rng):
    """The host-int SGD chain fast path (ml_math.ref_sgd_step) must match
    the eager device chain bit for bit."""
    from zk_stark_project_tpu.models.training import build_polys_streamed
    from zk_stark_project_tpu.ops import f128

    opts = fast_options(num_queries=4, blowup=2)
    w, ws, b, bsn = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
    x = [[f64_to_felt(0.5)] * FE, [f64_to_felt(-0.25)] * FE]
    y = [ml_math.label_to_one_hot(1.0, AC, 1e6),
         ml_math.label_to_one_hot(4.0, AC, 1e6)]
    p = TrainingUpdateProver(opts, w, b, ws, bsn, x, [[0] * FE] * 2, y,
                             f64_to_felt(1e-4), f64_to_felt(1e6), 2,
                             rng=np_rng)
    dev = build_polys_streamed(p, host_chain=False)
    p2 = TrainingUpdateProver(opts, w, b, ws, bsn, x, [[0] * FE] * 2, y,
                              f64_to_felt(1e-4), f64_to_felt(1e6), 2,
                              masks=p.masks)
    host = build_polys_streamed(p2, host_chain=True)
    import numpy as np3
    # tables come back PACKED as (4, W, n) canonical u32 words — direct
    # word equality IS bit equality (no canon pass needed or possible)
    assert dev.shape[0] == 4 and host.shape[0] == 4
    assert (np3.asarray(dev) == np3.asarray(host)).all()
