"""Sound training AIR v2 (`models/training_v2.py`): transition math,
prove->verify roundtrip, the adversarial pair the round-3 verdict asked
for (a forged trace v1 ACCEPTS, v2 REJECTS), the round-4 rework contract
(private in-trace sample data, O(bs) verifier, batched kernel), and the
mask-binding modes (default hiding vs public_masks)."""

import numpy as np
import pytest

from zk_stark_project_tpu.models import ml_math
from zk_stark_project_tpu.models.ml_math import AC, FE
from zk_stark_project_tpu.models.training import TrainingUpdateProver
from zk_stark_project_tpu.models.training_v2 import (
    D_STATE, WIDTH, X0, Y0, TrainingUpdateV2Prover, _sel_at, _sgd_step,
    signed_pair_to_natural)
from zk_stark_project_tpu.ops import f128, f128_ref as ref
from zk_stark_project_tpu.ops.signed import f64_to_felt
from zk_stark_project_tpu.prover import fast_options, prove
from zk_stark_project_tpu.prover.batch import prove_many
from zk_stark_project_tpu.prover.trace import TraceTable
from zk_stark_project_tpu.verifier import VerificationError, verify

P = ref.P


def _mk_v2(np_rng, bs=1, opts=None, **kw):
    opts = opts or fast_options(num_queries=4, blowup=2)
    state = [int(np_rng.integers(0, 10 ** 7)) for _ in range(D_STATE)]
    x = [[f64_to_felt(float(np_rng.normal())) for _ in range(FE)]
         for _ in range(bs)]
    y = [ml_math.label_to_one_hot(float(np_rng.integers(1, AC + 1)),
                                  AC, 1e6) for _ in range(bs)]
    return TrainingUpdateV2Prover(opts, state, x, y, f64_to_felt(1e-4),
                                  f64_to_felt(1e6), bs, rng=np_rng, **kw)


def test_v2_transitions_vanish_on_honest_trace(np_rng):
    """evaluate_transitions_at == 0 on every consecutive row pair of the
    honest trace, evaluated at the actual domain points."""
    p = _mk_v2(np_rng, bs=2)
    air = p.air()
    trace = p.build_trace()
    n = air.trace_length
    g = air.trace_domain_generator
    rows = [trace.get_row(i) for i in range(n)]
    for i in [0, 1, 2, n - 2]:          # includes SGD rows and hold rows
        z = pow(g, i, P)
        tvals = air.evaluate_transitions_at(rows[i], rows[(i + 1) % n], z)
        assert all(v == 0 for v in tvals), (i, tvals[:4])


def test_v2_sgd_step_matches_trace(np_rng):
    p = _mk_v2(np_rng, bs=2)
    rows = p._raw_rows()
    s1 = _sgd_step(p.initial_state, p.x_batch[0], p.y_batch[0],
                   p.learning_rate, p.precision)
    assert rows[1] == s1
    assert rows[-1] == rows[p.batch_size]     # state held after bs


def test_v2_prove_verify_roundtrip(np_rng):
    p = _mk_v2(np_rng, bs=1)
    air = p.air()
    proof = prove(air, p.build_trace())
    verify(air, proof)


def test_v2_rejects_forged_trace_v1_accepts(np_rng):
    """The soundness gap, demonstrated: tamper a MIDDLE row (boundaries
    untouched).  v1 (inert transitions) proves + verifies the forged
    trace; v2's constraint quotient is no longer a polynomial and the
    proof fails verification."""
    opts = fast_options(num_queries=4, blowup=2)

    # ---- v1 accepts ----
    w, ws, b, bsn = ml_math.generate_initial_model(FE, AC, 1.0, np_rng)
    x = [[f64_to_felt(0.5)] * FE]
    y = [ml_math.label_to_one_hot(2.0, AC, 1e6)]
    p1 = TrainingUpdateProver(opts, w, b, ws, bsn, x, [[0] * FE], y,
                              f64_to_felt(1e-4), f64_to_felt(1e6), 1,
                              rng=np_rng)
    air1 = p1.air()
    t1 = p1.build_trace()
    data = np.asarray(f128.to_ints(np.asarray(t1.data)), dtype=object)
    mid = t1.length // 2
    data[5, mid] = (int(data[5, mid]) + 12345) % P      # forge middle row
    forged1 = TraceTable(f128.from_ints(data))
    proof1 = prove(air1, forged1)
    verify(air1, proof1)        # v1 ACCEPTS the forgery (documented gap)

    # ---- v2 rejects ----
    p2 = _mk_v2(np_rng, bs=1, opts=opts)
    air2 = p2.air()
    t2 = p2.build_trace()
    data2 = np.asarray(f128.to_ints(np.asarray(t2.data)), dtype=object)
    mid2 = t2.length // 2
    data2[5, mid2] = (int(data2[5, mid2]) + 12345) % P
    forged2 = TraceTable(f128.from_ints(data2))
    proof2 = prove(air2, forged2)
    with pytest.raises(VerificationError):
        verify(air2, proof2)


def test_v2_public_inputs_contain_no_sample_data(np_rng):
    """Round-4 verdict contract: the sample batch is private witness in
    the trace; v2 public inputs carry only version/steps/bs/lr/pr and the
    two masked boundary rows."""
    p = _mk_v2(np_rng, bs=3)
    els = p.pub_inputs().to_elements()
    assert len(els) == 5 + 2 * D_STATE          # no x/y anywhere
    # the batch is in the committed trace columns instead
    t = p.build_trace()
    row0 = t.get_row(0)
    assert [row0[X0 + f] for f in range(FE)] == p.x_batch[0]
    assert [row0[Y0 + j] for j in range(AC)] == p.y_batch[0]
    assert t.width == WIDTH


def test_v2_sel_at_is_partial_lagrange(np_rng):
    """_sel_at (O(bs)) equals the full Lagrange sum over i < bs."""
    n, bs = 64, 5
    g = ref.root_of_unity(6)
    z = int(np_rng.integers(2, 10 ** 9))
    zn1 = (pow(z, n, P) - 1) % P
    full = 0
    for i in range(bs):
        gi = pow(g, i, P)
        full = (full + zn1 * gi % P
                * ref.inv(n * (z - gi) % P)) % P
    assert _sel_at(n, bs, z) == full


def test_v2_batched_prove_matches_single(np_rng):
    """v2 rides the batched prover (sgd_v2 kernel): a C=2 batch yields
    bit-identical proofs to two single proves."""
    opts = fast_options(num_queries=4, blowup=2)
    pa = _mk_v2(np_rng, bs=2, opts=opts)
    pb = _mk_v2(np_rng, bs=2, opts=opts)
    aa, ab = pa.air(), pb.air()
    ta, tb = pa.build_trace(), pb.build_trace()
    batch = prove_many([aa, ab], [ta, tb])
    singles = [prove(aa, ta), prove(ab, tb)]
    for got, want in zip(batch, singles):
        assert got.to_bytes() == want.to_bytes()
    for air, pf in zip([aa, ab], batch):
        verify(air, pf)


def _mask_forgery(prover, air):
    """A trace with raw state == 0 everywhere (masks = public masked
    rows at the boundaries), satisfying ALL transitions and the masked
    boundary assertions of `air` without knowing any SGD chain."""
    n = air.trace_length
    pi = air.pub_inputs
    data = np.zeros((n, WIDTH), dtype=object)
    for c in range(D_STATE):
        data[0, c] = pi.initial_masked[c]
        data[0, D_STATE + c] = pi.initial_masked[c]       # raw = 0
        data[n - 1, c] = pi.final_masked[c]
        data[n - 1, D_STATE + c] = pi.final_masked[c]
    return TraceTable(f128.from_ints(data.T))


def test_v2_mask_binding_modes(np_rng):
    """Default (hiding) mode: free witness masks admit a raw-state-zero
    forgery for any public masked rows — the documented caveat (module
    docstring; the reference's masks are equally unbound,
    `src/training/prover.rs:117-130`).  public_masks=True pins the
    boundary mask rows as public inputs and the same forgery is
    rejected."""
    opts = fast_options(num_queries=4, blowup=2)

    p_hide = _mk_v2(np_rng, bs=1, opts=opts)
    air_h = p_hide.air()
    forged = _mask_forgery(p_hide, air_h)
    verify(air_h, prove(air_h, forged))       # accepted: caveat is real

    p_bind = _mk_v2(np_rng, bs=1, opts=opts, public_masks=True)
    air_b = p_bind.air()
    els = p_bind.pub_inputs().to_elements()
    assert len(els) == 5 + 4 * D_STATE        # + boundary mask rows
    # honest trace still proves + verifies in binding mode
    verify(air_b, prove(air_b, p_bind.build_trace()))
    forged_b = _mask_forgery(p_bind, air_b)
    with pytest.raises(VerificationError):
        verify(air_b, prove(air_b, forged_b))
