"""Fused prover phases — one device executable per transcript phase.

The STARK transcript forces a host sync at every Fiat–Shamir boundary
(commit root -> draw randomness -> next phase), so prover wall-clock at
small trace sizes is set by (dispatches + syncs) x link latency — measured
~8 ms per dispatch and ~25 ms per blocking pull on a tunneled TPU chip.
Round 1 paid that cost per *operation* (a Merkle commit alone was 14
dispatches); this module fuses everything between two transcript boundaries
into ONE jitted executable, so a full proof batch costs ~7 dispatches and
~7 pulls regardless of batch size.

Every function here operates on client-batched tensors — the limb axis
leads, the proof axis C sits second: traces are (8, C, W, n).  The
single-statement `prove()` is the C == 1 case of the same code path
(`prover/batch.py` wires both).

This layer replaces the phase structure of winterfell 0.12's `prove()`
(reference call sites `src/main.rs:228,468`) including what the reference
gets from the winterfell crate's `concurrent` feature (`Cargo.toml:11`) —
except here the parallelism is VPU/Pallas vectorization instead of rayon.

Transition-constraint evaluation is fused too: AIRs declare a static
`transition_kind` resolved against `TRANSITION_KERNELS`, with per-proof
parameters passed as limb arrays — so one jitted composition executable
serves all C proofs (see `models/{training,aggregation}.py`).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blake3 as b3
from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import ntt
from . import poly

def use_fused() -> bool:
    """Whether the phase-fused jit executables run (vs the eager per-op
    chain).  Defaults to the Pallas/TPU condition; ZKSTARK_FUSED=1 forces
    the fused path with the portable jnp mul kernels — the CI escape that
    lets the TPU-selected executables compile and run on CPU
    (`tests/test_fused_phases.py`)."""
    import os

    if os.environ.get("ZKSTARK_FUSED") == "1":
        return True
    return f128.use_pallas()


# ---------------------------------------------------------------------------
# Host-precomputed constant tables (lru np arrays; become jit constants)
# ---------------------------------------------------------------------------


def _ints_to_limbs_np(ints) -> np.ndarray:
    """(nested) python ints -> (8,) + shape uint32 limbs, pure numpy (safe
    to call inside jit traces — the result becomes a graph constant)."""
    a = np.asarray(ints, dtype=object)
    return np.stack(
        [((a >> (f128.LIMB_BITS * i)) & f128.LIMB_MASK).astype(np.uint32)
         for i in range(f128.NUM_LIMBS)], axis=0)


def _limbs_to_ints_np(a: np.ndarray):
    flat = a.reshape(a.shape[0], -1).astype(object)
    out = np.zeros(flat.shape[1], dtype=object)
    for i in range(a.shape[0] - 1, -1, -1):
        out = out * (1 << f128.LIMB_BITS) + flat[i]
    return [int(x) % ref.P for x in out]


@functools.lru_cache(maxsize=None)
def _domain_np(log2_size: int, offset: int) -> np.ndarray:
    """(8, 2^log2) limbs of the domain points offset * w^i."""
    w = ref.root_of_unity(log2_size)
    pows = ntt._offset_powers(log2_size, w, False)
    # host-side scalar mul of the table by offset (exact, object ints)
    ints = [(int(x) * offset) % ref.P
            for x in _limbs_to_ints_np(np.asarray(pows))]
    return _ints_to_limbs_np(ints)


@functools.lru_cache(maxsize=None)
def _zerofier_inv_np(trace_length: int, ce_blowup: int,
                     offset: int) -> np.ndarray:
    """inv(x^n - 1) over the CE domain (periodic, tiled), (8, n*ce_blowup)."""
    n, d = trace_length, trace_length * ce_blowup
    w_ce = ref.root_of_unity(d.bit_length() - 1)
    base = pow(offset, n, ref.P)
    step = pow(w_ce, n, ref.P)
    vals, cur = [], base
    for _ in range(ce_blowup):
        vals.append(ref.inv((cur - 1) % ref.P))
        cur = (cur * step) % ref.P
    tiled = np.asarray([vals[i % ce_blowup] for i in range(d)], dtype=object)
    return _ints_to_limbs_np(tiled)


@functools.lru_cache(maxsize=None)
def _lin_inv_np(trace_length: int, ce_blowup: int, offset: int,
                steps: Tuple[int, ...]) -> np.ndarray:
    """(8, S, D) table of 1/(x - g^step) over the CE domain, host ints.
    Precomputing removes the in-graph f128.inv (a 127-round pow loop) from
    the composition executable."""
    n, d = trace_length, trace_length * ce_blowup
    g = ref.root_of_unity(n.bit_length() - 1)
    w_ce = ref.root_of_unity(d.bit_length() - 1)
    xs = []
    cur = offset % ref.P
    for _ in range(d):
        xs.append(cur)
        cur = (cur * w_ce) % ref.P
    rows = []
    for s in steps:
        gs = pow(g, s, ref.P)
        rows.append([ref.inv((x - gs) % ref.P) for x in xs])
    return _ints_to_limbs_np(rows)


@functools.lru_cache(maxsize=None)
def _fri_x_inv_np(log2_n: int, factor: int, offset: int) -> np.ndarray:
    """(8, n/factor) table of 1/x_c for the FRI fold (x_c = offset * w^c)."""
    m = (1 << log2_n) // factor
    w_inv_pows = ntt._offset_powers(log2_n - (factor.bit_length() - 1),
                                    ref.root_of_unity(log2_n), True)[:, :m]
    ints = _limbs_to_ints_np(np.asarray(w_inv_pows))
    o_inv = ref.inv(offset)
    return _ints_to_limbs_np([(x * o_inv) % ref.P for x in ints])


# ---------------------------------------------------------------------------
# Transition-constraint kernels (static registry; see module docstring)
# ---------------------------------------------------------------------------


def _transitions_fedavg_linear(ce: jnp.ndarray, nxt: jnp.ndarray,
                               params) -> jnp.ndarray:
    """k*S_next - k*S_curr - U_next over the d state columns
    (`src/aggregation/air.rs:109-115`).  params['k']: (8, C) limbs."""
    d = ce.shape[2] // 2
    k = params["k"][:, :, None, None]
    diff = f128.sub(nxt[:, :, :d], ce[:, :, :d])
    return f128.sub(f128.mul(k, diff), nxt[:, :, d:2 * d])


def _transitions_sgd_v2(ce: jnp.ndarray, nxt: jnp.ndarray,
                        params) -> jnp.ndarray:
    """Sound SGD-step constraints, batched over C statements
    (`models/training_v2.py` — trace layout and math documented there).

    ce/nxt: (8, C, 135, D).  params: per-proof scalars inv_pr/inv_lr/
    two_ac/inv_lrpr as (8, C) limbs, plus the caller-injected
    "periodic_ce" (8, 1, D) sel evaluations (shared across C — sel
    depends only on the public batch size)."""
    from ..models.ml_math import AC, FE

    d_state = AC * FE + AC
    x0, y0 = 2 * d_state, 2 * d_state + FE
    d_dom = ce.shape[-1]
    c = ce.shape[1]
    sel = params["periodic_ce"][:, 0]                    # (8, D)
    x_e = ce[:, :, x0:y0]                                # (8, C, FE, D)
    y_e = ce[:, :, y0:y0 + AC]                           # (8, C, AC, D)

    raw_cur = f128.sub(ce[:, :, :d_state], ce[:, :, d_state:x0])
    raw_nxt = f128.sub(nxt[:, :, :d_state], nxt[:, :, d_state:x0])
    w_cur = raw_cur[:, :, :AC * FE].reshape(8, c, AC, FE, d_dom)
    b_cur = raw_cur[:, :, AC * FE:]                      # (8, C, AC, D)

    inv_pr = params["inv_pr"][:, :, None, None]
    inv_lr = params["inv_lr"][:, :, None, None]
    two_ac = params["two_ac"][:, :, None, None]
    inv_lrpr = params["inv_lrpr"][:, :, None, None, None]

    prod = f128.mul(w_cur, x_e[:, :, None])              # (8, C, AC, FE, D)
    dot = prod[:, :, :, 0]
    for i in range(1, FE):
        dot = f128.add(dot, prod[:, :, :, i])
    pred = f128.add(f128.mul(dot, inv_pr), b_cur)
    err = f128.mul(f128.sub(pred, y_e), two_ac)          # (8, C, AC, D)

    gw = f128.mul(f128.mul(err[:, :, :, None], x_e[:, :, None]), inv_lrpr)
    gb = f128.mul(err, inv_lr)
    grad = jnp.concatenate(
        [gw.reshape(8, c, AC * FE, d_dom), gb], axis=2)  # (8, C, 60, D)

    return f128.add(f128.sub(raw_nxt, raw_cur),
                    f128.mul(sel[:, None, None], grad))


TRANSITION_KERNELS = {
    "fedavg_linear": _transitions_fedavg_linear,
    "sgd_v2": _transitions_sgd_v2,
}


# ---------------------------------------------------------------------------
# In-graph Merkle commitment (leaves + every level in one executable)
# ---------------------------------------------------------------------------


def _merkle_levels(leaves: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(C, N, 8) leaf digests -> tuple of levels up to the (C, 1, 8) root.
    One vectorized merge per level, all inside the enclosing jit."""
    levels = [leaves]
    cur = leaves
    while cur.shape[1] > 1:
        cur = b3.merge(cur[:, 0::2], cur[:, 1::2])
        levels.append(cur)
    return tuple(levels)


def _leaves_rows(evals: jnp.ndarray) -> jnp.ndarray:
    """Row leaves for a (8, C, W, N) evaluation tensor: leaf i of proof c =
    blake3 of row i's W canonical elements (winterfell `hash_elements`).

    Message assembly is WORDS-FIRST, feeding `hash_words_wf` directly so
    the hash pipeline never sees a lane-padded batch-last layout; the
    remaining temp cost (~2x message bytes, memory_analysis-checked) is
    the unavoidable staging of the transposed block stack."""
    c, w, n = evals.shape[1], evals.shape[2], evals.shape[3]
    words = f128.to_uint32_words(evals)               # (4, C, W, N)
    wf = jnp.transpose(words, (2, 0, 1, 3))           # (W, 4, C, N)
    wf = wf.reshape(w * 4, c, n)                      # word 4k+i = (val k, word i)
    leaves = b3.hash_words_wf(wf, w * 16)             # (8, C, N)
    return jnp.transpose(leaves, (1, 2, 0))           # (C, N, 8)


def _leaves_fri(evals: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Transposed-coset FRI leaves for (8, C, N): leaf c = blake3 of the
    factor coset values (`prover/fri.py::commit_layer` layout) — words-
    first assembly like `_leaves_rows`."""
    c, n = evals.shape[1], evals.shape[2]
    m = n // factor
    words = f128.to_uint32_words(evals)               # (4, C, N)
    words = words.reshape(4, c, factor, m)
    wf = jnp.transpose(words, (2, 0, 1, 3))           # (F, 4, C, m)
    wf = wf.reshape(factor * 4, c, m)
    leaves = b3.hash_words_wf(wf, factor * 16)        # (8, C, m)
    return jnp.transpose(leaves, (1, 2, 0))           # (C, m, 8)


# ---------------------------------------------------------------------------
# Phase 1: trace interpolation + LDE + commitment
# ---------------------------------------------------------------------------


def _trace_lde_commit_impl(stacked: jnp.ndarray, blowup: int, offset: int):
    # internal coefficient convention: BIT-REVERSED storage -> the iNTT
    # and every coset evaluation pay zero unscramble passes; transcript
    # values are order-independent extractions, proofs byte-identical
    polys = ntt.interpolate_bitrev(stacked)
    lde = ntt.coset_evaluate_from_bitrev(polys, offset, blowup)
    levels = _merkle_levels(_leaves_rows(lde))
    return polys, lde, levels


_trace_lde_commit_jit = jax.jit(_trace_lde_commit_impl,
                                static_argnums=(1, 2))


def trace_lde_commit(stacked: jnp.ndarray, blowup: int, offset: int):
    """(8, C, W, n) traces -> (polys, lde, merkle levels).

    One fused executable on TPU; on CPU the same composition runs eagerly
    over the per-op jits (XLA-CPU chokes on the fused graph)."""
    if use_fused():
        return _trace_lde_commit_jit(stacked, blowup, offset)
    return _trace_lde_commit_impl(stacked, blowup, offset)


# ---------------------------------------------------------------------------
# Phase 2: constraint composition + commitment
# ---------------------------------------------------------------------------


def composition_commit(kind, n, ce_blowup, m, offset, step_groups, blowup,
                       trace_polys, tparams, alphas_t, group_alphas,
                       group_vals, periodic=None):
    """Batched constraint composition over the CE domain + LDE + commit
    (fused executable on TPU, eager per-op on CPU)."""
    fn = (_composition_commit_jit if use_fused()
          else _composition_commit_impl)
    return fn(kind, n, ce_blowup, m, offset, step_groups, blowup,
              trace_polys, tparams, alphas_t, group_alphas, group_vals,
              periodic)


def _composition_commit_impl(kind: str, n: int, ce_blowup: int, m: int,
                             offset: int,
                             step_groups,
                             blowup: int,
                             trace_polys: jnp.ndarray, tparams,
                             alphas_t: jnp.ndarray,
                             group_alphas,
                             group_vals,
                             periodic: jnp.ndarray = None):
    """Batched constraint composition over the CE domain + LDE + commit.

    kind: transition kernel name ('zero' = inert, SURVEY.md pin #3).
    step_groups: static ((step, cols), ...) assertion structure.
    tparams: pytree of (8, C, ...) transition parameters.
    alphas_t: (8, C, K) transition batching coefficients.
    group_alphas/group_vals: per step-group (8, C, J) coefficient/value
    arrays.  periodic: optional (8, n_p, n) periodic-column values over
    the trace domain (shared across C) — CE-evaluated here and handed to
    the transition kernel as params["periodic_ce"].
    Returns (comp_cols, comp_lde, levels).
    """
    c = trace_polys.shape[1]
    d = n * ce_blowup
    log2_d = d.bit_length() - 1
    g = ref.root_of_unity(n.bit_length() - 1)

    ce = ntt.coset_evaluate_from_bitrev(trace_polys, offset,
                                        ce_blowup)           # (8, C, W, D)
    domain = jnp.asarray(_domain_np(log2_d, offset))

    if kind == "zero":
        total = f128.zeros((c, d))
    else:
        if periodic is not None:
            pe = ntt.coset_evaluate(ntt.interpolate(periodic), offset,
                                    ce_blowup)           # (8, n_p, D)
            tparams = dict(tparams, periodic_ce=pe)
        nxt = jnp.roll(ce, -ce_blowup, axis=-1)
        tvals = TRANSITION_KERNELS[kind](ce, nxt, tparams)   # (8, C, K, D)
        t_comb = poly.combine_axis(tvals, alphas_t, 2)       # (8, C, D)
        g_last = f128.from_int(pow(g, n - 1, ref.P)).reshape(8, 1, 1)
        zer_inv = jnp.asarray(_zerofier_inv_np(n, ce_blowup, offset))
        total = f128.mul(
            f128.mul(t_comb, zer_inv[:, None, :]),
            f128.sub(domain[:, None, :], g_last))

    steps = tuple(s for (s, _) in step_groups)
    lin_inv = jnp.asarray(_lin_inv_np(n, ce_blowup, offset, steps))
    for si, (s, cols) in enumerate(step_groups):
        diff = f128.sub(ce[:, :, list(cols), :],
                        group_vals[si][..., None])           # (8, C, J, D)
        num = poly.combine_axis(diff, group_alphas[si], 2)   # (8, C, D)
        total = f128.add(total, f128.mul(num, lin_inv[:, None, si]))

    coeffs_br = ntt.interpolate_bitrev(total, offset)        # (8, C, D)
    # degree-segment split in bitrev storage: segment `col` sits at
    # positions p = rev(col) (mod ce_blowup), bitrev-ordered within
    log_cb = ce_blowup.bit_length() - 1
    rev_cb = ([int(x) for x in ntt._bitrev_np(log_cb)] if log_cb else [0])
    comp_cols = jnp.stack(
        [coeffs_br[..., rev_cb[col]::ce_blowup] for col in range(m)],
        axis=2)
    comp_lde = ntt.coset_evaluate_from_bitrev(comp_cols, offset, blowup)
    levels = _merkle_levels(_leaves_rows(comp_lde))
    return comp_cols, comp_lde, levels


_composition_commit_jit = jax.jit(_composition_commit_impl,
                                  static_argnums=(0, 1, 2, 3, 4, 5, 6))


# ---------------------------------------------------------------------------
# Phase 3: out-of-domain evaluations (one executable, one pull)
# ---------------------------------------------------------------------------


def _ood_eval_impl(trace_polys: jnp.ndarray, comp_cols: jnp.ndarray,
                   z_arr: jnp.ndarray, zg_arr: jnp.ndarray):
    return (poly.eval_at_b_bitrev(trace_polys, z_arr),
            poly.eval_at_b_bitrev(trace_polys, zg_arr),
            poly.eval_at_b_bitrev(comp_cols, z_arr))


_ood_eval_jit = jax.jit(_ood_eval_impl)


def ood_eval(trace_polys, comp_cols, z_arr, zg_arr):
    fn = _ood_eval_jit if use_fused() else _ood_eval_impl
    return fn(trace_polys, comp_cols, z_arr, zg_arr)


# ---------------------------------------------------------------------------
# Phase 4: DEEP composition + first FRI layer commitment
# ---------------------------------------------------------------------------


def deep_fri0(log2_big, offset, factor, lde, comp_lde, g_cur, g_nxt,
              g_cmp, z_arr, zg_arr, ac_arr, b_arr):
    """DEEP + first FRI commit (fused on TPU, eager on CPU)."""
    fn = _deep_fri0_jit if use_fused() else _deep_fri0_impl
    return fn(log2_big, offset, factor, lde, comp_lde, g_cur, g_nxt,
              g_cmp, z_arr, zg_arr, ac_arr, b_arr)


def _deep_fri0_impl(log2_big: int, offset: int, factor: int,
              lde: jnp.ndarray, comp_lde: jnp.ndarray,
              g_cur: jnp.ndarray, g_nxt: jnp.ndarray, g_cmp: jnp.ndarray,
              z_arr: jnp.ndarray, zg_arr: jnp.ndarray,
              ac_arr: jnp.ndarray, b_arr: jnp.ndarray):
    """DEEP(x) over the LDE domain + the first FRI layer's Merkle levels.

    g_cur/g_nxt/g_cmp: (8, C, W|m) DEEP coefficients; z/zg: (8, C) points;
    ac/b: (8, C) combined OOD values.  Returns (deep, levels0)."""
    big_a = f128.add(poly.combine_axis(lde, g_cur, 2),
                     poly.combine_axis(comp_lde, g_cmp, 2))  # (8, C, N)
    big_b = poly.combine_axis(lde, g_nxt, 2)

    domain = jnp.asarray(_domain_np(log2_big, offset))       # (8, N)
    denoms = jnp.stack(
        [f128.sub(domain[:, None, :], z_arr[:, :, None]),
         f128.sub(domain[:, None, :], zg_arr[:, :, None])], axis=1)
    dinv = f128.inv(denoms)                                  # (8, 2, C, N)

    term1 = f128.mul(f128.sub(big_a, ac_arr[:, :, None]), dinv[:, 0])
    term2 = f128.mul(f128.sub(big_b, b_arr[:, :, None]), dinv[:, 1])
    deep = f128.add(term1, term2)                            # (8, C, N)
    levels0 = _merkle_levels(_leaves_fri(deep, factor))
    return deep, levels0


_deep_fri0_jit = jax.jit(_deep_fri0_impl, static_argnums=(0, 1, 2))


# ---------------------------------------------------------------------------
# Phase 5: FRI fold (+ next commit, or final remainder)
# ---------------------------------------------------------------------------


def _fold(evals: jnp.ndarray, betas: jnp.ndarray, offset: int,
          log2_n: int, factor: int) -> jnp.ndarray:
    """One batched FRI fold: (8, C, N) + per-proof betas (8, C) ->
    (8, C, N/F).  Coset algebra documented in `prover/fri.py`."""
    from . import fri as _fri

    n = 1 << log2_n
    c = evals.shape[1]
    m = n // factor
    logf = factor.bit_length() - 1
    # coset axis on LANES throughout: an (8, C, m, F) layout pads the
    # F-lane temps 8x (see prover/fri._ntt_small_axis1)
    v = evals.reshape(8, c, factor, m)
    a = _fri._ntt_small_axis1(v, logf, True)           # (8, C, F, m)
    x_inv = jnp.asarray(_fri_x_inv_np(log2_n, factor, offset))
    base = f128.mul(x_inv[:, None, :], betas[:, :, None])  # (8, C, m)
    powers = f128.ones((c, 1, m))                      # along axis -2
    step = base[:, :, None, :]
    cur = 1
    while cur < factor:
        powers = jnp.concatenate([powers, f128.mul(powers, step)], axis=-2)
        step = f128.mul(step, step)
        cur *= 2
    prod = f128.mul(a, powers)                         # (8, C, F, m)
    while prod.shape[-2] > 1:
        h = prod.shape[-2] // 2
        prod = f128.add(prod[..., :h, :], prod[..., h:, :])
    return prod[..., 0, :]


def _fri_fold_commit_impl(log2_n: int, offset: int, factor: int,
                          evals: jnp.ndarray, betas: jnp.ndarray):
    folded = _fold(evals, betas, offset, log2_n, factor)
    levels = _merkle_levels(_leaves_fri(folded, factor))
    return folded, levels


_fri_fold_commit_jit = jax.jit(_fri_fold_commit_impl,
                               static_argnums=(0, 1, 2))


def fri_fold_commit(log2_n, offset, factor, evals, betas):
    """Fold the current layer and commit the folded one (mid-pipeline FRI
    step).  Returns (folded, levels)."""
    fn = _fri_fold_commit_jit if use_fused() else _fri_fold_commit_impl
    return fn(log2_n, offset, factor, evals, betas)


def _fri_fold_final_impl(log2_n: int, offset: int, factor: int,
                         evals: jnp.ndarray, betas: jnp.ndarray):
    folded = _fold(evals, betas, offset, log2_n, factor)
    next_offset = pow(offset, factor, ref.P)
    return ntt.coset_interpolate(folded, next_offset)


_fri_fold_final_jit = jax.jit(_fri_fold_final_impl, static_argnums=(0, 1, 2))


def fri_fold_final(log2_n, offset, factor, evals, betas):
    """Final fold + remainder interpolation over the last coset.
    Returns (8, C, N/F) remainder coefficients."""
    fn = _fri_fold_final_jit if use_fused() else _fri_fold_final_impl
    return fn(log2_n, offset, factor, evals, betas)


# ---------------------------------------------------------------------------
# Phase 6: grinding (see prover/batch.py::find_pow_nonces)
# ---------------------------------------------------------------------------


def _pow_select(w0, w1, grinding_bits: int):
    """ok-mask + first-hit selection over (C, size) digest words."""
    if grinding_bits == 0:
        ok = jnp.ones_like(w1, dtype=bool)
    elif grinding_bits <= 32:
        ok = w1 < jnp.uint32(1 << (32 - grinding_bits))
    else:
        ok = (w1 == 0) & (w0 < jnp.uint32(1 << (64 - grinding_bits)))
    idx = jnp.argmax(ok, axis=1)
    found = jnp.take_along_axis(ok, idx[:, None], axis=1)[:, 0]
    return found, idx


@functools.partial(jax.jit, static_argnums=(3, 4))
def _pow_search_rows(seeds: jnp.ndarray, base_lo: jnp.ndarray,
                     base_hi: jnp.ndarray, grinding_bits: int,
                     chunk_log2: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-vector Blake3 grinding scan (CPU path)."""
    size = 1 << chunk_log2
    c = seeds.shape[0]
    offs = jnp.arange(size, dtype=jnp.uint32)
    lo = jnp.broadcast_to(base_lo + offs, (c, size))
    hi = jnp.broadcast_to(base_hi, (c, size))
    seed_b = jnp.broadcast_to(seeds[:, None, :], (c, size, 8))
    msg = jnp.concatenate(
        [seed_b, jnp.stack([lo, hi], axis=-1)], axis=-1)  # (C, size, 10)
    digests = b3.hash_words(msg, 40)                      # (C, size, 8)
    return _pow_select(digests[..., 0], digests[..., 1], grinding_bits)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _pow_search_pallas(seeds, base_lo, base_hi, grinding_bits: int,
                       chunk_log2: int):
    from ..ops import pow_pallas

    w0, w1 = pow_pallas.pow_digest_words(seeds, base_lo, base_hi,
                                         chunk_log2)
    return _pow_select(w0, w1, grinding_bits)


def pow_search(seeds: jnp.ndarray, base_lo: jnp.ndarray,
               base_hi: jnp.ndarray, grinding_bits: int,
               chunk_log2: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan one nonce chunk for C seeds at once: seeds (C, 8) uint32 ->
    (found (C,), offset (C,)).  Nonce qualifies iff LE-u64(digest[0:8]) has
    >= grinding_bits leading zeros (`RandomCoin::leading_zeros`).

    On TPU this runs the lane-parallel Pallas kernel (`ops/pow_pallas.py`);
    the generic row-vector Blake3 is ~50x slower there (the hash state
    rides 4-wide rows — 3% VPU lane utilization)."""
    if f128.use_pallas():
        return _pow_search_pallas(seeds, base_lo, base_hi, grinding_bits,
                                  chunk_log2)
    return _pow_search_rows(seeds, base_lo, base_hi, grinding_bits,
                            chunk_log2)


# ---------------------------------------------------------------------------
# Phase 7: query openings — every gather of the proof in one executable
# ---------------------------------------------------------------------------


def _sib_stack(levels: Tuple[jnp.ndarray, ...], idx: jnp.ndarray):
    """Authentication-path siblings for per-tree index lists.
    levels: merkle levels; idx: (C, Q) int32.  Returns (L, C, Q, 8)."""
    out = []
    for level in levels[:-1]:
        out.append(jnp.take_along_axis(level, (idx ^ 1)[:, :, None], axis=1))
        idx = idx >> 1
    return jnp.stack(out, axis=0)


def gather_openings(lde, comp_lde, trace_levels, comp_levels, fri_items,
                    pos):
    """Every opening gather in one executable (TPU) / eagerly (CPU)."""
    if use_fused():
        from . import aot
        return aot.call("gather_openings", (), _gather_openings_jit,
                        lde, comp_lde, trace_levels, comp_levels,
                        fri_items, pos)
    return _gather_openings_impl(lde, comp_lde, trace_levels, comp_levels,
                                 fri_items, pos)


def _gather_openings_impl(lde: jnp.ndarray, comp_lde: jnp.ndarray,
                          trace_levels, comp_levels, fri_items,
                          pos: jnp.ndarray):
    """One executable for every opening gather.

    pos: (C, Q) int32 query positions.  fri_items: tuple of
    (evals (8,C,N), levels, flat_idx (C, Q*F), coset_idx (C, Q)) per FRI
    layer (folded positions padded to Q on the host).  Returns
    (trace_rows, comp_rows, trace_sibs, comp_sibs, ((vals, sibs), ...)).
    """
    trace_rows = jnp.take_along_axis(lde, pos[None, :, None, :], axis=3)
    comp_rows = jnp.take_along_axis(comp_lde, pos[None, :, None, :], axis=3)
    trace_sibs = _sib_stack(trace_levels, pos)
    comp_sibs = _sib_stack(comp_levels, pos)
    fri_out = []
    for (evals, levels, flat_idx, coset_idx) in fri_items:
        vals = jnp.take_along_axis(evals, flat_idx[None, :, :], axis=2)
        fri_out.append((vals, _sib_stack(levels, coset_idx)))
    return trace_rows, comp_rows, trace_sibs, comp_sibs, tuple(fri_out)


_gather_openings_jit = jax.jit(_gather_openings_impl)
