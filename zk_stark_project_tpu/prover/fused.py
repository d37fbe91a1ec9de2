"""Whole-proof fused prover — Fiat–Shamir ON DEVICE, ONE dispatch total.

`prover/batch.py::prove_many` pays a host<->device round trip at every
transcript boundary (~7 per statement batch; ~25 ms each on a tunneled
chip — the dominant cost at reference shapes, SPEED.md §1).  This module
chains EVERY phase inside one executable by running the random coin
in-graph (`prover/device_coin.py`):

  dispatch     trace LDE+commit -> coin reseed/draw -> composition ->
               OOD -> DEEP -> all FRI folds -> grinding -> query draw ->
               FRI fold-position bookkeeping -> every opening gather
               (one jit per (statement shape, options))
  host         ONE pull of the transcript scalars + all opening values,
               then proof assembly (identical to prove_many's; the
               fold-position dedup is recomputed on host ints purely to
               size the per-layer opening lists — in-graph `fold_dev`
               reproduces the exact first-seen order)

The transcript is BIT-IDENTICAL to the host-coin path: same seeds, same
draws, same grinding nonce (first qualifying, in chunk-scan order), same
query positions — asserted in `tests/test_device_coin.py` and
`tests/test_fused_prove.py`.

Activation: `prove_many` delegates here when `phases.use_fused()` is true
(TPU, or ZKSTARK_FUSED=1) unless ZKSTARK_DEVICE_TRANSCRIPT=0; statements
without a registered transition kind fall back to the host-coin path.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blake3 as b3
from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import ntt
from . import device_coin as dc
from . import fri, phases, poly
from .air import Air
from .proof import Proof


def _grind_chunk(seed, lo, hi, grinding_bits: int, chunk_log2: int):
    """(found (C,), idx (C,)) for one nonce chunk, in-graph."""
    if f128.use_pallas():
        from ..ops import pow_pallas

        w0, w1 = pow_pallas.pow_digest_words(seed, lo, hi, chunk_log2)
    else:
        size = 1 << chunk_log2
        c = seed.shape[0]
        offs = jnp.arange(size, dtype=jnp.uint32)
        lo_b = jnp.broadcast_to(lo + offs, (c, size))
        hi_b = jnp.broadcast_to(hi, (c, size))
        seed_b = jnp.broadcast_to(seed[:, None, :], (c, size, 8))
        msg = jnp.concatenate(
            [seed_b, jnp.stack([lo_b, hi_b], axis=-1)], axis=-1)
        digests = b3.hash_words(msg, 40)
        w0, w1 = digests[..., 0], digests[..., 1]
    return phases._pow_select(w0, w1, grinding_bits)


@functools.lru_cache(maxsize=None)
def _dispatch_a(kind: str, n: int, w: int, c: int, ce_blowup: int, m: int,
                blowup: int, offset: int, step_groups, factor: int,
                n_layers: int, rem_len: int, num_constraints: int,
                k_trans: int, grinding_bits: int, num_queries: int,
                chunk_log2: int, tparam_meta, group_alpha_idx,
                n_periodic: int = 0):
    """Build the fused phase-1..grinding executable for one static config.

    group_alpha_idx: per step-group, the GLOBAL coefficient indices
    (k_trans + assertion index) of that group's alphas — assertion indices
    are not contiguous within a step group in general."""
    big_n = n * blowup
    log2_big = big_n.bit_length() - 1
    g = ref.root_of_unity(n.bit_length() - 1)

    def run(stacked, seed0, tparams, group_vals, periodic=None):
        # -- phase 1: trace LDE + commit --------------------------------
        trace_polys, lde, trace_levels = phases._trace_lde_commit_impl(
            stacked, blowup, offset)
        state = dc.coin_init(seed0)
        trace_root = trace_levels[-1][:, 0]            # (C, 8)
        state = dc.reseed(state, trace_root)

        # -- phase 2: composition ---------------------------------------
        alphas, state = dc.draw_powers(state, num_constraints)  # (8,C,K+A)
        alphas_t = alphas[:, :, :k_trans]
        group_alphas = [alphas[:, :, list(idx)] for idx in group_alpha_idx]
        comp_cols, comp_lde, comp_levels = phases._composition_commit_impl(
            kind, n, ce_blowup, m, offset, step_groups, blowup,
            trace_polys, tparams, alphas_t, tuple(group_alphas),
            group_vals, periodic)
        comp_root = comp_levels[-1][:, 0]
        state = dc.reseed(state, comp_root)

        # -- phase 3: OOD -----------------------------------------------
        z_arr, state = dc.draw(state)                   # (8, C)
        zg_arr = f128.mul(z_arr, f128.from_int(g).reshape(8, 1))
        e_cur, e_nxt, e_cmp = phases._ood_eval_impl(
            trace_polys, comp_cols, z_arr, zg_arr)
        state = dc.reseed_elements(
            state, jnp.concatenate([e_cur, e_nxt], axis=2))
        state = dc.reseed_elements(state, e_cmp)

        # -- phase 4: DEEP + first FRI commit ---------------------------
        deep_coeffs, state = dc.draw_powers(state, 2 * w + m)
        g_cur = deep_coeffs[:, :, :w]
        g_nxt = deep_coeffs[:, :, w:2 * w]
        g_cmp = deep_coeffs[:, :, 2 * w:2 * w + m]
        ac_arr = f128.add(poly.combine_axis(e_cur, g_cur, 2),
                          poly.combine_axis(e_cmp, g_cmp, 2))
        b_arr = poly.combine_axis(e_nxt, g_nxt, 2)
        deep, levels0 = phases._deep_fri0_impl(
            log2_big, offset, factor, lde, comp_lde,
            g_cur, g_nxt, g_cmp, z_arr, zg_arr, ac_arr, b_arr)

        # -- phase 5: FRI folds -----------------------------------------
        fri_layers = []     # (evals, levels, root) per committed layer
        cur_evals, cur_levels = deep, levels0
        cur_offset, cur_n = offset, big_n
        if n_layers == 0:
            rem_coeffs = ntt.coset_interpolate(deep, offset)
        for li in range(n_layers):
            log2_n = cur_n.bit_length() - 1
            root = cur_levels[-1][:, 0]
            state = dc.reseed(state, root)
            beta_arr, state = dc.draw(state)
            fri_layers.append((cur_evals, cur_levels, root))
            if li < n_layers - 1:
                folded = phases._fold(cur_evals, beta_arr, cur_offset,
                                      log2_n, factor)
                cur_levels = phases._merkle_levels(
                    phases._leaves_fri(folded, factor))
                cur_evals = folded
            else:
                rem_coeffs = phases._fri_fold_final_impl(
                    log2_n, cur_offset, factor, cur_evals, beta_arr)
            cur_offset = pow(cur_offset, factor, ref.P)
            cur_n //= factor
        state = dc.reseed_elements(state, rem_coeffs[:, :, :rem_len])

        # -- phase 6: grinding + query positions ------------------------
        seed, _ = state
        if grinding_bits == 0:
            nonce = jnp.zeros((c, 2), jnp.uint32)
        else:
            def cond(carry):
                return ~jnp.all(carry[2])

            def body(carry):
                start, nonce, found = carry
                f_c, idx = _grind_chunk(seed, start,
                                        jnp.uint32(0), grinding_bits,
                                        chunk_log2)
                newly = f_c & ~found
                hit = start + idx.astype(jnp.uint32)
                nonce = jnp.where(newly[:, None],
                                  jnp.stack([hit, jnp.zeros_like(hit)],
                                            axis=-1), nonce)
                return (start + jnp.uint32(1 << chunk_log2), nonce,
                        found | f_c)

            init = (jnp.uint32(0), jnp.zeros((c, 2), jnp.uint32),
                    jnp.zeros((c,), bool))
            _, nonce, _ = jax.lax.while_loop(cond, body, init)
        state = dc.reseed_with_u64(state, nonce)
        positions, state = dc.draw_integers(state, num_queries, big_n)

        # -- phase 7: opening gathers (merged — ONE dispatch, ONE pull) --
        # the fold-position bookkeeping (dedup in first-seen order, pad to
        # Q) runs in-graph so the gathers chain directly onto the query
        # draw; Q is small, so the O(Q^2) first-occurrence mask is free.
        q_iota = jnp.arange(num_queries, dtype=jnp.int32)
        earlier = jnp.asarray(
            np.tril(np.ones((num_queries, num_queries), dtype=bool), -1))

        def fold_dev(pos_arr, m_l):
            cosets = (pos_arr % m_l).astype(jnp.int32)
            eq = cosets[:, :, None] == cosets[:, None, :]
            dup = jnp.any(eq & earlier[None], axis=2)       # seen before
            order = jnp.argsort(
                jnp.where(dup, num_queries + q_iota, q_iota), axis=1)
            return jnp.take_along_axis(cosets, order, axis=1)

        items = []
        layer_pos = positions
        cur_n2 = big_n
        for (evals, levels, _root) in fri_layers:
            m_l = cur_n2 // factor
            folded_p = fold_dev(layer_pos, m_l)             # (C, Q) padded
            flat_idx = (folded_p[:, :, None]
                        + m_l * jnp.arange(factor, dtype=jnp.int32)
                        [None, None, :]).reshape(c, num_queries * factor)
            items.append((evals, levels, flat_idx, folded_p))
            layer_pos = folded_p
            cur_n2 //= factor
        gath = phases._gather_openings_impl(
            lde, comp_lde, trace_levels, comp_levels, tuple(items),
            positions)

        return (trace_root, comp_root, e_cur, e_nxt, e_cmp,
                tuple(l[2] for l in fri_layers), rem_coeffs, nonce,
                positions, gath)

    return jax.jit(run)


def prove_many_device(airs: Sequence[Air], traces: Sequence) -> List[Proof]:
    """prove_many with the transcript on device — 1 dispatch, 1 pull.
    Same restrictions as `prove_many`; transcripts bit-identical."""
    return collect_many_device(dispatch_many_device(airs, traces))


def dispatch_many_device(airs: Sequence[Air], traces: Sequence):
    """Dispatch the whole-proof executable WITHOUT pulling results.

    Returns an opaque pending handle for `collect_many_device`.  Dispatch
    is async (jax), so a caller can enqueue several client chunks
    back-to-back and the chip pipelines them while the host assembles
    earlier chunks' proofs — this is what removes the chunking penalty in
    `prover/batch.py::prove_many_chunked` (bs>=20 splits the 8-client
    fleet into HBM-bounded chunks; round-3 bench showed the serialized
    dispatch→pull→assemble loop costing ~2x at bs=20-40)."""
    from .batch import _stack_params
    from .stark import ProverChannel, _pow_chunk_log2, group_assertions

    c = len(airs)
    air0 = airs[0]
    opts = air0.options
    n, w = air0.trace_length, air0.trace_width
    kind = getattr(air0, "transition_kind", None)
    assert kind is not None
    pat0 = [(a.col, a.step) for a in air0.get_assertions()]
    for air, trace in zip(airs, traces):
        assert type(air) is type(air0)
        assert (air.trace_width, air.trace_length) == (w, n)
        assert air.options == opts
        assert [(a.col, a.step) for a in air.get_assertions()] == pat0

    big_n = air0.lde_domain_size
    offset = air0.domain_offset
    m = air0.num_composition_columns
    k = air0.num_transition_constraints
    factor = opts.fri_folding_factor
    n_layers = fri.num_fri_layers(n, factor, opts.fri_remainder_max_degree)
    rem_len = opts.fri_remainder_max_degree + 1
    q = opts.num_queries

    groups = group_assertions(air0.get_assertions())
    steps = sorted(groups)
    step_groups = tuple((s, tuple(col for (_, col, _) in groups[s]))
                        for s in steps)
    all_assertions = [air.get_assertions() for air in airs]
    group_vals = tuple(
        f128.from_ints(np.asarray(
            [[a_list[j].value for (j, _, _) in groups[s]]
             for a_list in all_assertions], dtype=object)) for s in steps)
    tparams = _stack_params(airs)
    tparam_meta = tuple(sorted((kk, v.ndim) for kk, v in tparams.items()))

    channels = [ProverChannel(air) for air in airs]
    seed0 = jnp.asarray(np.stack(
        [np.frombuffer(ch.coin.seed, dtype="<u4") for ch in channels]))

    group_alpha_idx = tuple(
        tuple(k + j for (j, _, _) in groups[s]) for s in steps)
    from .batch import _stack_periodic
    periodic = _stack_periodic(airs)
    n_periodic = 0 if periodic is None else periodic.shape[1]
    cfg = (kind, n, w, c, air0.ce_blowup, m, opts.blowup_factor,
           offset, step_groups, factor, n_layers, rem_len,
           k + len(pat0), k, opts.grinding_bits, q,
           _pow_chunk_log2(), tparam_meta, group_alpha_idx, n_periodic)
    fn = _dispatch_a(*cfg)
    stacked = jnp.stack([t.data for t in traces], axis=1)
    from . import aot
    if periodic is None:
        out = aot.call("dispatch_a", cfg, fn, stacked, seed0, tparams,
                       group_vals)
    else:
        out = aot.call("dispatch_a", cfg, fn, stacked, seed0, tparams,
                       group_vals, periodic)
    return (airs, out)


def collect_many_device(pending) -> List[Proof]:
    """Pull a `dispatch_many_device` batch and assemble its proofs."""
    from .proof import MerkleOpening

    airs, out = pending
    c = len(airs)
    air0 = airs[0]
    opts = air0.options
    n, w = air0.trace_length, air0.trace_width
    big_n = air0.lde_domain_size
    m = air0.num_composition_columns
    factor = opts.fri_folding_factor
    n_layers = fri.num_fri_layers(n, factor, opts.fri_remainder_max_degree)
    rem_len = opts.fri_remainder_max_degree + 1
    q = opts.num_queries

    # ---- ONE dispatch, ONE pull: transcript scalars + every opening ----
    (trace_root_np, comp_root_np, cur_np, nxt_np, cmp_np, fri_roots_np,
     rem_np, nonce_np, pos_np,
     (trace_rows, comp_rows, trace_sibs, comp_sibs,
      fri_out)) = jax.device_get(out)

    trace_roots = [r.astype("<u4").tobytes() for r in trace_root_np]
    comp_roots = [r.astype("<u4").tobytes() for r in comp_root_np]
    fri_roots = [[layer[i].astype("<u4").tobytes()
                  for layer in fri_roots_np] for i in range(c)]
    cur_ints = f128.to_ints(cur_np)
    nxt_ints = f128.to_ints(nxt_np)
    cmp_ints = f128.to_ints(cmp_np)
    ood_cur = [[int(x) for x in cur_ints[i]] for i in range(c)]
    ood_nxt = [[int(x) for x in nxt_ints[i]] for i in range(c)]
    ood_comp = [[int(x) for x in cmp_ints[i]] for i in range(c)]
    rem_ints = f128.to_ints(rem_np)
    remainders = []
    for i in range(c):
        coeffs_i = [int(x) for x in np.atleast_2d(rem_ints)[i]]
        assert all(v == 0 for v in coeffs_i[rem_len:]), \
            "FRI remainder exceeds max degree — prover bug"
        remainders.append(coeffs_i[:rem_len])
    nonces = [int(nonce_np[i, 0]) | (int(nonce_np[i, 1]) << 32)
              for i in range(c)]
    pos_arr = np.asarray(pos_np, dtype=np.int32)

    # ---- host bookkeeping (same fold order as the in-graph fold_dev) ---
    per_proof_pos = [list(map(int, pos_arr[i])) for i in range(c)]
    fri_host = []
    layer_pos = per_proof_pos
    cur_n = big_n
    for _ in range(n_layers):
        m_l = cur_n // factor
        folded = [fri.fold_positions(p, m_l) for p in layer_pos]
        fri_host.append((folded, m_l))
        layer_pos = folded
        cur_n //= factor

    trace_ints = f128.to_ints(trace_rows)
    comp_ints = f128.to_ints(comp_rows)

    def _row_openings(ints, sibs, width):
        out = []
        for i in range(c):
            openings = []
            for qi in range(q):
                vals = [int(ints[i, col, qi]) for col in range(width)]
                path = [sibs[ll, i, qi].astype("<u4").tobytes()
                        for ll in range(sibs.shape[0])]
                openings.append(MerkleOpening(
                    position=int(pos_arr[i, qi]), values=vals, path=path))
            out.append(openings)
        return out

    trace_open = _row_openings(trace_ints, trace_sibs, w)
    comp_open = _row_openings(comp_ints, comp_sibs, m)

    fri_open: List[List[List[MerkleOpening]]] = [[] for _ in range(c)]
    for (vals_a, sibs_a), (folded, m_l) in zip(fri_out, fri_host):
        ints = f128.to_ints(vals_a).reshape(c, q, factor)
        for i in range(c):
            openings = []
            for ci, coset in enumerate(folded[i]):
                ovals = [int(ints[i, ci, kk]) for kk in range(factor)]
                path = [sibs_a[ll, i, ci].astype("<u4").tobytes()
                        for ll in range(sibs_a.shape[0])]
                openings.append(MerkleOpening(
                    position=coset, values=ovals, path=path))
            fri_open[i].append(openings)

    return [Proof(
        trace_width=w, trace_length=n, options=opts,
        trace_root=trace_roots[i], comp_root=comp_roots[i],
        ood_trace_cur=ood_cur[i], ood_trace_next=ood_nxt[i],
        ood_comp=ood_comp[i],
        fri_roots=fri_roots[i], fri_remainder=remainders[i],
        pow_nonce=nonces[i],
        trace_openings=trace_open[i], comp_openings=comp_open[i],
        fri_openings=fri_open[i],
    ) for i in range(c)]
