"""Streaming prover for HUGE traces — the 2^20-row north star.

A 2^20-row training trace (240 columns) is 8 GB of f128 limbs; its
blowup-16 LDE is 129 GB — far beyond one chip's HBM, so the standard
provers (which materialize the full LDE for Merkle leaf hashing and the
opening gathers) cannot run it.  This module proves the same statement
with the same transcript (host coin, byte-identical contract) while never
holding more than the COEFFICIENT table (8 GB) plus one column-block
working set:

  * trace -> polys IN PLACE: per column block, iNTT with buffer donation
    (XLA aliases the 8 GB buffer, peak stays one buffer + block temps);
  * streamed trace commit: the 2^24 LDE domain is 16 interleaved cosets
    of the 2^20 subgroup (domain index i = c + 16q); per coset the
    240-column rows are hashed in blake3 CHUNK pieces (64 columns = one
    1024-byte chunk) via `ops/blake3.chunk_cv`, so only a 64-column
    block's coset evaluation (2 GB) is ever resident; chunk CVs merge
    into leaf digests, scattered into the (2^24, 8) leaf array;
  * composition: requires `all_transitions_zero` (the v1 training AIR,
    SURVEY.md pin #3) — boundary quotients accumulate per column block
    over the CE domain;
  * OOD / DEEP: gamma-combined trace polynomials are accumulated per
    block into TWO n-length coefficient vectors, then ONE blowup-16
    evaluation each builds the DEEP numerators (equivalent to
    `stark.build_deep_evals`, which combines the full LDE);
  * query openings: a second streamed pass recomputes only the queried
    cosets' column blocks and gathers the <= Q rows.

FRI, grinding and proof assembly reuse the standard pieces unchanged.
Verified by the ordinary host verifier (`verifier/verify.py`) — see
`analytics/big_proof.py` for the driver that records wall-clock/HBM.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blake3 as b3
from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import merkle, ntt
from . import fri, poly
from .air import Air
from .proof import MerkleOpening, Proof
from .stark import (ProverChannel, commit_rows, find_pow_nonce,
                    group_assertions, open_rows)
from .trace import TraceTable

P = ref.P


def _domain_inline(log2_size: int, offset: int) -> jnp.ndarray:
    """(8, 2^log2) domain table offset * w^i built with the in-graph
    doubling path — a 2^24 host-constant table is 512 MB and must never
    be embedded in an executable."""
    pows = ntt.offset_powers_any(log2_size, ref.root_of_unity(log2_size),
                                 False)
    return f128.mul(pows, f128.from_int(offset).reshape(8, 1))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
def _inplace_intt_block(buf: jnp.ndarray, start: jnp.ndarray,
                        block: int) -> jnp.ndarray:
    """iNTT columns [start, start+block) of (8, W, n) in place (donated)."""
    blk = jax.lax.dynamic_slice(
        buf, (0, start, 0), (8, block, buf.shape[2]))
    return jax.lax.dynamic_update_slice(
        buf, ntt.interpolate(blk), (0, start, 0))


@jax.jit
def _coset_eval_words(polys_blk: jnp.ndarray,
                      coset_offset_limbs) -> jnp.ndarray:
    """Evaluate a column block on one coset (plain NTT of offset-scaled
    coeffs) and lay the canonical words out row-major: (n, B*4)."""
    n = polys_blk.shape[-1]
    scaled = f128.mul(polys_blk, coset_offset_limbs)
    evals = ntt.ntt(scaled)                           # (8, B, n)
    words = f128.to_uint32_words(evals)               # (4, B, n)
    return jnp.transpose(words, (2, 1, 0)).reshape(n, -1)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _scatter_coset(leaves: jnp.ndarray, digests: jnp.ndarray,
                   c: jnp.ndarray, blowup: int) -> jnp.ndarray:
    """leaves[c::blowup] = digests (donated full-size leaf array)."""
    idx = c + blowup * jnp.arange(digests.shape[0], dtype=jnp.int32)
    return leaves.at[idx].set(digests)


def _offset_powers_dev(log2_n: int, offset: int) -> jnp.ndarray:
    """(8, n) powers of `offset`, in-graph-friendly."""
    return ntt.offset_powers_any(log2_n, offset, False)


@functools.partial(jax.jit, static_argnums=(2,))
def _dot_powers(polys_blk: jnp.ndarray, zpows: jnp.ndarray,
                log2_n: int) -> jnp.ndarray:
    """sum_k poly[., k] * z^k for each column of the block: (8, B)."""
    acc = f128.mul(polys_blk, zpows[:, None])
    for _ in range(log2_n):
        half = acc.shape[-1] // 2
        acc = f128.add(acc[..., :half], acc[..., half:])
    return acc[..., 0]


@jax.jit
def _accum_combine(acc: jnp.ndarray, blk: jnp.ndarray,
                   coeffs: jnp.ndarray) -> jnp.ndarray:
    """acc += sum_j coeffs[j] * blk[:, j] (over the column axis)."""
    return f128.add(acc, poly.combine(blk, coeffs))


def prove_big(air: Air, trace: TraceTable = None, col_block: int = 64,
              progress=None, polys: jnp.ndarray = None) -> Proof:
    """Prove a statement whose LDE exceeds HBM, streaming by column
    blocks.  Requires `air.all_transitions_zero` (inert transitions —
    the reference training AIR).  Transcript identical to
    `stark.prove_single_legacy`.

    Pass either `trace` (interpolated in place, block-wise) or `polys`
    (a prebuilt (8, W, n) coefficient table, e.g. from
    `models/training.build_polys_streamed` which never materializes the
    full trace)."""
    say = progress or (lambda *_: None)
    opts = air.options
    n = air.trace_length
    w = air.trace_width
    assert getattr(air, "all_transitions_zero", False), \
        "streaming composition implements boundary quotients only"
    assert (trace is None) != (polys is None), "pass trace XOR polys"
    if trace is not None:
        assert trace.width == w and trace.length == n
    else:
        assert polys.shape == (8, w, n)
    assert w * 16 > 1024, \
        "single-chunk rows need ROOT-flagged chunk_cv (width <= 64 fits " \
        "the standard provers anyway)"
    assert col_block % 4 == 0, \
        "col_block must be a multiple of 4: streamed leaf hashing feeds " \
        "blake3 in 64-byte blocks (4 columns x 16 bytes)"
    blowup = opts.blowup_factor
    big_n = air.lde_domain_size
    log2_big = big_n.bit_length() - 1
    log2_n = n.bit_length() - 1
    offset = air.domain_offset
    g = air.trace_domain_generator
    m = air.num_composition_columns
    w24 = ref.root_of_unity(log2_big)

    channel = ProverChannel(air)
    t0 = time.perf_counter()

    # ---- 1. trace -> polys, in place ----------------------------------
    if polys is None:
        buf = trace.data
        for s in range(0, w, col_block):
            buf = _inplace_intt_block(buf, jnp.int32(s),
                                      min(col_block, w - s))
        polys = buf
    polys.block_until_ready()
    say(f"polys in place ({time.perf_counter() - t0:.1f}s)")

    # ---- 2. streamed trace commit -------------------------------------
    # chunk layout of one 240-col row: 64+64+64+48 columns ->
    # 1024+1024+1024+768 bytes; each chunk is hashed incrementally in
    # `hash_cols`-column pieces (a full 64-column 2^20 coset eval plus
    # its NTT temporaries OOMs next to the 8 GB polys table)
    hash_cols = min(col_block, 32)
    chunk_cols: List[range] = []
    s = 0
    while s < w:
        e = min(s + 64, w)
        chunk_cols.append(range(s, e))
        s = e
    leaves = jnp.zeros((big_n, 8), jnp.uint32)
    for c in range(blowup):
        off_c = (offset * pow(w24, c, P)) % P
        off_pows = _offset_powers_dev(log2_n, off_c)
        cvs = []
        for k, cols in enumerate(chunk_cols):
            total_blocks = max(1, (len(cols) * 16 + 63) // 64)
            cv = None
            for s2 in range(cols.start, cols.stop, hash_cols):
                e2 = min(s2 + hash_cols, cols.stop)
                blk = jax.lax.dynamic_slice(
                    polys, (0, s2, 0), (8, e2 - s2, n))
                words = _coset_eval_words(blk, off_pows)
                b0 = (s2 - cols.start) * 16 // 64
                cv = b3.chunk_cv_update(cv, words, b0, total_blocks,
                                        len(cols) * 16, k)
            cvs.append(cv)
        if len(cvs) == 1:
            digests = cvs[0]
        else:
            while len(cvs) > 1:
                nxt = [b3.parent_cv(cvs[i], cvs[i + 1],
                                    len(cvs) == 2)
                       for i in range(0, len(cvs) - 1, 2)]
                if len(cvs) % 2:
                    nxt.append(cvs[-1])
                cvs = nxt
            digests = cvs[0]
        leaves = _scatter_coset(leaves, digests, jnp.int32(c), blowup)
    leaves.block_until_ready()
    say(f"leaf digests ({time.perf_counter() - t0:.1f}s)")
    trace_tree = merkle.MerkleTree(leaves)
    trace_root = trace_tree.root_bytes()
    channel.reseed_root(trace_root)
    say(f"trace committed ({time.perf_counter() - t0:.1f}s)")

    # ---- 3. composition (boundary quotients only) ---------------------
    num_constraints = (air.num_transition_constraints
                       + len(air.get_assertions()))
    alphas = channel.coin.draw_coefficients(num_constraints, opts.batching)
    k_t = air.num_transition_constraints
    ce_blowup = air.ce_blowup
    d_ce = n * ce_blowup
    log2_ce = d_ce.bit_length() - 1
    domain_ce = _domain_inline(log2_ce, offset)
    groups = group_assertions(air.get_assertions())
    steps = sorted(groups)
    lin_inv = {
        s_: f128.inv(f128.sub(domain_ce,
                              f128.from_int(pow(g, s_, P)).reshape(8, 1)))
        for s_ in steps}
    total = f128.zeros((d_ce,))
    for s in range(0, w, col_block):
        e = min(s + col_block, w)
        blk = jax.lax.dynamic_slice(polys, (0, s, 0), (8, e - s, n))
        ce_blk = ntt.coset_evaluate(blk, offset, ce_blowup)
        for s_ in steps:
            entries = [(j, col, v) for (j, col, v) in groups[s_]
                       if s <= col < e]
            if not entries:
                continue
            cols = [col - s for (_, col, _) in entries]
            vals = f128.from_ints(np.asarray(
                [v for (_, _, v) in entries], dtype=object))
            coeffs = f128.from_ints(np.asarray(
                [alphas[k_t + j] for (j, _, _) in entries], dtype=object))
            diff = f128.sub(ce_blk[:, cols, :], vals[:, :, None])
            total = f128.add(total,
                             f128.mul(poly.combine(diff, coeffs),
                                      lin_inv[s_]))
    comp_cols = ntt.coset_interpolate(total, offset).reshape(
        8, ce_blowup, n)[:, :m]
    comp_lde = ntt.coset_evaluate(comp_cols, offset, blowup)
    comp_tree = commit_rows(comp_lde)
    comp_root = comp_tree.root_bytes()
    channel.reseed_root(comp_root)
    say(f"composition committed ({time.perf_counter() - t0:.1f}s)")

    # ---- 4. OOD evaluations -------------------------------------------
    z = channel.coin.draw()
    zg = (z * g) % P
    zpow = ntt._offset_powers_traced(log2_n, z, False)
    zgpow = ntt._offset_powers_traced(log2_n, zg, False)
    ood_cur: List[int] = []
    ood_nxt: List[int] = []
    for s in range(0, w, col_block):
        e = min(s + col_block, w)
        blk = jax.lax.dynamic_slice(polys, (0, s, 0), (8, e - s, n))
        ood_cur += [int(x) for x in f128.to_ints(
            np.asarray(_dot_powers(blk, zpow, log2_n)))]
        ood_nxt += [int(x) for x in f128.to_ints(
            np.asarray(_dot_powers(blk, zgpow, log2_n)))]
    ood_comp = [int(x) for x in f128.to_ints(
        np.asarray(_dot_powers(comp_cols, zpow, log2_n)))]
    channel.reseed_elements(ood_cur + ood_nxt)
    channel.reseed_elements(ood_comp)
    say(f"OOD done ({time.perf_counter() - t0:.1f}s)")

    # ---- 5. DEEP + FRI -------------------------------------------------
    deep_coeffs = channel.coin.draw_coefficients(2 * w + m, opts.batching)
    g_cur = deep_coeffs[:w]
    g_nxt = deep_coeffs[w:2 * w]
    g_cmp = deep_coeffs[2 * w:2 * w + m]
    ca = f128.zeros((n,))
    cb = f128.zeros((n,))
    for s in range(0, w, col_block):
        e = min(s + col_block, w)
        blk = jax.lax.dynamic_slice(polys, (0, s, 0), (8, e - s, n))
        ca = _accum_combine(ca, blk, f128.from_ints(
            np.asarray(g_cur[s:e], dtype=object)))
        cb = _accum_combine(cb, blk, f128.from_ints(
            np.asarray(g_nxt[s:e], dtype=object)))
    ca = _accum_combine(ca, comp_cols, f128.from_ints(
        np.asarray(g_cmp, dtype=object)))
    big_a = ntt.coset_evaluate(ca, offset, blowup)     # (8, N)
    big_b = ntt.coset_evaluate(cb, offset, blowup)
    a_val = sum(c * v for c, v in zip(g_cur, ood_cur)) % P
    b_val = sum(c * v for c, v in zip(g_nxt, ood_nxt)) % P
    c_val = sum(c * v for c, v in zip(g_cmp, ood_comp)) % P
    domain_big = _domain_inline(log2_big, offset)
    dinv = f128.inv(jnp.stack([
        f128.sub(domain_big, f128.from_int(z).reshape(8, 1)),
        f128.sub(domain_big, f128.from_int(zg).reshape(8, 1))], axis=1))
    deep = f128.add(
        f128.mul(f128.sub(big_a,
                          f128.from_int((a_val + c_val) % P).reshape(8, 1)),
                 dinv[:, 0]),
        f128.mul(f128.sub(big_b, f128.from_int(b_val).reshape(8, 1)),
                 dinv[:, 1]))
    del big_a, big_b, dinv, ca, cb, domain_big
    say(f"DEEP built ({time.perf_counter() - t0:.1f}s)")

    fri_prover = fri.FriProver(opts.fri_folding_factor,
                               opts.fri_remainder_max_degree)
    fri_layers, fri_remainder = fri_prover.build_layers(
        channel, deep, offset, n)
    say(f"FRI committed ({time.perf_counter() - t0:.1f}s)")

    # ---- 6. grinding + positions --------------------------------------
    pow_nonce = find_pow_nonce(channel.coin, opts.grinding_bits)
    channel.coin.reseed_with_int(pow_nonce)
    positions = channel.coin.draw_integers(opts.num_queries, big_n)

    # ---- 7. openings ---------------------------------------------------
    # trace rows: recompute ONLY the queried cosets, streaming blocks
    by_coset: Dict[int, List[int]] = {}
    for i in positions:
        by_coset.setdefault(i % blowup, []).append(i // blowup)
    row_vals: Dict[int, List[int]] = {}
    for c, qs in by_coset.items():
        off_c = (offset * pow(w24, c, P)) % P
        off_pows = _offset_powers_dev(log2_n, off_c)
        qidx = jnp.asarray(np.asarray(qs, dtype=np.int32))
        col_chunks = []
        for s in range(0, w, col_block):
            e = min(s + col_block, w)
            blk = jax.lax.dynamic_slice(polys, (0, s, 0), (8, e - s, n))
            evals = ntt.ntt(f128.mul(blk, off_pows))
            col_chunks.append(jnp.take(evals, qidx, axis=-1))  # (8, B, Q)
        vals = f128.to_ints(np.asarray(jnp.concatenate(col_chunks,
                                                       axis=1)))
        for qi, q in enumerate(qs):
            row_vals[q * blowup + c] = [int(vals[col, qi])
                                        for col in range(w)]
    paths = trace_tree.prove_batch(positions)
    trace_openings = [
        MerkleOpening(position=p, values=row_vals[p],
                      path=[np.asarray(s_).astype("<u4").tobytes()
                            for s_ in paths[i]])
        for i, p in enumerate(positions)]
    comp_openings = open_rows(comp_lde, comp_tree, positions)
    fri_openings = fri_prover.open_queries(fri_layers, positions)
    say(f"openings done ({time.perf_counter() - t0:.1f}s)")

    return Proof(
        trace_width=w, trace_length=n, options=opts,
        trace_root=trace_root, comp_root=comp_root,
        ood_trace_cur=ood_cur, ood_trace_next=ood_nxt, ood_comp=ood_comp,
        fri_roots=[layer.tree.root_bytes() for layer in fri_layers],
        fri_remainder=fri_remainder, pow_nonce=pow_nonce,
        trace_openings=trace_openings, comp_openings=comp_openings,
        fri_openings=fri_openings,
    )
