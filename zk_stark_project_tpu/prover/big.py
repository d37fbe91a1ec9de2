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
  * composition: for the inert v1 AIR (SURVEY.md pin #3) the per-step
    boundary numerator sum_j coeff_j (T_j - v_j) is accumulated as ONE
    combined coefficient vector per assertion step (column-block
    streamed), then evaluated once per step on the CE domain; AIRs with
    REAL transition constraints (e.g. the sound v2) stream per
    interleaved coset of the trace subgroup instead
    (`_streamed_transition_quotient`) — within a coset the next-row
    frame is a roll, so arbitrary constraints evaluate at any trace
    size, like winterfell's DefaultConstraintEvaluator
    (`src/training/prover.rs:230-231`);
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
from .stark import ProverChannel, find_pow_nonce, group_assertions
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
        buf, ntt.interpolate_bitrev(blk), (0, start, 0))


@functools.partial(jax.jit, static_argnums=(2,))
def _slice_cols(polys: jnp.ndarray, start: jnp.ndarray,
                block: int) -> jnp.ndarray:
    """Columns [start, start+block) of the coefficient table as (8, B, n)
    red128 limbs.  The table may be stored PACKED as (4, W, n) canonical
    u32 words — half the bytes of the 8x16-bit limb form; at 2^20 x 240
    columns the unpacked table alone (7.7 GB) cannot coexist with any
    working set (usable HBM through the pool tunnel measured only
    ~5-7 GB in round 5; the packed 3.85 GB table + one block fits)."""
    lead = polys.shape[0]
    blk = jax.lax.dynamic_slice(polys, (0, start, 0),
                                (lead, block, polys.shape[2]))
    return f128.from_uint32_words(blk) if lead == 4 else blk


@jax.jit
def _coset_eval_words(polys_blk: jnp.ndarray,
                      coset_offset_limbs) -> jnp.ndarray:
    """Evaluate a column block on one coset and lay the canonical words
    out row-major: (n, B*4).  Coefficients and the offset-power table are
    in the module's BIT-REVERSED storage convention, so the coset NTT
    pays zero unscramble passes (`ntt.ntt_from_bitrev`)."""
    n = polys_blk.shape[-1]
    scaled = f128.mul(polys_blk, coset_offset_limbs)
    evals = ntt.ntt_from_bitrev(scaled)               # (8, B, n)
    words = f128.to_uint32_words(evals)               # (4, B, n)
    return jnp.transpose(words, (2, 1, 0)).reshape(n, -1)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _scatter_coset(leaves: jnp.ndarray, digests: jnp.ndarray,
                   c: jnp.ndarray, blowup: int) -> jnp.ndarray:
    """leaves[c::blowup] = digests (donated full-size leaf array)."""
    idx = c + blowup * jnp.arange(digests.shape[0], dtype=jnp.int32)
    return leaves.at[idx].set(digests)


def _offset_powers_dev(log2_n: int, offset: int) -> jnp.ndarray:
    """(8, n) powers of `offset` in BIT-REVERSED index order (matching
    the coefficient storage convention), in-graph-friendly."""
    return ntt.offset_powers_any(log2_n, offset, False, bitrev=True)


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


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _eval_coset_block(buf: jnp.ndarray, scaled_blk: jnp.ndarray,
                      start: jnp.ndarray, _b: int) -> jnp.ndarray:
    """buf[:, start:start+B] = NTT(scaled coeff block) (donated buffer);
    the block is in bitrev coefficient order."""
    return jax.lax.dynamic_update_slice(
        buf, ntt.ntt_from_bitrev(scaled_blk), (0, start, 0))


def _streamed_transition_quotient(air: Air, polys: jnp.ndarray,
                                  alphas, col_block: int,
                                  row_chunks: int = 4, throttle=None):
    """Transition + boundary quotients over the CE domain for an AIR with
    REAL transition constraints, evaluated per interleaved coset of the
    trace subgroup so the full (W, D_ce) frame table never materializes.

    The CE domain (size n * ce_blowup, coset of offset) splits into
    ce_blowup interleaved cosets of the n-subgroup: index j = q*B + c maps
    to offset * w_ce^c * g^q, so within coset c the next-row frame (x ->
    g*x) is simply q -> q+1 (a roll).  Winterfell's
    DefaultConstraintEvaluator evaluates arbitrary transition constraints
    at any trace size (`/root/reference/src/training/prover.rs:230-231`);
    this is the streaming equivalent.  Peak liveness: the (8, W, n)
    coefficient table + ONE (8, W, n) coset frame buffer + a 1/row_chunks
    constraint working set.

    Returns (8, n*ce_blowup) quotient evaluations, CE-domain order."""
    opts = air.options
    n = air.trace_length
    w = air.trace_width
    ce_blowup = air.ce_blowup
    d_ce = n * ce_blowup
    log2_n = n.bit_length() - 1
    log2_ce = d_ce.bit_length() - 1
    offset = air.domain_offset
    g = air.trace_domain_generator
    k_t = air.num_transition_constraints
    w_ce = ref.root_of_unity(log2_ce)

    alphas_t = f128.from_ints(np.asarray(alphas[:k_t], dtype=object))
    g_last = f128.from_int(pow(g, n - 1, P)).reshape(8, 1)
    groups = group_assertions(air.get_assertions())
    steps = sorted(groups)
    # 1/(x - g^step) over the FULL CE domain (one f128.inv pass, reused
    # sliced per coset); coset c owns indices c::ce_blowup
    domain_ce = _domain_inline(log2_ce, offset)
    lin_inv = {
        s_: f128.inv(f128.sub(domain_ce,
                              f128.from_int(pow(g, s_, P)).reshape(8, 1)))
        for s_ in steps}
    periodic = air.periodic_rows()
    per_polys = (ntt.interpolate_bitrev(f128.from_ints(periodic))
                 if periodic is not None else None)
    g_pows = ntt.offset_powers_any(log2_n, g, False)     # (8, n): g^q

    throttle = throttle or (lambda x: x)
    total_nc = f128.zeros((n, ce_blowup))                # [q, coset]
    chunk = max(1, n // row_chunks)
    for ci in range(ce_blowup):
        o_ci = (offset * pow(w_ce, ci, P)) % P
        off_pows = _offset_powers_dev(log2_n, o_ci)      # (8, n): o^k
        buf = f128.zeros((w, n))
        for s in range(0, w, col_block):
            e = min(s + col_block, w)
            blk = _slice_cols(polys, jnp.int32(s), e - s)
            buf = _eval_coset_block(buf, f128.mul(blk, off_pows),
                                    jnp.int32(s), e - s)
            throttle(buf)
        pe_ci = (ntt.ntt_from_bitrev(f128.mul(per_polys, off_pows))
                 if per_polys is not None else None)
        # transitions in row chunks (cur = buf[..., q], nxt = q+1 wrapped)
        zer_inv_ci = f128.from_int(
            ref.inv((pow(o_ci, n, P) - 1) % P)).reshape(8, 1)
        coset_dom = f128.mul(g_pows, f128.from_int(o_ci).reshape(8, 1))
        parts = []
        for qs in range(0, n, chunk):
            qe = min(qs + chunk, n)
            cur = buf[:, :, qs:qe]
            if qe < n:
                nxt = buf[:, :, qs + 1:qe + 1]
            else:
                nxt = jnp.concatenate(
                    [buf[:, :, qs + 1:], buf[:, :, :1]], axis=-1)
            pe_chunk = (pe_ci[:, :, qs:qe] if pe_ci is not None else None)
            if pe_chunk is not None:
                tvals = air.evaluate_transitions_jax(cur, nxt, pe_chunk)
            else:
                tvals = air.evaluate_transitions_jax(cur, nxt)
            parts.append(poly.combine(tvals, alphas_t))
            throttle(parts[-1])
        t_comb = jnp.concatenate(parts, axis=-1)         # (8, n)
        t_quot = f128.mul(f128.mul(t_comb, zer_inv_ci),
                          f128.sub(coset_dom, g_last))
        # boundary quotients on this coset
        for s_ in steps:
            entries = groups[s_]
            cols = [col for (_, col, _) in entries]
            vals = f128.from_ints(np.asarray(
                [v for (_, _, v) in entries], dtype=object))
            coeffs = f128.from_ints(np.asarray(
                [alphas[k_t + j] for (j, _, _) in entries], dtype=object))
            diff = f128.sub(buf[:, cols, :], vals[:, :, None])
            t_quot = f128.add(
                t_quot, f128.mul(poly.combine(diff, coeffs),
                                 lin_inv[s_][:, ci::ce_blowup]))
        total_nc = total_nc.at[:, :, ci].set(t_quot)
        del buf
    return total_nc.reshape(8, d_ce)


def prove_big(air: Air, trace: TraceTable = None, col_block: int = 64,
              progress=None, polys: jnp.ndarray = None) -> Proof:
    """Prove a statement whose LDE exceeds HBM, streaming by column
    blocks (and, for AIRs with real transition constraints, by CE-domain
    coset).  Transcript identical to `stark.prove_single_legacy`.

    Pass either `trace` (interpolated in place, block-wise) or `polys`
    (a prebuilt (8, W, n) or packed (4, W, n) coefficient table in the
    module's BIT-REVERSED storage convention — `ntt.interpolate_bitrev`
    order, as produced by `models/training.build_polys_streamed` — which
    never materializes the full trace).  The bitrev convention makes
    every coset evaluation and the iNTTs permutation-free; all
    transcript-visible values (roots, OOD ints, opened rows) are
    order-independent extractions, so proofs are byte-identical to the
    legacy path."""
    say = progress or (lambda *_: None)
    opts = air.options
    n = air.trace_length
    w = air.trace_width
    assert (trace is None) != (polys is None), "pass trace XOR polys"
    if trace is not None:
        assert trace.width == w and trace.length == n
    else:
        assert polys.shape in ((8, w, n), (4, w, n)), (
            "polys must be (8, W, n) limbs or (4, W, n) packed words")
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
    # backpressure for GB-scale streamed loops: async dispatch otherwise
    # enqueues every iteration's jitted ops at once and their transient
    # buffers are all live together (measured OOM at 2^20; see
    # `ops/merkle.MerkleTree.SYNC_LEAVES` for the same effect)
    throttle = ((lambda x: x.block_until_ready()) if n >= (1 << 19)
                else (lambda x: x))

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
                blk = _slice_cols(polys, jnp.int32(s2), e2 - s2)
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
        throttle(leaves)
    leaves.block_until_ready()
    say(f"leaf digests ({time.perf_counter() - t0:.1f}s)")
    trace_tree = merkle.MerkleTree(leaves)
    trace_root = trace_tree.root_bytes()
    channel.reseed_root(trace_root)
    say(f"trace committed ({time.perf_counter() - t0:.1f}s)")

    # ---- 3. composition -----------------------------------------------
    num_constraints = (air.num_transition_constraints
                       + len(air.get_assertions()))
    alphas = channel.coin.draw_coefficients(num_constraints, opts.batching)
    k_t = air.num_transition_constraints
    ce_blowup = air.ce_blowup
    d_ce = n * ce_blowup
    log2_ce = d_ce.bit_length() - 1
    if not getattr(air, "all_transitions_zero", False):
        # REAL transition constraints: per-coset streamed evaluation
        # (matches winterfell's any-size constraint evaluation,
        # `src/training/prover.rs:230-231`)
        total = _streamed_transition_quotient(air, polys, alphas,
                                              col_block, throttle=throttle)
    else:
        # inert transitions (v1 parity): boundary quotients only.  The
        # per-step numerator sum_j coeff_j (T_j(x) - v_j) factors as
        # (sum_j coeff_j T_j)(x) - sum_j coeff_j v_j, so accumulate ONE
        # combined (8, n) coefficient vector per assertion step over the
        # column blocks, then pay ONE CE-domain evaluation per step —
        # instead of a CE evaluation of every column (the per-block
        # (8, B, d_ce) working set OOM'd at 2^20 next to the resident
        # table; this path's peak is the table + one column block).
        # Exact mod-p algebra: same composition polynomial bit-for-bit
        # (canonicalization happens at the word/int extractions).
        groups = group_assertions(air.get_assertions())
        steps = sorted(groups)
        acc = {s_: f128.zeros((n,)) for s_ in steps}
        k_const = {
            s_: sum(alphas[k_t + j] * v for (j, _, v) in groups[s_]) % P
            for s_ in steps}
        for s in range(0, w, col_block):
            e = min(s + col_block, w)
            blk = _slice_cols(polys, jnp.int32(s), e - s)
            for s_ in steps:
                entries = [(j, col, v) for (j, col, v) in groups[s_]
                           if s <= col < e]
                if not entries:
                    continue
                cols = [col - s for (_, col, _) in entries]
                coeffs = f128.from_ints(np.asarray(
                    [alphas[k_t + j] for (j, _, _) in entries],
                    dtype=object))
                acc[s_] = _accum_combine(acc[s_], blk[:, cols, :], coeffs)
            throttle(acc[steps[-1]])
        domain_ce = _domain_inline(log2_ce, offset)
        total = f128.zeros((d_ce,))
        for s_ in steps:
            lin_inv_s = f128.inv(f128.sub(
                domain_ce, f128.from_int(pow(g, s_, P)).reshape(8, 1)))
            ce = ntt.coset_evaluate_from_bitrev(acc[s_], offset,
                                                ce_blowup)
            diff = f128.sub(ce, f128.from_int(k_const[s_]).reshape(8, 1))
            total = f128.add(total, f128.mul(diff, lin_inv_s))
            throttle(total)
        del domain_ce, acc
    # composition column split in bitrev storage: degree segment `col`
    # (coefficients col*n..col*n+n-1) occupies positions p = rev(col)
    # (mod ce_blowup), bitrev-ordered within — strided slices, no gather
    total_br = ntt.interpolate_bitrev(total, offset)
    log_cb = ce_blowup.bit_length() - 1
    rev_cb = ([int(x) for x in ntt._bitrev_np(log_cb)] if log_cb else [0])
    comp_cols = jnp.stack(
        [total_br[:, rev_cb[col]::ce_blowup] for col in range(m)], axis=1)
    del total, total_br
    # streamed comp commit: per interleaved coset, evaluate the m comp
    # columns on the n-subgroup coset and hash rows — identical leaves to
    # `commit_rows(coset_evaluate(comp_cols, offset, blowup))` without the
    # (8, m, N) LDE ever resident (1 GB at 2^24 the DEEP/FRI phases need)
    comp_leaves = jnp.zeros((big_n, 8), jnp.uint32)
    for c in range(blowup):
        off_c = (offset * pow(w24, c, P)) % P
        off_pows = _offset_powers_dev(log2_n, off_c)
        words = _coset_eval_words(comp_cols, off_pows)     # (n, m*4)
        dg = b3.hash_words(words, m * 16)
        comp_leaves = _scatter_coset(comp_leaves, dg, jnp.int32(c), blowup)
        throttle(comp_leaves)
    comp_tree = merkle.MerkleTree(comp_leaves)
    del comp_leaves
    comp_root = comp_tree.root_bytes()
    channel.reseed_root(comp_root)
    say(f"composition committed ({time.perf_counter() - t0:.1f}s)")

    # ---- 4. OOD evaluations -------------------------------------------
    z = channel.coin.draw()
    zg = (z * g) % P
    zpow = ntt._offset_powers_traced(log2_n, z, False, bitrev=True)
    zgpow = ntt._offset_powers_traced(log2_n, zg, False, bitrev=True)
    ood_cur: List[int] = []
    ood_nxt: List[int] = []
    for s in range(0, w, col_block):
        e = min(s + col_block, w)
        blk = _slice_cols(polys, jnp.int32(s), e - s)
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
        blk = _slice_cols(polys, jnp.int32(s), e - s)
        ca = _accum_combine(ca, blk, f128.from_ints(
            np.asarray(g_cur[s:e], dtype=object)))
        cb = _accum_combine(cb, blk, f128.from_ints(
            np.asarray(g_nxt[s:e], dtype=object)))
        throttle(cb)
    ca = _accum_combine(ca, comp_cols, f128.from_ints(
        np.asarray(g_cmp, dtype=object)))
    big_a = ntt.coset_evaluate_from_bitrev(ca, offset, blowup)  # (8, N)
    big_b = ntt.coset_evaluate_from_bitrev(cb, offset, blowup)
    a_val = sum(c * v for c, v in zip(g_cur, ood_cur)) % P
    b_val = sum(c * v for c, v in zip(g_nxt, ood_nxt)) % P
    c_val = sum(c * v for c, v in zip(g_cmp, ood_comp)) % P
    domain_big = _domain_inline(log2_big, offset)
    ac_l = f128.from_int((a_val + c_val) % P).reshape(8, 1)
    b_l = f128.from_int(b_val).reshape(8, 1)
    z_l = f128.from_int(z).reshape(8, 1)
    zg_l = f128.from_int(zg).reshape(8, 1)
    # segmented over the LDE domain: the in-graph f128.inv (127-round pow
    # chain) transiently holds several copies of its operand — one-shot at
    # 2^24 points OOMs next to the resident coefficient table
    seg = min(big_n, 1 << 22)
    parts = []
    for s in range(0, big_n, seg):
        e = min(s + seg, big_n)
        dom = domain_big[:, s:e]
        dinv = f128.inv(jnp.stack([f128.sub(dom, z_l),
                                   f128.sub(dom, zg_l)], axis=1))
        parts.append(f128.add(
            f128.mul(f128.sub(big_a[:, s:e], ac_l), dinv[:, 0]),
            f128.mul(f128.sub(big_b[:, s:e], b_l), dinv[:, 1])))
        throttle(parts[-1])
    deep = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    del big_a, big_b, parts, ca, cb, domain_big
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
            blk = _slice_cols(polys, jnp.int32(s), e - s)
            evals = ntt.ntt_from_bitrev(f128.mul(blk, off_pows))
            col_chunks.append(jnp.take(evals, qidx, axis=-1))  # (8, B, Q)
            throttle(col_chunks[-1])
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
    # comp rows: recompute only the queried cosets from the small
    # comp_cols table (same values `open_rows` would read off the LDE)
    comp_vals: Dict[int, List[int]] = {}
    for c, qs in by_coset.items():
        off_c = (offset * pow(w24, c, P)) % P
        off_pows = _offset_powers_dev(log2_n, off_c)
        qidx = jnp.asarray(np.asarray(qs, dtype=np.int32))
        evals = ntt.ntt_from_bitrev(f128.mul(comp_cols, off_pows))
        vals = f128.to_ints(np.asarray(jnp.take(evals, qidx, axis=-1)))
        for qi, q in enumerate(qs):
            comp_vals[q * blowup + c] = [int(vals[col, qi])
                                         for col in range(m)]
    comp_paths = comp_tree.prove_batch(positions)
    comp_openings = [
        MerkleOpening(position=int(p), values=comp_vals[p],
                      path=[np.asarray(s_).astype("<u4").tobytes()
                            for s_ in comp_paths[i]])
        for i, p in enumerate(positions)]
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
