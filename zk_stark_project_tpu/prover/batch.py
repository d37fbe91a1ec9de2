"""Batched multi-proof STARK prover — many same-shaped statements at once.

The reference proves each device's training update sequentially in a host
loop (`src/main.rs:160-261`); the statements are independent, so the
TPU-native form stacks all C traces on a client axis and runs every device
phase (LDE, Merkle commitment, composition, OOD, DEEP, FRI folds, grinding,
query gathers) ONCE for all proofs.  Host<->device latency — the dominant
cost at small trace sizes, especially over a tunneled chip — is paid per
*phase* instead of per *proof*, and on a multi-chip mesh the client axis is
the data-parallel sharding axis (SURVEY.md §2 "Data parallel").

Layout: the limb axis stays leading, the client axis C sits right behind it
— (8, C, W, n) — so every f128/NTT primitive broadcasts over C with no
vmap and identical graph structure to the single-proof path.

Transcripts stay strictly per-proof on the host (a `RandomCoin` per
statement, reseeded with that statement's roots/values only), so each proof
in the batch is BIT-IDENTICAL to what `prove()` yields for that statement —
tested in `tests/test_batch_prove.py`.

Restrictions: all statements must share AIR type, trace shape, proof
options, and assertion structure (same (col, step) pattern; values may
differ).  For C > 1 the AIR must have inert transitions
(`all_transitions_zero`, true for the training AIR per SURVEY.md pin #3);
a single non-inert statement (C == 1) delegates to `prove()`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blake3 as b3
from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import ntt
from . import fri, poly
from .air import Air
from .proof import MerkleOpening, Proof
from .stark import (ProverChannel, _domain_dev, _pow_chunk_log2,
                    _zerofier_inv_tile, group_assertions, prove)


# ---------------------------------------------------------------------------
# Batched Merkle forest: C trees built level-parallel
# ---------------------------------------------------------------------------


class MerkleForest:
    """C Merkle trees over (C, N, 8) uint32 leaf digests, built together:
    every level is one vectorized merge over all trees."""

    def __init__(self, leaves: jnp.ndarray):
        n = leaves.shape[1]
        assert n & (n - 1) == 0 and n >= 1
        levels = [leaves]
        cur = leaves
        while cur.shape[1] > 1:
            cur = b3.merge(cur[:, 0::2], cur[:, 1::2])
            levels.append(cur)
        self.levels = levels
        self._roots_np = None

    def roots_bytes(self) -> List[bytes]:
        """All C roots, one device->host transfer."""
        if self._roots_np is None:
            self._roots_np = np.asarray(self.levels[-1][:, 0])  # (C, 8)
        return [r.astype("<u4").tobytes() for r in self._roots_np]

    def prove_all(self, positions: np.ndarray) -> np.ndarray:
        """Authentication paths for per-tree index lists.

        positions: (C, Q) int32.  Returns host (L, C, Q, 8) uint32 sibling
        digests, bottom level first — gathered on device, pulled in ONE
        transfer."""
        # always copy: `idx >>= 1` below must never mutate the caller's array
        idx = np.array(positions, dtype=np.int32, copy=True)
        gathered = []
        for level in self.levels[:-1]:
            sib = jnp.take_along_axis(
                level, jnp.asarray(idx ^ 1)[:, :, None], axis=1)  # (C, Q, 8)
            gathered.append(sib)
            idx >>= 1
        return np.asarray(jnp.stack(gathered, axis=0))


def commit_rows_b(evals: jnp.ndarray) -> MerkleForest:
    """Merkle-commit (8, C, W, N) evaluations by rows, per client."""
    w = evals.shape[2]
    words = f128.to_uint32_words(evals)               # (4, C, W, N)
    words = jnp.transpose(words, (1, 3, 2, 0))        # (C, N, W, 4)
    words = words.reshape(words.shape[0], words.shape[1], w * 4)
    leaves = b3.hash_words(words, w * 16)             # (C, N, 8)
    return MerkleForest(leaves)


def commit_fri_layer_b(evals: jnp.ndarray, factor: int) -> MerkleForest:
    """FRI layer commitment for (8, C, N): leaf c = blake3 of the F
    transposed-coset values (same layout as `fri.commit_layer`)."""
    c, n = evals.shape[1], evals.shape[2]
    m = n // factor
    words = f128.to_uint32_words(evals)               # (4, C, N)
    words = words.reshape(4, c, factor, m)
    words = jnp.transpose(words, (1, 3, 2, 0))        # (C, m, F, 4)
    words = words.reshape(c, m, factor * 4)
    leaves = b3.hash_words(words, factor * 16)
    return MerkleForest(leaves)


# ---------------------------------------------------------------------------
# Batched FRI fold
# ---------------------------------------------------------------------------


def fold_evals_b(evals: jnp.ndarray, betas: jnp.ndarray, offset: int,
                 log2_n: int, factor: int) -> jnp.ndarray:
    """Batched FRI fold: (8, C, N) + per-proof betas (8, C) -> (8, C, N/F).
    Same math as `fri.fold_evals` (see there for the coset algebra)."""
    n = 1 << log2_n
    c = evals.shape[1]
    m = n // factor
    assert evals.shape == (8, c, n)
    v = evals.reshape(8, c, factor, m)
    v = jnp.moveaxis(v, 2, 3)                          # (8, C, m, F)
    a = ntt.ntt(v, inverse=True)
    w_inv_pows = ntt._offset_powers(log2_n - (factor.bit_length() - 1),
                                    ref.root_of_unity(log2_n), True)[:, :m]
    o_inv = f128.from_int(ref.inv(offset)).reshape(8, 1)
    x_inv = f128.mul(jnp.asarray(w_inv_pows), o_inv)   # (8, m)
    base = f128.mul(x_inv[:, None, :], betas[:, :, None])  # (8, C, m)
    powers = poly.powers_of_b(base, 1 << max(0, (factor - 1).bit_length()))
    powers = powers[..., :factor]                      # (8, C, m, F)
    return poly.tree_sum(f128.mul(a, powers))


# ---------------------------------------------------------------------------
# Batched grinding
# ---------------------------------------------------------------------------


def _pow_search_b(seeds: jnp.ndarray, base_lo: jnp.ndarray,
                  base_hi: jnp.ndarray, grinding_bits: int,
                  chunk_log2: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan one nonce chunk for C seeds at once: seeds (C, 8) uint32 ->
    (found (C,), offset (C,))."""
    size = 1 << chunk_log2
    c = seeds.shape[0]
    offs = jnp.arange(size, dtype=jnp.uint32)
    lo = jnp.broadcast_to(base_lo + offs, (c, size))
    hi = jnp.broadcast_to(base_hi, (c, size))
    seed_b = jnp.broadcast_to(seeds[:, None, :], (c, size, 8))
    msg = jnp.concatenate(
        [seed_b, jnp.stack([lo, hi], axis=-1)], axis=-1)  # (C, size, 10)
    digests = b3.hash_words(msg, 40)                      # (C, size, 8)
    w0, w1 = digests[..., 0], digests[..., 1]
    if grinding_bits <= 32:
        ok = w1 < jnp.uint32(1 << (32 - grinding_bits)) if grinding_bits \
            else jnp.ones_like(w1, dtype=bool)
    else:
        ok = (w1 == 0) & (w0 < jnp.uint32(1 << (64 - grinding_bits)))
    idx = jnp.argmax(ok, axis=1)
    found = jnp.take_along_axis(ok, idx[:, None], axis=1)[:, 0]
    return found, idx


_pow_search_b = jax.jit(_pow_search_b, static_argnums=(3, 4))


def find_pow_nonces(coins, grinding_bits: int) -> List[int]:
    """Batched proof-of-work: one device dispatch scans a chunk for every
    proof's seed; unlucky seeds keep scanning in later chunks."""
    c = len(coins)
    if grinding_bits == 0:
        return [0] * c
    seeds = jnp.asarray(np.stack(
        [np.frombuffer(coin.seed, dtype="<u4") for coin in coins]))
    nonces: List[int] = [-1] * c
    start = 0
    chunk_log2 = _pow_chunk_log2()
    while any(n < 0 for n in nonces):
        found, offs = _pow_search_b(
            seeds, jnp.uint32(start & 0xFFFFFFFF), jnp.uint32(start >> 32),
            grinding_bits, chunk_log2)
        found_np, offs_np = np.asarray(found), np.asarray(offs)
        for i in range(c):
            if nonces[i] < 0 and bool(found_np[i]):
                nonce = start + int(offs_np[i])
                assert coins[i].leading_zeros(nonce) >= grinding_bits
                nonces[i] = nonce
        start += 1 << chunk_log2
    return nonces


# ---------------------------------------------------------------------------
# prove_many
# ---------------------------------------------------------------------------


def _stack_felts(rows: Sequence[Sequence[int]]) -> jnp.ndarray:
    """(C, K) python ints -> (8, C, K) device limbs."""
    return f128.from_ints(np.asarray(rows, dtype=object))


def _composition_b(air0: Air, airs: Sequence[Air], trace_polys: jnp.ndarray,
                   alphas: List[List[int]]) -> jnp.ndarray:
    """Batched composition columns for inert-transition AIRs: only boundary
    quotients contribute (`build_composition_columns` is the C=1 twin)."""
    n = air0.trace_length
    m = air0.num_composition_columns
    ce_blowup = air0.ce_blowup
    d = n * ce_blowup
    log2_d = d.bit_length() - 1
    offset = air0.domain_offset
    k = air0.num_transition_constraints
    g = air0.trace_domain_generator

    ce = ntt.coset_evaluate(trace_polys, offset, ce_blowup)  # (8, C, W, D)
    zer_inv = jnp.asarray(_zerofier_inv_tile(n, ce_blowup, offset))

    groups0 = group_assertions(air0.get_assertions())
    all_assertions = [air.get_assertions() for air in airs]
    steps = sorted(groups0)
    domain = jnp.asarray(_domain_dev(log2_d, offset))
    lin = jnp.stack(
        [f128.sub(domain, f128.from_int(pow(g, s, ref.P)).reshape(8, 1))
         for s in steps], axis=1)                # (8, S, D)
    lin_inv = f128.inv(lin)

    total = f128.zeros((len(airs), d))
    for si, s in enumerate(steps):
        entries = groups0[s]
        cols = [col for (_, col, _) in entries]
        # per-proof assertion values and batching coefficients
        vals = _stack_felts([[a_list[j].value for (j, _, _) in entries]
                             for a_list in all_assertions])      # (8, C, J)
        coeffs = _stack_felts([[al[k + j] for (j, _, _) in entries]
                               for al in alphas])                # (8, C, J)
        diff = f128.sub(ce[:, :, cols, :], vals[..., None])      # (8,C,J,D)
        num = poly.combine_axis(diff, coeffs, 2)                 # (8, C, D)
        total = f128.add(total, f128.mul(num, lin_inv[:, None, si]))

    coeffs_full = ntt.coset_interpolate(total, offset)           # (8, C, D)
    return coeffs_full.reshape(8, len(airs), ce_blowup, n)[:, :, :m]


def _deep_b(lde: jnp.ndarray, comp_lde: jnp.ndarray,
            deep_coeffs: List[List[int]], zs: List[int], zgs: List[int],
            ood_cur: List[List[int]], ood_nxt: List[List[int]],
            ood_comp: List[List[int]], log2_big: int,
            offset: int) -> jnp.ndarray:
    """Batched DEEP composition (per-proof randomness), (8, C, N)."""
    c, w = lde.shape[1], lde.shape[2]
    m = comp_lde.shape[2]
    g_cur = _stack_felts([dc[:w] for dc in deep_coeffs])          # (8, C, W)
    g_nxt = _stack_felts([dc[w:2 * w] for dc in deep_coeffs])
    g_cmp = _stack_felts([dc[2 * w:2 * w + m] for dc in deep_coeffs])

    ac_vals, b_vals = [], []
    for i in range(c):
        a_val = sum(cc * v for cc, v in zip(deep_coeffs[i][:w],
                                            ood_cur[i])) % ref.P
        b_val = sum(cc * v for cc, v in zip(deep_coeffs[i][w:2 * w],
                                            ood_nxt[i])) % ref.P
        c_val = sum(cc * v for cc, v in zip(deep_coeffs[i][2 * w:],
                                            ood_comp[i])) % ref.P
        ac_vals.append((a_val + c_val) % ref.P)
        b_vals.append(b_val)

    big_a = f128.add(poly.combine_axis(lde, g_cur, 2),
                     poly.combine_axis(comp_lde, g_cmp, 2))       # (8, C, N)
    big_b = poly.combine_axis(lde, g_nxt, 2)

    domain = jnp.asarray(_domain_dev(log2_big, offset))           # (8, N)
    z_arr = _stack_felts([[z] for z in zs])                       # (8, C, 1)
    zg_arr = _stack_felts([[zg] for zg in zgs])
    dinv = f128.inv(jnp.stack(
        [f128.sub(domain[:, None, :], z_arr),
         f128.sub(domain[:, None, :], zg_arr)], axis=1))          # (8,2,C,N)

    ac_arr = _stack_felts([[v] for v in ac_vals])                 # (8, C, 1)
    b_arr = _stack_felts([[v] for v in b_vals])
    term1 = f128.mul(f128.sub(big_a, ac_arr), dinv[:, 0])
    term2 = f128.mul(f128.sub(big_b, b_arr), dinv[:, 1])
    return f128.add(term1, term2)


def _open_rows_b(evals: jnp.ndarray, forest: MerkleForest,
                 positions: np.ndarray) -> List[List[MerkleOpening]]:
    """Batched row openings: evals (8, C, W, N), positions (C, Q)."""
    c, w = evals.shape[1], evals.shape[2]
    q = positions.shape[1]
    idx = jnp.asarray(positions, dtype=jnp.int32)
    rows = jnp.take_along_axis(evals, idx[None, :, None, :], axis=3)
    rows_np = np.asarray(rows)                        # (8, C, W, Q)
    ints = f128.to_ints(rows_np)                      # (C, W, Q) object
    sibs = forest.prove_all(positions)                # (L, C, Q, 8)
    out = []
    for i in range(c):
        openings = []
        for qi in range(q):
            vals = [int(ints[i, col, qi]) for col in range(w)]
            path = [sibs[l, i, qi].astype("<u4").tobytes()
                    for l in range(sibs.shape[0])]
            openings.append(MerkleOpening(
                position=int(positions[i, qi]), values=vals, path=path))
        out.append(openings)
    return out


def _open_fri_b(layers_b, factor: int,
                positions: np.ndarray) -> List[List[List[MerkleOpening]]]:
    """Batched FRI query openings.  positions (C, Q).  Returns
    [proof][layer][opening].  Gathers are padded to Q cosets per layer
    (static shapes across proofs)."""
    c, q = positions.shape
    per_proof_pos = [list(map(int, positions[i])) for i in range(c)]
    out: List[List[List[MerkleOpening]]] = [[] for _ in range(c)]
    for (forest, evals, log2_n) in layers_b:
        n = 1 << log2_n
        m = n // factor
        folded = [fri.fold_positions(p, m) for p in per_proof_pos]
        padded = np.asarray(
            [f + [f[0]] * (q - len(f)) for f in folded], dtype=np.int32)
        # flat gather index per proof: coset c -> [k*m + c for k in range(F)]
        flat_idx = (padded[:, :, None] +
                    m * np.arange(factor, dtype=np.int32)[None, None, :])
        flat_idx = flat_idx.reshape(c, q * factor)
        vals = jnp.take_along_axis(
            evals, jnp.asarray(flat_idx)[None, :, :], axis=2)  # (8, C, Q*F)
        ints = f128.to_ints(np.asarray(vals)).reshape(c, q, factor)
        sibs = forest.prove_all(padded)                        # (L, C, Q, 8)
        for i in range(c):
            openings = []
            for ci, coset in enumerate(folded[i]):
                ovals = [int(ints[i, ci, kk]) for kk in range(factor)]
                path = [sibs[l, i, ci].astype("<u4").tobytes()
                        for l in range(sibs.shape[0])]
                openings.append(MerkleOpening(
                    position=coset, values=ovals, path=path))
            out[i].append(openings)
        per_proof_pos = folded
    return out


def prove_many(airs: Sequence[Air], traces: Sequence,
               sharding=None) -> List[Proof]:
    """Prove C same-shaped statements with batched device phases.

    Per-proof transcripts are identical to `prove()`'s — the batch only
    changes *where* the device work happens, never what any single proof's
    Merkle trees or Fiat–Shamir draws see.

    `sharding`: optional `jax.sharding.Sharding` for the stacked trace
    tensor (8, C, W, n) — pass `NamedSharding(mesh, P(None, "dp"))` to
    shard the client axis across a mesh; every phase is per-client
    independent, so XLA propagates the sharding with zero collectives
    (the data-parallel strategy, SURVEY.md §2).
    """
    c = len(airs)
    assert c == len(traces) and c >= 1
    air0 = airs[0]
    opts = air0.options
    n = air0.trace_length
    w = air0.trace_width
    for air, trace in zip(airs, traces):
        assert type(air) is type(air0)
        assert (air.trace_width, air.trace_length) == (w, n)
        assert air.options == opts
        assert trace.width == w and trace.length == n
    if c == 1 and sharding is None:
        return [prove(air0, traces[0])]
    assert getattr(air0, "all_transitions_zero", False), \
        "batched proving requires inert-transition AIRs (use prove() for " \
        "single non-inert statements)"
    # assertion structure must match (values may differ)
    pat0 = [(a.col, a.step) for a in air0.get_assertions()]
    for air in airs[1:]:
        assert [(a.col, a.step) for a in air.get_assertions()] == pat0

    big_n = air0.lde_domain_size
    log2_big = big_n.bit_length() - 1
    offset = air0.domain_offset
    g = air0.trace_domain_generator
    m = air0.num_composition_columns

    channels = [ProverChannel(air) for air in airs]
    coins = [ch.coin for ch in channels]

    # 1. batched trace LDE + commitment
    stacked = jnp.stack([t.data for t in traces], axis=1)  # (8, C, W, n)
    if sharding is not None:
        stacked = jax.device_put(stacked, sharding)
    trace_polys = ntt.interpolate(stacked)
    lde = ntt.coset_evaluate(trace_polys, offset, opts.blowup_factor)
    trace_forest = commit_rows_b(lde)
    trace_roots = trace_forest.roots_bytes()
    for ch, root in zip(channels, trace_roots):
        ch.reseed_root(root)

    # 2. composition + commitment (inert transitions: boundary-only)
    num_constraints = (air0.num_transition_constraints
                       + len(air0.get_assertions()))
    alphas = [ch.coin.draw_coefficients(num_constraints, opts.batching)
              for ch in channels]
    comp_cols = _composition_b(air0, airs, trace_polys, alphas)  # (8,C,m,n)
    comp_lde = ntt.coset_evaluate(comp_cols, offset, opts.blowup_factor)
    comp_forest = commit_rows_b(comp_lde)
    comp_roots = comp_forest.roots_bytes()
    for ch, root in zip(channels, comp_roots):
        ch.reseed_root(root)

    # 3. OOD evaluations (one fused gather for all proofs)
    zs = [ch.coin.draw() for ch in channels]
    zgs = [(z * g) % ref.P for z in zs]
    z_arr = _stack_felts([[z] for z in zs])[:, :, 0]    # (8, C)
    zg_arr = _stack_felts([[z] for z in zgs])[:, :, 0]
    e_cur = poly.eval_at_b(trace_polys, z_arr)          # (8, C, W)
    e_nxt = poly.eval_at_b(trace_polys, zg_arr)
    e_cmp = poly.eval_at_b(comp_cols, z_arr)            # (8, C, m)
    e_cur, e_nxt, e_cmp = jax.device_get((e_cur, e_nxt, e_cmp))
    cur_ints = f128.to_ints(e_cur)                      # (C, W) object
    nxt_ints = f128.to_ints(e_nxt)
    cmp_ints = f128.to_ints(e_cmp)
    ood_cur = [[int(x) for x in cur_ints[i]] for i in range(c)]
    ood_nxt = [[int(x) for x in nxt_ints[i]] for i in range(c)]
    ood_comp = [[int(x) for x in cmp_ints[i]] for i in range(c)]
    for i, ch in enumerate(channels):
        ch.reseed_elements(ood_cur[i] + ood_nxt[i])
        ch.reseed_elements(ood_comp[i])

    # 4. batched DEEP composition
    deep_coeffs = [ch.coin.draw_coefficients(2 * w + m, opts.batching)
                   for ch in channels]
    deep = _deep_b(lde, comp_lde, deep_coeffs, zs, zgs,
                   ood_cur, ood_nxt, ood_comp, log2_big, offset)

    # 5. batched FRI commit phase
    factor = opts.fri_folding_factor
    n_layers = fri.num_fri_layers(n, factor, opts.fri_remainder_max_degree)
    layers_b = []
    cur_evals = deep
    cur_offset = offset
    cur_n = big_n
    for _ in range(n_layers):
        log2_n = cur_n.bit_length() - 1
        forest = commit_fri_layer_b(cur_evals, factor)
        roots = forest.roots_bytes()
        betas = []
        for ch, root in zip(channels, roots):
            ch.reseed_root(root)
            betas.append(ch.coin.draw())
        layers_b.append((forest, cur_evals, log2_n))
        beta_arr = _stack_felts([[bt] for bt in betas])[:, :, 0]  # (8, C)
        cur_evals = fold_evals_b(cur_evals, beta_arr, cur_offset,
                                 log2_n, factor)
        cur_offset = pow(cur_offset, factor, ref.P)
        cur_n //= factor

    rem_coeffs = ntt.coset_interpolate(cur_evals, cur_offset)  # (8, C, rem)
    rem_ints = f128.to_ints(np.asarray(rem_coeffs))            # (C, rem)
    remainders = []
    max_deg = opts.fri_remainder_max_degree
    for i, ch in enumerate(channels):
        coeffs_i = [int(x) for x in rem_ints[i]]
        assert all(v == 0 for v in coeffs_i[max_deg + 1:]), \
            "FRI remainder exceeds max degree — prover bug"
        remainders.append(coeffs_i[: max_deg + 1])
        ch.reseed_elements(remainders[i])

    # 6. batched grinding + per-proof query positions
    nonces = find_pow_nonces(coins, opts.grinding_bits)
    positions = []
    for ch, nonce in zip(channels, nonces):
        ch.coin.reseed_with_int(nonce)
        positions.append(ch.coin.draw_integers(opts.num_queries, big_n))
    pos_arr = np.asarray(positions, dtype=np.int32)            # (C, Q)

    # 7. batched openings
    trace_open = _open_rows_b(lde, trace_forest, pos_arr)
    comp_open = _open_rows_b(comp_lde, comp_forest, pos_arr)
    fri_open = _open_fri_b(layers_b, factor, pos_arr)

    proofs = []
    for i in range(c):
        proofs.append(Proof(
            trace_width=w,
            trace_length=n,
            options=opts,
            trace_root=trace_roots[i],
            comp_root=comp_roots[i],
            ood_trace_cur=ood_cur[i],
            ood_trace_next=ood_nxt[i],
            ood_comp=ood_comp[i],
            fri_roots=[layers_b[li][0].roots_bytes()[i]
                       for li in range(n_layers)],
            fri_remainder=remainders[i],
            pow_nonce=nonces[i],
            trace_openings=trace_open[i],
            comp_openings=comp_open[i],
            fri_openings=fri_open[i],
        ))
    return proofs
