"""Batched multi-proof STARK prover — many same-shaped statements at once.

The reference proves each device's training update sequentially in a host
loop (`src/main.rs:160-261`); the statements are independent, so the
TPU-native form stacks all C traces on a client axis and runs every device
phase (LDE, Merkle commitment, composition, OOD, DEEP, FRI folds, grinding,
query gathers) ONCE for all proofs.  Each phase is a single fused
executable (`prover/phases.py`), so host<->device latency — the dominant
cost at small trace sizes, especially over a tunneled chip — is paid per
*transcript boundary* (~7 syncs per batch) instead of per operation.

Layout: the limb axis stays leading, the client axis C sits right behind it
— (8, C, W, n) — so every f128/NTT primitive broadcasts over C with no
vmap and identical graph structure to the single-proof path.  On a
multi-chip mesh the client axis is the data-parallel sharding axis
(SURVEY.md §2 "Data parallel").

Transcripts stay strictly per-proof on the host (a `RandomCoin` per
statement, reseeded with that statement's roots/values only), so each proof
in the batch is BIT-IDENTICAL across batch sizes — `prove()` is the C == 1
case of this exact code path (tested in `tests/test_batch_prove.py`).

Restrictions: all statements must share AIR type, trace shape, proof
options, and assertion structure (same (col, step) pattern; values may
differ).  Transition constraints evaluate through the AIR's static
`transition_kind` (see `prover/phases.py::TRANSITION_KERNELS`); AIRs
without a kind fall back to the un-batched legacy path for C == 1.
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
from . import fri, phases, poly
from .air import Air
from .proof import MerkleOpening, Proof
from .stark import ProverChannel, _pow_chunk_log2, group_assertions


# ---------------------------------------------------------------------------
# Merkle forest wrapper over in-graph levels (kept for the parallel module)
# ---------------------------------------------------------------------------


class MerkleForest:
    """C Merkle trees over (C, N, 8) uint32 leaf digests, built together:
    every level is one vectorized merge over all trees."""

    def __init__(self, leaves: jnp.ndarray = None, levels=None):
        if levels is None:
            n = leaves.shape[1]
            assert n & (n - 1) == 0 and n >= 1
            levels = [leaves]
            cur = leaves
            while cur.shape[1] > 1:
                cur = b3.merge(cur[:, 0::2], cur[:, 1::2])
                levels.append(cur)
        self.levels = list(levels)
        self._roots_np = None

    def roots_bytes(self) -> List[bytes]:
        """All C roots, one device->host transfer."""
        if self._roots_np is None:
            self._roots_np = np.asarray(self.levels[-1][:, 0])  # (C, 8)
        return [r.astype("<u4").tobytes() for r in self._roots_np]

    def prove_all(self, positions: np.ndarray) -> np.ndarray:
        """Authentication paths for per-tree index lists.

        positions: (C, Q) int32.  Returns host (L, C, Q, 8) uint32 sibling
        digests, bottom level first."""
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
    return MerkleForest(phases._leaves_rows(evals))


def commit_fri_layer_b(evals: jnp.ndarray, factor: int) -> MerkleForest:
    """FRI layer commitment for (8, C, N) (transposed-coset leaves)."""
    return MerkleForest(phases._leaves_fri(evals, factor))


def fold_evals_b(evals: jnp.ndarray, betas: jnp.ndarray, offset: int,
                 log2_n: int, factor: int) -> jnp.ndarray:
    """Batched FRI fold: (8, C, N) + per-proof betas (8, C) -> (8, C, N/F)."""
    return phases._fold(evals, betas, offset, log2_n, factor)


# ---------------------------------------------------------------------------
# Batched grinding
# ---------------------------------------------------------------------------


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
        found, offs = phases.pow_search(
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


def _stack_params(airs: Sequence[Air]):
    """Stack per-proof transition parameters (dicts of python ints / nested
    int lists) into (8, C, ...) limb arrays."""
    dicts = [air.transition_params() for air in airs]
    if not dicts[0]:
        return {}
    out = {}
    for key in dicts[0]:
        out[key] = f128.from_ints(
            np.asarray([d[key] for d in dicts], dtype=object))
    return out


def _stack_periodic(airs: Sequence[Air]):
    """Shared (8, n_p, n) periodic-column limbs for a batch (or None).
    Periodic rows must be identical across the batch — they may depend
    only on public shape-level inputs (batch size, trace length)."""
    rows0 = airs[0].periodic_rows()
    if rows0 is None:
        return None
    for air in airs[1:]:
        assert np.array_equal(air.periodic_rows(), rows0), \
            "batched proving requires identical periodic columns"
    return f128.from_ints(rows0)


def _roots_of(levels) -> List[bytes]:
    """Pull the C roots of an in-graph level stack (ONE transfer — this is
    the per-phase transcript sync point)."""
    roots = np.asarray(levels[-1][:, 0])  # (C, 8)
    return [r.astype("<u4").tobytes() for r in roots]


def suggest_client_chunk(trace_width: int, trace_length: int,
                         blowup: int, budget_bytes: int = None) -> int:
    """How many same-shaped statements fit one batched prove_many call.

    The batch holds each client's LDE ((8, C, W, N) u32 = 32*W*N bytes per
    client), CE evaluations, polys and Merkle levels live simultaneously;
    at bs>=20 (4096-row traces) the full 8-client fleet exceeds v5e HBM.
    Defaults to a ~5 GB working budget (16 GB HBM minus transients and
    XLA slack); override with ZKSTARK_BATCH_BUDGET_GB."""
    import os

    if budget_bytes is None:
        budget_bytes = int(float(
            os.environ.get("ZKSTARK_BATCH_BUDGET_GB", "6")) * 1e9)
    n_lde = trace_length * blowup
    # ~6x the LDE footprint covers the peak liveness actually observed in
    # the fused executable (LDE + CE evals + leaf-word transposes + blake3
    # block padding + DEEP, several held simultaneously by XLA's buffer
    # assignment): a 5 GB budget at 32*W*N/client OOM'd a 16 GB chip at
    # bs=20 (W=240, N=65536).
    per_client = 6 * 32 * trace_width * n_lde
    return max(1, budget_bytes // max(per_client, 1))


def prove_many_chunked(airs: Sequence[Air], traces: Sequence) -> List[Proof]:
    """prove_many in memory-bounded client chunks (per-proof transcripts
    are chunking-invariant, `tests/test_batch_prove.py`).

    On the fused device-transcript backend the chunks are PIPELINED: every
    chunk's whole-proof executable is dispatched asynchronously up front
    (inputs are small; the HBM-bounded intermediates exist only while a
    chunk executes), then results are pulled and assembled in order — so
    host-side proof assembly of chunk i overlaps the chip running chunk
    i+1, instead of the serialized dispatch→pull→assemble loop that cost
    ~2x at bs=20–40 (round-3 bench_sweep)."""
    import os

    c = len(airs)
    if c == 0:
        return []
    chunk = suggest_client_chunk(airs[0].trace_width, airs[0].trace_length,
                                 airs[0].options.blowup_factor)
    if chunk >= c:
        return prove_many(airs, traces)
    kind = getattr(airs[0], "transition_kind", None)
    # same homogeneity contract as prove_many — the pipelined fast path
    # below calls dispatch_many_device per chunk, whose per-chunk asserts
    # would miss a fleet heterogeneous ACROSS chunk boundaries
    air0 = airs[0]
    pat0 = [(a.col, a.step) for a in air0.get_assertions()]
    for air, trace in zip(airs, traces):
        assert type(air) is type(air0)
        assert (air.trace_width, air.trace_length) == \
            (air0.trace_width, air0.trace_length)
        assert air.options == air0.options
        assert [(a.col, a.step) for a in air.get_assertions()] == pat0
        assert (trace.width, trace.length) == \
            (air0.trace_width, air0.trace_length)
    if (kind is not None and phases.use_fused()
            and os.environ.get("ZKSTARK_DEVICE_TRANSCRIPT") != "0"):
        from .fused import collect_many_device, dispatch_many_device

        pending = [dispatch_many_device(airs[i:i + chunk],
                                        traces[i:i + chunk])
                   for i in range(0, c, chunk)]
        return [p for pend in pending for p in collect_many_device(pend)]
    out: List[Proof] = []
    for i in range(0, c, chunk):
        out.extend(prove_many(airs[i:i + chunk], traces[i:i + chunk]))
    return out


def prove_many(airs: Sequence[Air], traces: Sequence,
               sharding=None, impl=None) -> List[Proof]:
    """Prove C same-shaped statements with batched, phase-fused device work.

    Per-proof transcripts are identical regardless of C — the batch only
    changes *where* the device work happens, never what any single proof's
    Merkle trees or Fiat–Shamir draws see.

    `sharding`: optional `jax.sharding.Sharding` for the stacked trace
    tensor (8, C, W, n) — pass `NamedSharding(mesh, P(None, "dp"))` to
    shard the client axis across a mesh; every phase is per-client
    independent, so XLA propagates the sharding with zero collectives
    (the data-parallel strategy, SURVEY.md §2).

    `impl`: optional namespace overriding the device-phase implementations
    (`trace_lde_commit`, `composition_commit`, `ood_eval`, `deep_fri0`,
    `fri_fold_commit`, `fri_fold_final`) — defaults to `prover.phases`.
    The tensor-parallel single-proof path (`parallel/tp_prove.py::TpPhases`)
    shards every heavy phase over a mesh through this hook.
    """
    impl = impl if impl is not None else phases
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
    kind = getattr(air0, "transition_kind", None)
    if kind is None:
        # arbitrary AIR without a registered batched transition kernel
        from .stark import prove_single_legacy
        assert c == 1, ("batched proving requires AIRs with a "
                        "transition_kind (see prover/phases.py)")
        return [prove_single_legacy(air0, traces[0])]
    # assertion structure must match (values may differ)
    pat0 = [(a.col, a.step) for a in air0.get_assertions()]
    for air in airs[1:]:
        assert [(a.col, a.step) for a in air.get_assertions()] == pat0

    # Device-transcript fast path: every phase + the Fiat–Shamir coin in
    # ONE executable, 2 dispatches total (prover/fused.py) — bit-identical
    # transcripts.  Used on the fused backend unless opted out; the dp-
    # sharded and tp-sharded paths keep the per-phase structure.
    import os
    if (sharding is None and impl is phases and phases.use_fused()
            and os.environ.get("ZKSTARK_DEVICE_TRANSCRIPT") != "0"):
        from .fused import prove_many_device
        return prove_many_device(airs, traces)

    big_n = air0.lde_domain_size
    log2_big = big_n.bit_length() - 1
    offset = air0.domain_offset
    g = air0.trace_domain_generator
    m = air0.num_composition_columns
    k = air0.num_transition_constraints
    factor = opts.fri_folding_factor

    channels = [ProverChannel(air) for air in airs]
    coins = [ch.coin for ch in channels]

    # 1. batched trace LDE + commitment  [1 dispatch, 1 sync]
    stacked = jnp.stack([t.data for t in traces], axis=1)  # (8, C, W, n)
    if sharding is not None:
        stacked = jax.device_put(stacked, sharding)
    trace_polys, lde, trace_levels = impl.trace_lde_commit(
        stacked, opts.blowup_factor, offset)
    trace_roots = _roots_of(trace_levels)
    for ch, root in zip(channels, trace_roots):
        ch.reseed_root(root)

    # 2. composition + commitment  [1 dispatch, 1 sync]
    groups = group_assertions(air0.get_assertions())
    steps = sorted(groups)
    step_groups = tuple((s, tuple(col for (_, col, _) in groups[s]))
                        for s in steps)
    num_constraints = k + len(pat0)
    alphas = [ch.coin.draw_coefficients(num_constraints, opts.batching)
              for ch in channels]
    all_assertions = [air.get_assertions() for air in airs]
    alphas_t = (_stack_felts([al[:k] for al in alphas]) if k
                else f128.zeros((c, 0)))
    group_alphas = tuple(
        _stack_felts([[al[k + j] for (j, _, _) in groups[s]]
                      for al in alphas]) for s in steps)
    group_vals = tuple(
        _stack_felts([[a_list[j].value for (j, _, _) in groups[s]]
                      for a_list in all_assertions]) for s in steps)
    tparams = _stack_params(airs)
    periodic = _stack_periodic(airs)
    comp_cols, comp_lde, comp_levels = impl.composition_commit(
        kind, n, air0.ce_blowup, m, offset, step_groups, opts.blowup_factor,
        trace_polys, tparams, alphas_t, group_alphas, group_vals, periodic)
    comp_roots = _roots_of(comp_levels)
    for ch, root in zip(channels, comp_roots):
        ch.reseed_root(root)

    # 3. OOD evaluations  [1 dispatch, 1 sync]
    zs = [ch.coin.draw() for ch in channels]
    zgs = [(z * g) % ref.P for z in zs]
    z_arr = _stack_felts([[z] for z in zs])[:, :, 0]    # (8, C)
    zg_arr = _stack_felts([[z] for z in zgs])[:, :, 0]
    e_cur, e_nxt, e_cmp = jax.device_get(impl.ood_eval(
        trace_polys, comp_cols, z_arr, zg_arr))
    cur_ints = f128.to_ints(e_cur)                      # (C, W) object
    nxt_ints = f128.to_ints(e_nxt)
    cmp_ints = f128.to_ints(e_cmp)
    ood_cur = [[int(x) for x in cur_ints[i]] for i in range(c)]
    ood_nxt = [[int(x) for x in nxt_ints[i]] for i in range(c)]
    ood_comp = [[int(x) for x in cmp_ints[i]] for i in range(c)]
    for i, ch in enumerate(channels):
        ch.reseed_elements(ood_cur[i] + ood_nxt[i])
        ch.reseed_elements(ood_comp[i])

    # 4. DEEP + first FRI layer commitment  [1 dispatch, 1 sync]
    deep_coeffs = [ch.coin.draw_coefficients(2 * w + m, opts.batching)
                   for ch in channels]
    g_cur = _stack_felts([dc[:w] for dc in deep_coeffs])
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
    ac_arr = _stack_felts([[v] for v in ac_vals])[:, :, 0]
    b_arr = _stack_felts([[v] for v in b_vals])[:, :, 0]

    n_layers = fri.num_fri_layers(n, factor, opts.fri_remainder_max_degree)
    deep, levels0 = impl.deep_fri0(
        log2_big, offset, factor, lde, comp_lde,
        g_cur, g_nxt, g_cmp, z_arr, zg_arr, ac_arr, b_arr)

    # 5. FRI commit phase  [1 dispatch + 1 sync per layer]
    layers_b = []        # (levels, evals, log2_n, roots) per committed layer
    cur_evals = deep
    cur_levels = levels0
    cur_offset = offset
    cur_n = big_n
    if n_layers == 0:
        # degree bound already <= remainder max: DEEP itself is the
        # remainder; no FRI commitments enter the transcript
        rem_coeffs = ntt.coset_interpolate(deep, offset)
    for li in range(n_layers):
        log2_n = cur_n.bit_length() - 1
        roots = _roots_of(cur_levels)
        betas = []
        for ch, root in zip(channels, roots):
            ch.reseed_root(root)
            betas.append(ch.coin.draw())
        layers_b.append((cur_levels, cur_evals, log2_n, roots))
        beta_arr = _stack_felts([[bt] for bt in betas])[:, :, 0]  # (8, C)
        if li < n_layers - 1:
            cur_evals, cur_levels = impl.fri_fold_commit(
                log2_n, cur_offset, factor, cur_evals, beta_arr)
        else:
            rem_coeffs = impl.fri_fold_final(
                log2_n, cur_offset, factor, cur_evals, beta_arr)
        cur_offset = pow(cur_offset, factor, ref.P)
        cur_n //= factor

    rem_ints = f128.to_ints(np.asarray(rem_coeffs))            # (C, rem)
    remainders = []
    max_deg = opts.fri_remainder_max_degree
    for i, ch in enumerate(channels):
        coeffs_i = [int(x) for x in np.atleast_2d(rem_ints)[i]]
        assert all(v == 0 for v in coeffs_i[max_deg + 1:]), \
            "FRI remainder exceeds max degree — prover bug"
        remainders.append(coeffs_i[: max_deg + 1])
        ch.reseed_elements(remainders[i])

    # 6. batched grinding + per-proof query positions  [1+ dispatch/sync]
    nonces = find_pow_nonces(coins, opts.grinding_bits)
    positions = []
    for ch, nonce in zip(channels, nonces):
        ch.coin.reseed_with_int(nonce)
        positions.append(ch.coin.draw_integers(opts.num_queries, big_n))
    pos_arr = np.asarray(positions, dtype=np.int32)            # (C, Q)
    q = opts.num_queries

    # 7. openings: every gather in one executable, one pull
    per_proof_pos = [list(map(int, pos_arr[i])) for i in range(c)]
    fri_host = []     # (folded lists, m) per layer, host side
    fri_items = []
    layer_pos = per_proof_pos
    for (levels, evals, log2_n, _) in layers_b:
        m_l = (1 << log2_n) // factor
        folded = [fri.fold_positions(p, m_l) for p in layer_pos]
        padded = np.asarray(
            [fp + [fp[0]] * (q - len(fp)) for fp in folded], dtype=np.int32)
        flat_idx = (padded[:, :, None] +
                    m_l * np.arange(factor, dtype=np.int32)[None, None, :])
        fri_host.append((folded, m_l))
        fri_items.append((evals, levels, jnp.asarray(flat_idx.reshape(c, q * factor)),
                          jnp.asarray(padded)))
        layer_pos = folded

    (trace_rows, comp_rows, trace_sibs, comp_sibs,
     fri_out) = jax.device_get(phases.gather_openings(
         lde, comp_lde, trace_levels, comp_levels, tuple(fri_items),
         jnp.asarray(pos_arr)))

    trace_ints = f128.to_ints(trace_rows)       # (C, W, Q) object
    comp_ints = f128.to_ints(comp_rows)

    def _row_openings(ints, sibs, width):
        out = []
        for i in range(c):
            openings = []
            for qi in range(q):
                vals = [int(ints[i, col, qi]) for col in range(width)]
                path = [sibs[l, i, qi].astype("<u4").tobytes()
                        for l in range(sibs.shape[0])]
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
                path = [sibs_a[l, i, ci].astype("<u4").tobytes()
                        for l in range(sibs_a.shape[0])]
                openings.append(MerkleOpening(
                    position=coset, values=ovals, path=path))
            fri_open[i].append(openings)

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
            fri_roots=[layers_b[li][3][i] for li in range(n_layers)],
            fri_remainder=remainders[i],
            pow_nonce=nonces[i],
            trace_openings=trace_open[i],
            comp_openings=comp_open[i],
            fri_openings=fri_open[i],
        ))
    return proofs
