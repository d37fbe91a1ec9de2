"""STARK prover — the full pipeline winterfell runs inside `prove()`
(invoked by the reference at `src/main.rs:228,468`):

  trace -> interpolation -> blowup-16 coset LDE -> Blake3 Merkle trace
  commitment -> constraint evaluation over the CE domain -> algebraic
  composition -> composition-poly commitment -> OOD (DEEP) evaluations at z
  -> DEEP composition polynomial -> FRI (fold 16) -> 21-bit grinding ->
  query openings.

Heavy phases (NTT/LDE, row hashing, constraint eval, DEEP, FRI folds,
grinding search) run on device as batched JAX ops; the Fiat–Shamir
transcript and proof assembly run on the host (they are sequential and
tiny).  The companion verifier (`verifier/verify.py`) is host-only python
ints for auditability.
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
from ..ops import merkle, ntt
from . import fri, poly
from .air import Air, Assertion
from .channel import RandomCoin, context_bytes, digest_words_to_bytes
from .proof import MerkleOpening, Proof


class ProverChannel:
    """Host-side wrapper pairing the random coin with proof assembly."""

    def __init__(self, air: Air):
        self.coin = RandomCoin(context_bytes(
            air.pub_input_bytes(), air.trace_width, air.trace_length,
            air.options))

    def reseed_root(self, root: bytes) -> None:
        self.coin.reseed(root)

    def reseed_elements(self, xs: Sequence[int]) -> None:
        self.coin.reseed_with_elements(xs)


# ---------------------------------------------------------------------------
# Device helpers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _domain_dev(log2_size: int, offset: int) -> jnp.ndarray:
    """Device table of the domain points offset * w^i, (8, 2^log2_size).
    Concrete even if first built under a trace (lru-cached device tables
    must never capture tracers)."""
    w = ref.root_of_unity(log2_size)
    with jax.ensure_compile_time_eval():
        pows = jnp.asarray(ntt._offset_powers(log2_size, w, False))
        return np.asarray(jax.block_until_ready(
            f128._mul_jnp(pows, f128.from_int(offset).reshape(8, 1))))


@functools.lru_cache(maxsize=None)
def _zerofier_inv_tile(trace_length: int, ce_blowup: int,
                       offset: int) -> jnp.ndarray:
    """inv(x^n - 1) over the CE domain — periodic with period ce_blowup, so
    it is a host-computed table tiled to (8, n*ce_blowup)."""
    n, d = trace_length, trace_length * ce_blowup
    w_ce = ref.root_of_unity(d.bit_length() - 1)
    base = pow(offset, n, ref.P)
    step = pow(w_ce, n, ref.P)
    vals = []
    cur = base
    for _ in range(ce_blowup):
        vals.append(ref.inv((cur - 1) % ref.P))
        cur = (cur * step) % ref.P
    # period pattern along the domain: index i -> vals[i % ce_blowup]
    tiled = np.asarray([vals[i % ce_blowup] for i in range(d)], dtype=object)
    return np.asarray(f128.from_ints(tiled))


def commit_rows(evals: jnp.ndarray) -> merkle.MerkleTree:
    """Merkle-commit a (8, W, N) evaluation matrix by rows: leaf i =
    blake3 of row i's W canonical 16-byte elements (winterfell
    `hash_elements` row layout)."""
    w = evals.shape[1]
    words = f128.to_uint32_words(evals)          # (4, W, N)
    words = jnp.transpose(words, (2, 1, 0))      # (N, W, 4)
    words = words.reshape(words.shape[0], w * 4)
    leaves = b3.hash_words(words, w * 16)
    return merkle.MerkleTree(leaves)


def _pow_chunk_log2() -> int:
    """Grinding nonces scanned per device dispatch.  On TPU a 2^21 chunk
    (the expected search space at 21 grinding bits) is one cheap dispatch,
    so the search usually finishes in a single device roundtrip; XLA-CPU
    compiles are per-element slow, so tests use a smaller chunk."""
    return 21 if jax.default_backend() == "tpu" else 18


@functools.partial(jax.jit, static_argnums=(3, 4))
def _pow_search(seed_words: jnp.ndarray, base_lo: jnp.ndarray,
                base_hi: jnp.ndarray, grinding_bits: int,
                chunk_log2: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grinding: scan a chunk of 2^chunk_log2 nonces, return
    (found_any, offset).

    Pure uint32 (TPUs/JAX-default have no u64): the chunk base is a multiple
    of the chunk size, so lo = base_lo + offset never carries into hi.
    """
    size = 1 << chunk_log2
    offs = jnp.arange(size, dtype=jnp.uint32)
    lo = base_lo + offs
    hi = jnp.broadcast_to(base_hi, lo.shape)
    digests = b3.merge_with_u64(seed_words, jnp.stack([lo, hi], axis=-1))
    # nonce qualifies iff LE-u64(digest[0:8]) < 2^(64-g); the u64's high half
    # is word 1, so for g <= 32 that is w1 < 2^(32-g), else w1 == 0 and
    # w0 < 2^(64-g).
    w0, w1 = digests[:, 0], digests[:, 1]
    if grinding_bits <= 32:
        ok = w1 < jnp.uint32(1 << (32 - grinding_bits)) if grinding_bits \
            else jnp.ones_like(w1, dtype=bool)
    else:
        ok = (w1 == 0) & (w0 < jnp.uint32(1 << (64 - grinding_bits)))
    idx = jnp.argmax(ok)
    return ok[idx], offs[idx]


def find_pow_nonce(coin: RandomCoin, grinding_bits: int) -> int:
    """Find a nonce with >= grinding_bits leading zeros (21 bits in the
    reference options, `src/main.rs:101`).  Batched search on device."""
    if grinding_bits == 0:
        return 0
    seed_words = jnp.asarray(
        np.frombuffer(coin.seed, dtype="<u4").copy())
    start = 0
    chunk_log2 = _pow_chunk_log2()
    while True:
        ok, off = _pow_search(
            seed_words,
            jnp.uint32(start & 0xFFFFFFFF),
            jnp.uint32(start >> 32),
            grinding_bits, chunk_log2)
        if bool(ok):
            nonce = start + int(off)
            assert coin.leading_zeros(nonce) >= grinding_bits
            return nonce
        start += 1 << chunk_log2


# ---------------------------------------------------------------------------
# Constraint composition
# ---------------------------------------------------------------------------


def group_assertions(assertions: Sequence[Assertion]) -> Dict[int, List[Tuple[int, int, int]]]:
    """Group by step -> list of (assertion_index, col, value)."""
    groups: Dict[int, List[Tuple[int, int, int]]] = {}
    for j, a in enumerate(assertions):
        groups.setdefault(a.step, []).append((j, a.col, a.value))
    return groups


def build_composition_columns(air: Air, trace_polys: jnp.ndarray,
                              alphas: List[int]) -> jnp.ndarray:
    """Evaluate the batched constraint quotients over the CE domain and
    split the composition polynomial into columns.

    trace_polys: (8, W, n) coefficients.  alphas: K + num_assertions
    batching coefficients (python ints).  Returns (8, m, n) column coeffs.
    """
    n = air.trace_length
    m = air.num_composition_columns
    ce_blowup = air.ce_blowup
    d = n * ce_blowup
    log2_d = d.bit_length() - 1
    offset = air.domain_offset
    k = air.num_transition_constraints
    g = air.trace_domain_generator

    ce = ntt.coset_evaluate(trace_polys, offset, ce_blowup)  # (8, W, D)
    domain = _domain_dev(log2_d, offset)

    if getattr(air, "all_transitions_zero", False):
        # inert transitions (the training AIR, SURVEY.md pin #3): skip the
        # whole transition pipeline — the quotient is identically zero.
        t_quot = f128.zeros((d,))
    else:
        nxt = jnp.roll(ce, -ce_blowup, axis=-1)
        # transition quotients: sum_i alpha_i T_i(x) * (x-g^{n-1}) / (x^n - 1)
        periodic = air.periodic_rows()
        if periodic is not None:
            pe = ntt.coset_evaluate(
                ntt.interpolate(f128.from_ints(periodic)), offset,
                ce_blowup)
            tvals = air.evaluate_transitions_jax(ce, nxt, pe)  # (8, K, D)
        else:
            tvals = air.evaluate_transitions_jax(ce, nxt)    # (8, K, D)
        alpha_t = f128.from_ints(np.asarray(alphas[:k], dtype=object))
        t_comb = poly.combine(tvals, alpha_t)                # (8, D)
        g_last = f128.from_int(pow(g, n - 1, ref.P)).reshape(8, 1)
        t_quot = f128.mul(
            f128.mul(t_comb, _zerofier_inv_tile(n, ce_blowup, offset)),
            f128.sub(domain, g_last))

    # boundary quotients, grouped by step (shared zerofier x - g^step)
    groups = group_assertions(air.get_assertions())
    steps = sorted(groups)
    lin = jnp.stack([f128.sub(domain, f128.from_int(pow(g, s, ref.P)).reshape(8, 1))
                     for s in steps], axis=1)                # (8, S, D)
    lin_inv = f128.inv(lin)
    total = t_quot
    for si, s in enumerate(steps):
        entries = groups[s]
        cols = [c for (_, c, _) in entries]
        vals = f128.from_ints(np.asarray([v for (_, _, v) in entries],
                                         dtype=object))      # (8, J)
        coeffs = f128.from_ints(np.asarray([alphas[k + j] for (j, _, _) in entries],
                                           dtype=object))    # (8, J)
        diff = f128.sub(ce[:, cols, :], vals[:, :, None])    # (8, J, D)
        num = poly.combine(diff, coeffs)                     # (8, D)
        total = f128.add(total, f128.mul(num, lin_inv[:, si]))

    coeffs_full = ntt.coset_interpolate(total, offset)       # (8, D)
    return coeffs_full.reshape(8, ce_blowup, n)[:, :m]


@jax.jit
def _ood_eval3(trace_polys: jnp.ndarray, comp_cols: jnp.ndarray,
               z: jnp.ndarray, zg: jnp.ndarray):
    """Trace polys at z and z*g plus composition columns at z, fused."""
    return (poly.eval_at(trace_polys, z),
            poly.eval_at(trace_polys, zg),
            poly.eval_at(comp_cols, z))


# ---------------------------------------------------------------------------
# DEEP composition
# ---------------------------------------------------------------------------


def build_deep_evals(lde: jnp.ndarray, comp_lde: jnp.ndarray,
                     deep_coeffs: List[int], z: int, zg: int,
                     ood_cur: List[int], ood_nxt: List[int],
                     ood_comp: List[int], log2_big: int,
                     offset: int) -> jnp.ndarray:
    """DEEP(x) = [A(x) + Cc(x) - (a + c)] / (x - z) + [B(x) - b] / (x - zg)
    where A/B/Cc are the gamma-weighted combinations of trace (cur/next
    coefficients) and composition columns.  Returns (8, N)."""
    w = lde.shape[1]
    m = comp_lde.shape[1]
    g_cur = f128.from_ints(np.asarray(deep_coeffs[:w], dtype=object))
    g_nxt = f128.from_ints(np.asarray(deep_coeffs[w:2 * w], dtype=object))
    g_cmp = f128.from_ints(np.asarray(deep_coeffs[2 * w:2 * w + m], dtype=object))

    a_val = sum(c * v for c, v in zip(deep_coeffs[:w], ood_cur)) % ref.P
    b_val = sum(c * v for c, v in zip(deep_coeffs[w:2 * w], ood_nxt)) % ref.P
    c_val = sum(c * v for c, v in zip(deep_coeffs[2 * w:], ood_comp)) % ref.P

    big_a = f128.add(poly.combine(lde, g_cur), poly.combine(comp_lde, g_cmp))
    big_b = poly.combine(lde, g_nxt)

    domain = _domain_dev(log2_big, offset)
    denoms = jnp.stack([
        f128.sub(domain, f128.from_int(z).reshape(8, 1)),
        f128.sub(domain, f128.from_int(zg).reshape(8, 1)),
    ], axis=1)                                               # (8, 2, N)
    dinv = f128.inv(denoms)

    term1 = f128.mul(f128.sub(big_a, f128.from_int((a_val + c_val) % ref.P).reshape(8, 1)),
                     dinv[:, 0])
    term2 = f128.mul(f128.sub(big_b, f128.from_int(b_val).reshape(8, 1)),
                     dinv[:, 1])
    return f128.add(term1, term2)


# ---------------------------------------------------------------------------
# Query opening
# ---------------------------------------------------------------------------


def open_rows(evals: jnp.ndarray, tree: merkle.MerkleTree,
              positions: Sequence[int]) -> List[MerkleOpening]:
    """Open Merkle leaves (= evaluation rows) at the given positions.
    Row values are gathered on device and pulled in one transfer."""
    positions = list(positions)
    pos = jnp.asarray(np.asarray(positions, dtype=np.int32))
    rows = np.asarray(jnp.take(evals, pos, axis=2))  # (8, W, P)
    ints = f128.to_ints(rows)                        # (W, P) python ints
    paths = tree.prove_batch(positions)
    out = []
    for q, (p, path) in enumerate(zip(positions, paths)):
        vals = [int(ints[c, q]) for c in range(rows.shape[1])]
        out.append(MerkleOpening(
            position=int(p), values=vals,
            path=[d.astype("<u4").tobytes() for d in path]))
    return out


# ---------------------------------------------------------------------------
# prove()
# ---------------------------------------------------------------------------


def prove(air: Air, trace) -> Proof:
    """Generate a STARK proof for `trace` satisfying `air`.

    Mirrors the phase structure of winterfell 0.12's `prove()` with the
    transcript layout documented in `prover/channel.py`.  Runs as the
    C == 1 case of the phase-fused batched prover (`prover/batch.py`);
    AIRs without a registered `transition_kind` take the legacy un-fused
    path below (`prove_single_legacy`).
    """
    from .batch import prove_many

    return prove_many([air], [trace])[0]


def prove_single_legacy(air: Air, trace) -> Proof:
    """Un-fused single-statement prover: one jitted op per pipeline step.

    Kept as the fallback for AIR classes that implement only the generic
    `evaluate_transitions_jax` (no static transition kernel), and as the
    readable reference for the phase structure.
    """
    opts = air.options
    n = air.trace_length
    w = air.trace_width
    assert trace.width == w and trace.length == n
    big_n = air.lde_domain_size
    log2_big = big_n.bit_length() - 1
    offset = air.domain_offset
    g = air.trace_domain_generator
    m = air.num_composition_columns

    channel = ProverChannel(air)

    # 1. trace LDE + commitment
    trace_polys = ntt.interpolate(trace.data)                       # (8, W, n)
    lde = ntt.coset_evaluate(trace_polys, offset, opts.blowup_factor)
    trace_tree = commit_rows(lde)
    trace_root = trace_tree.root_bytes()
    channel.reseed_root(trace_root)

    # 2. constraint composition + commitment
    num_constraints = air.num_transition_constraints + len(air.get_assertions())
    alphas = channel.coin.draw_coefficients(num_constraints, opts.batching)
    comp_cols = build_composition_columns(air, trace_polys, alphas)  # (8, m, n)
    comp_lde = ntt.coset_evaluate(comp_cols, offset, opts.blowup_factor)
    comp_tree = commit_rows(comp_lde)
    comp_root = comp_tree.root_bytes()
    channel.reseed_root(comp_root)

    # 3. OOD evaluations at z (and z*g for the next-row frame) — one fused
    # device call + one host transfer (the transcript reseeds are host-side
    # and strictly after all three evaluations, so fusing is sound)
    z = channel.coin.draw()
    zg = (z * g) % ref.P
    e_cur, e_nxt, e_comp = _ood_eval3(
        trace_polys, comp_cols, f128.from_int(z), f128.from_int(zg))
    (e_cur, e_nxt, e_comp) = jax.device_get((e_cur, e_nxt, e_comp))
    ood_cur = [int(x) for x in f128.to_ints(e_cur)]
    ood_nxt = [int(x) for x in f128.to_ints(e_nxt)]
    channel.reseed_elements(ood_cur + ood_nxt)
    ood_comp = [int(x) for x in f128.to_ints(e_comp)]
    channel.reseed_elements(ood_comp)

    # 4. DEEP composition polynomial over the LDE domain
    deep_coeffs = channel.coin.draw_coefficients(2 * w + m, opts.batching)
    deep = build_deep_evals(lde, comp_lde, deep_coeffs, z, zg,
                            ood_cur, ood_nxt, ood_comp, log2_big, offset)

    # 5. FRI commit phase
    fri_prover = fri.FriProver(opts.fri_folding_factor,
                               opts.fri_remainder_max_degree)
    fri_layers, fri_remainder = fri_prover.build_layers(
        channel, deep, offset, n)

    # 6. grinding + query positions
    pow_nonce = find_pow_nonce(channel.coin, opts.grinding_bits)
    channel.coin.reseed_with_int(pow_nonce)
    positions = channel.coin.draw_integers(opts.num_queries, big_n)

    # 7. openings (device-side gathers; no full-LDE host pull)
    trace_openings = open_rows(lde, trace_tree, positions)
    comp_openings = open_rows(comp_lde, comp_tree, positions)
    fri_openings = fri_prover.open_queries(fri_layers, positions)

    return Proof(
        trace_width=w,
        trace_length=n,
        options=opts,
        trace_root=trace_root,
        comp_root=comp_root,
        ood_trace_cur=ood_cur,
        ood_trace_next=ood_nxt,
        ood_comp=ood_comp,
        fri_roots=[layer.tree.root_bytes() for layer in fri_layers],
        fri_remainder=fri_remainder,
        pow_nonce=pow_nonce,
        trace_openings=trace_openings,
        comp_openings=comp_openings,
        fri_openings=fri_openings,
    )
