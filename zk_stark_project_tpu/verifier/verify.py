"""STARK verifier — host-side, pure python ints, auditable.

Mirrors winterfell's `verify::<Air, Blake3_256, DefaultRandomCoin, MerkleTree>`
as the reference calls it (`src/main.rs:251-257,478-484`): re-derives the
Fiat–Shamir transcript (layout documented in `prover/channel.py`), checks the
proof-of-work, recomputes query positions, verifies Merkle openings, checks
DEEP consistency at every query, walks the FRI folds, and checks the
remainder polynomial and out-of-domain constraint composition.

Deliberately contains no JAX: the verifier is the audit surface (SURVEY.md
§7 "hard parts" #5), so it runs on simple integer arithmetic.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from ..ops import f128_ref as ref
from ..utils import fasthash
from ..prover import fri
from ..prover.air import Air
from ..prover.channel import RandomCoin, context_bytes, hash_elements
from ..prover.proof import MerkleOpening, Proof
from ..prover.stark import group_assertions


class VerificationError(Exception):
    pass


def _check(cond: bool, msg: str) -> None:
    if not cond:
        raise VerificationError(msg)


def verify_merkle_path(leaf_digest: bytes, index: int,
                       path: Sequence[bytes], root: bytes) -> bool:
    return fasthash.merkle_verify(leaf_digest, index, path, root)


def _verify_row_openings(openings: List[MerkleOpening], positions: List[int],
                         width: int, root: bytes, depth: int,
                         what: str) -> None:
    _check(len(openings) == len(positions), f"{what}: opening count mismatch")
    for op, p in zip(openings, positions):
        _check(op.position == p, f"{what}: position mismatch")
        _check(len(op.values) == width, f"{what}: row width mismatch")
        _check(len(op.path) == depth, f"{what}: path depth mismatch")
        _check(all(v < ref.P for v in op.values),
               f"{what}: non-canonical element")
        leaf = hash_elements(op.values)
        _check(verify_merkle_path(leaf, p, op.path, root),
               f"{what}: merkle path invalid at position {p}")


def verify(air: Air, proof: Proof) -> None:
    """Raises VerificationError if the proof does not verify."""
    opts = air.options
    n = air.trace_length
    w = air.trace_width
    _check(proof.trace_width == w and proof.trace_length == n,
           "proof context does not match AIR trace shape")
    _check(proof.options == opts,
           "proof options not acceptable")  # AcceptableOptions::OptionSet

    big_n = air.lde_domain_size
    log2_big = big_n.bit_length() - 1
    offset = air.domain_offset
    g = air.trace_domain_generator
    m = air.num_composition_columns
    k = air.num_transition_constraints
    assertions = air.get_assertions()
    factor = opts.fri_folding_factor

    _check(len(proof.ood_trace_cur) == w and len(proof.ood_trace_next) == w,
           "OOD trace frame width mismatch")
    _check(len(proof.ood_comp) == m, "OOD composition width mismatch")
    expected_layers = fri.num_fri_layers(n, factor,
                                         opts.fri_remainder_max_degree)
    _check(len(proof.fri_roots) == expected_layers, "FRI layer count")
    _check(len(proof.fri_openings) == expected_layers, "FRI opening count")
    _check(len(proof.fri_remainder) == opts.fri_remainder_max_degree + 1,
           "FRI remainder length")

    # ---- transcript replay ------------------------------------------------
    coin = RandomCoin(context_bytes(air.pub_input_bytes(), w, n, opts))
    coin.reseed(proof.trace_root)
    alphas = coin.draw_coefficients(k + len(assertions), opts.batching)
    coin.reseed(proof.comp_root)
    z = coin.draw()
    zg = (z * g) % ref.P
    coin.reseed_with_elements(proof.ood_trace_cur + proof.ood_trace_next)
    coin.reseed_with_elements(proof.ood_comp)
    deep_coeffs = coin.draw_coefficients(2 * w + m, opts.batching)
    betas = []
    for root in proof.fri_roots:
        coin.reseed(root)
        betas.append(coin.draw())
    coin.reseed_with_elements(proof.fri_remainder)
    _check(coin.leading_zeros(proof.pow_nonce) >= opts.grinding_bits,
           "insufficient proof-of-work")
    coin.reseed_with_int(proof.pow_nonce)
    positions = coin.draw_integers(opts.num_queries, big_n)

    # ---- OOD constraint-composition consistency ---------------------------
    ood_cur_c = [x % ref.P for x in proof.ood_trace_cur]
    ood_nxt_c = [x % ref.P for x in proof.ood_trace_next]
    if getattr(air, "needs_point", False):
        # periodic-column AIRs (e.g. the sound training v2) evaluate their
        # public per-row columns at the out-of-domain point
        tvals = air.evaluate_transitions_at(ood_cur_c, ood_nxt_c, z)
    else:
        tvals = air.evaluate_transitions_at(ood_cur_c, ood_nxt_c)
    _check(len(tvals) == k, "transition constraint count mismatch")
    g_last = pow(g, n - 1, ref.P)
    zer_t = ((pow(z, n, ref.P) - 1) * ref.inv((z - g_last) % ref.P)) % ref.P
    c_at_z = 0
    inv_zer_t = ref.inv(zer_t)
    for i in range(k):
        c_at_z = (c_at_z + alphas[i] * tvals[i] % ref.P * inv_zer_t) % ref.P
    for step, entries in group_assertions(assertions).items():
        dinv = ref.inv((z - pow(g, step, ref.P)) % ref.P)
        for (j, col, val) in entries:
            c_at_z = (c_at_z
                      + alphas[k + j]
                      * ((proof.ood_trace_cur[col] - val) % ref.P)
                      % ref.P * dinv) % ref.P
    expected = 0
    zn = pow(z, n, ref.P)
    zpow = 1
    for col_val in proof.ood_comp:
        expected = (expected + zpow * col_val) % ref.P
        zpow = (zpow * zn) % ref.P
    _check(c_at_z == expected, "OOD constraint composition mismatch")

    # ---- Merkle openings ---------------------------------------------------
    depth = log2_big
    _verify_row_openings(proof.trace_openings, positions, w,
                         proof.trace_root, depth, "trace")
    _verify_row_openings(proof.comp_openings, positions, m,
                         proof.comp_root, depth, "composition")

    # ---- DEEP evaluation at each query -------------------------------------
    a_val = sum(c * v for c, v in zip(deep_coeffs[:w],
                                      proof.ood_trace_cur)) % ref.P
    b_val = sum(c * v for c, v in zip(deep_coeffs[w:2 * w],
                                      proof.ood_trace_next)) % ref.P
    c_val = sum(c * v for c, v in zip(deep_coeffs[2 * w:],
                                      proof.ood_comp)) % ref.P
    w_big = ref.root_of_unity(log2_big)
    xs = [(offset * pow(w_big, p, ref.P)) % ref.P for p in positions]
    # ONE Montgomery batch inversion for every query denominator
    denom_inv = ref.batch_inv([(x - z) % ref.P for x in xs]
                              + [(x - zg) % ref.P for x in xs])
    q = len(positions)
    layer_values: Dict[int, int] = {}
    for qi, (op_t, op_c, p) in enumerate(zip(proof.trace_openings,
                                             proof.comp_openings, positions)):
        big_a = sum(c * v for c, v in zip(deep_coeffs[:w], op_t.values)) % ref.P
        big_b = sum(c * v for c, v in zip(deep_coeffs[w:2 * w],
                                          op_t.values)) % ref.P
        big_cc = sum(c * v for c, v in zip(deep_coeffs[2 * w:],
                                           op_c.values)) % ref.P
        term1 = ((big_a + big_cc - a_val - c_val) * denom_inv[qi]) % ref.P
        term2 = ((big_b - b_val) * denom_inv[q + qi]) % ref.P
        layer_values[p] = (term1 + term2) % ref.P

    # ---- FRI fold walk ------------------------------------------------------
    layer_positions = list(positions)
    cur_n, cur_offset = big_n, offset
    for layer_idx in range(expected_layers):
        log2_n = cur_n.bit_length() - 1
        m_l = cur_n // factor
        folded = fri.fold_positions(layer_positions, m_l)
        openings = proof.fri_openings[layer_idx]
        _check([op.position for op in openings] == folded,
               f"FRI layer {layer_idx}: coset positions mismatch")
        by_coset = {}
        leaf_depth = m_l.bit_length() - 1
        for op in openings:
            _check(len(op.values) == factor,
                   f"FRI layer {layer_idx}: coset size mismatch")
            _check(len(op.path) == leaf_depth,
                   f"FRI layer {layer_idx}: path depth mismatch")
            leaf = hash_elements(op.values)
            _check(verify_merkle_path(leaf, op.position, op.path,
                                      proof.fri_roots[layer_idx]),
                   f"FRI layer {layer_idx}: merkle path invalid")
            by_coset[op.position] = op.values
        # opened values must match the previous layer's expected values
        for p in layer_positions:
            c, kk = p % m_l, p // m_l
            _check(by_coset[c][kk] == layer_values[p],
                   f"FRI layer {layer_idx}: value mismatch at position {p}")
        # fold (coset-point inverses batched across the layer's cosets)
        w_l = ref.root_of_unity(log2_n)
        xc_inv = ref.batch_inv(
            [(cur_offset * pow(w_l, c, ref.P)) % ref.P for c in folded])
        next_values: Dict[int, int] = {}
        for ci, c in enumerate(folded):
            next_values[c] = fri.verify_fold_host(
                by_coset[c], c, log2_n, cur_offset, betas[layer_idx], factor,
                inv_x_c=xc_inv[ci])
        layer_positions = folded
        layer_values = next_values
        cur_n = m_l
        cur_offset = pow(cur_offset, factor, ref.P)

    # ---- remainder ----------------------------------------------------------
    w_rem = ref.root_of_unity(cur_n.bit_length() - 1)
    for p in layer_positions:
        x = (cur_offset * pow(w_rem, p, ref.P)) % ref.P
        _check(ref.evaluate_poly(proof.fri_remainder, x) == layer_values[p],
               f"FRI remainder mismatch at position {p}")
