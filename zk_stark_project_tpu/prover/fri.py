"""FRI (Fast Reed-Solomon IOP of proximity) — prover folds on device, fold
verification on host.

TPU-native replacement for winterfell's FRI prover with the reference's
parameters: folding factor 16, remainder max degree 7
(`src/main.rs:98-107`).  Per layer the prover

  1. commits to the current evaluations arranged in transposed cosets
     (leaf i = blake3 of the F values {f(x) : x^F = y_i}), so one opened leaf
     feeds a full fold check;
  2. draws beta from the channel and folds: writing
     f(x) = sum_j x^j f_j(x^F), the next layer is f'(y) = sum_j beta^j f_j(y).
     On the coset {x_c * eta^k} (eta the F-th root of unity inside the
     domain) the interpolant q_c satisfies q_c(beta) = f'(x_c^F), and its
     "scaled coefficients" a_j = f_j(y) * x_c^j come out of ONE batched
     size-F inverse NTT — so a fold is: reshape (F, M), iNTT along F, then a
     Horner accumulation in base (beta / x_c).  All VPU work, no gathers.

Folding continues while the degree bound exceeds `remainder_max_degree`;
the final layer is sent in the clear as remainder polynomial coefficients.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blake3 as b3
from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import merkle, ntt
from . import poly


def num_fri_layers(trace_length: int, folding_factor: int,
                   remainder_max_degree: int) -> int:
    """Number of folds for an initial degree bound of trace_length - 1."""
    deg = trace_length - 1
    layers = 0
    while deg > remainder_max_degree:
        deg = (deg + 1) // folding_factor - 1
        layers += 1
    return layers


def _ntt_small_axis1(v: jnp.ndarray, logf: int,
                     inverse: bool) -> jnp.ndarray:
    """NTT/iNTT of length F = 2^logf along AXIS -2 of (8, ..., F, m) —
    the coset axis stays on LANES the whole time.  `ntt.ntt` along a
    trailing F axis materializes (..., m, F) temps whose tiny lane dim
    XLA pads to 128 (4 GB each at the 2^24-point first FRI layer —
    blew the compile service).  F is tiny, so the stage loop unrolls."""
    F = 1 << logf
    m = v.shape[-1]
    lead = v.shape[:-2]                               # (8, ...) batch dims
    nb = len(lead) - 1
    rev = ntt._bitrev_np(logf).astype(np.int32)
    a = jnp.take(v, jnp.asarray(rev), axis=-2)        # (8, ..., F, m)
    tw_full = ntt._twiddles(logf, inverse)            # (8, F/2)
    for s in range(1, logf + 1):
        blk = 1 << s
        half = blk // 2
        tw = tw_full[:, :: F // blk][:, :half]        # (8, half)
        g = a.reshape(lead + (F // blk, blk, m))
        u = g[..., :half, :]
        t = f128.mul(g[..., half:, :],
                     tw.reshape((8,) + (1,) * (nb + 1) + (half, 1)))
        a = jnp.concatenate([f128.add(u, t), f128.sub(u, t)],
                            axis=-2).reshape(lead + (F, m))
    if inverse:
        n_inv = f128.from_int(ref.inv(F)).reshape((8,) + (1,) * (nb + 2))
        a = f128.mul(a, n_inv)
    return a


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def fold_evals(evals: jnp.ndarray, beta: jnp.ndarray, offset: int,
               log2_n: int, factor: int) -> jnp.ndarray:
    """One FRI fold: (8, N) evaluations over the coset offset*<w_N> (natural
    order) -> (8, N/F) evaluations of the folded poly over offset^F*<w_N^F>.

    beta: (8,) drawn folding randomness.
    """
    n = 1 << log2_n
    m = n // factor
    logf = factor.bit_length() - 1
    assert evals.shape == (8, n)
    # position p = k*m + c  ->  coset c, member k  (x_{c,k} = x_c * eta^k);
    # transform along the k axis with the coset axis kept on lanes
    v = evals.reshape(8, factor, m)
    a = _ntt_small_axis1(v, logf, True)  # scaled coeffs a_j, (8, F, m)
    # base_c = beta / x_c ;  x_c^{-1} = offset^{-1} * w^{-c}
    w_inv_pows = ntt._offset_powers(log2_n - logf,
                                    ref.root_of_unity(log2_n), True)[:, :m]
    o_inv = f128.from_int(ref.inv(offset)).reshape(8, 1)
    x_inv = f128.mul(w_inv_pows, o_inv)           # (8, m)
    base = f128.mul(x_inv, beta.reshape(8, 1))    # (8, m)
    # q_c(beta) = sum_j a_j * base^j: power table built by doubling along
    # the leading j axis (log F muls), then ONE batched mul + log-depth
    # sum — a chained Horner accumulation would both serialize the VPU
    # and blow up XLA compiles.
    powers = f128.ones((1, m))
    step = base[:, None, :]                       # (8, 1, m)
    cur = 1
    while cur < factor:
        powers = jnp.concatenate([powers, f128.mul(powers, step)], axis=1)
        step = f128.mul(step, step)
        cur *= 2
    prod = f128.mul(a, powers)                    # (8, F, m)
    while prod.shape[1] > 1:                      # log-depth sum over j,
        h = prod.shape[1] // 2                    # lanes stay on m
        prod = f128.add(prod[:, :h], prod[:, h:])
    return prod[:, 0]


def commit_layer(evals: jnp.ndarray, factor: int) -> merkle.MerkleTree:
    """Merkle-commit a layer: leaf c = blake3 of the F coset values
    (canonical LE bytes), matching the transposed-coset layout.  The
    message is assembled WORDS-FIRST ((F*4, m)) so no small-lane-dim
    buffer ever materializes at N points."""
    n = evals.shape[-1]
    m = n // factor
    words = f128.to_uint32_words(evals)            # (4, N) canonical
    words = words.reshape(4, factor, m)
    # leaf c's message word w = 4k + i  ->  value k, word i
    wf = jnp.moveaxis(words, 0, 1).reshape(factor * 4, m)
    leaves = b3.hash_words_wf(wf, factor * 16)     # (8, m) words-first
    return merkle.MerkleTree(jnp.moveaxis(leaves, 0, -1))


@dataclasses.dataclass
class FriLayer:
    tree: merkle.MerkleTree
    evals: jnp.ndarray       # (8, N) uint32 limbs on device, for opening
    domain_offset: int
    log2_n: int


class FriProver:
    """Runs the FRI commit phase; query opening happens after positions are
    drawn."""

    def __init__(self, folding_factor: int, remainder_max_degree: int):
        self.factor = folding_factor
        self.remainder_max_degree = remainder_max_degree

    def build_layers(self, channel, evals: jnp.ndarray, domain_offset: int,
                     trace_length: int) -> Tuple[List[FriLayer], List[int]]:
        """Fold until the degree bound is <= remainder_max_degree.

        channel: prover channel (reseed + draw).  evals: (8, N) DEEP poly
        evaluations over domain_offset*<w_N>.  Returns (layers, remainder
        coefficients as python ints).
        """
        layers: List[FriLayer] = []
        cur = evals
        offset = domain_offset
        n = evals.shape[-1]
        deg = trace_length - 1
        while deg > self.remainder_max_degree:
            log2_n = n.bit_length() - 1
            tree = commit_layer(cur, self.factor)
            channel.reseed_root(tree.root_bytes())
            beta_int = channel.coin.draw()
            beta = f128.from_int(beta_int)
            layers.append(FriLayer(tree=tree, evals=cur,
                                   domain_offset=offset, log2_n=log2_n))
            cur = fold_evals(cur, beta, offset, log2_n, self.factor)
            offset = pow(offset, self.factor, ref.P)
            n //= self.factor
            deg = (deg + 1) // self.factor - 1

        # remainder: interpolate the last layer over its coset
        coeffs = ntt.coset_interpolate(cur, offset)
        coeffs_int = [int(x) for x in f128.to_ints(coeffs)]
        assert all(c == 0 for c in coeffs_int[self.remainder_max_degree + 1:]), \
            "FRI remainder exceeds max degree — prover bug"
        remainder = coeffs_int[: self.remainder_max_degree + 1]
        channel.reseed_elements(remainder)
        return layers, remainder

    def open_queries(self, layers: List[FriLayer],
                     positions: Sequence[int]):
        """For each layer, open the (deduped) coset leaves the given query
        positions touch.  Returns per-layer lists of MerkleOpening with
        position = coset index and values = the F coset values.

        Device gathers are PADDED to len(positions) entries: the deduped
        coset count varies per proof, and data-dependent gather shapes would
        recompile the XLA gather executable on every prove() (measured as a
        multi-second stall in `analytics/profile_prove.py`)."""
        from .proof import MerkleOpening

        out = []
        pos = list(positions)
        max_open = len(pos)  # static across layers: dedup only shrinks
        for layer in layers:
            n = 1 << layer.log2_n
            m = n // self.factor
            folded = fold_positions(pos, m)
            padded = folded + [folded[0]] * (max_open - len(folded))
            # gather every opened coset's F values on device, one transfer
            flat_idx = np.asarray(
                [k * m + c for c in padded for k in range(self.factor)],
                dtype=np.int32)
            vals_np = np.asarray(
                jnp.take(layer.evals, jnp.asarray(flat_idx), axis=1))
            ints = f128.to_ints(
                vals_np.reshape(8, max_open, self.factor))  # (max, F)
            paths = layer.tree.prove_batch(padded)
            openings = []
            for ci, c in enumerate(folded):
                vals = [int(ints[ci, k]) for k in range(self.factor)]
                openings.append(MerkleOpening(
                    position=c, values=vals,
                    path=[d.astype("<u4").tobytes() for d in paths[ci]]))
            out.append(openings)
            pos = folded
        return out


def fold_positions(positions: Sequence[int], folded_size: int) -> List[int]:
    """Map layer positions to next-layer (coset) positions, deduplicated in
    first-seen order."""
    seen, out = set(), []
    for p in positions:
        c = p % folded_size
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


# ---------------------------------------------------------------------------
# Host-side fold verification (python ints) — used by the verifier.
# ---------------------------------------------------------------------------


def verify_fold_host(coset_values: Sequence[int], coset_index: int,
                     log2_n: int, domain_offset: int, beta: int,
                     factor: int, inv_x_c: int = None) -> int:
    """Given the F values on coset `coset_index` of a size-2^log2_n domain,
    return the folded value f'(y) = q_c(beta).  `inv_x_c` optionally
    supplies the precomputed 1/x_c (the verifier batch-inverts these
    across a layer's cosets)."""
    m = (1 << log2_n) // factor
    a = ref.ntt(list(coset_values), invert=True)  # a_j = f_j(y) x_c^j
    if inv_x_c is None:
        x_c = (domain_offset
               * pow(ref.root_of_unity(log2_n), coset_index, ref.P)) % ref.P
        inv_x_c = ref.inv(x_c)
    base = (beta * inv_x_c) % ref.P
    acc, t = a[0], base
    for j in range(1, factor):
        acc = (acc + a[j] * t) % ref.P
        t = (t * base) % ref.P
    return acc
