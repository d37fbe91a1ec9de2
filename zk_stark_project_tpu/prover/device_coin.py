"""Device-side Fiat–Shamir coin — the host `RandomCoin` (prover/channel.py)
re-implemented as batched in-graph operations, bit-exact.

Motivation: the STARK transcript forces a host sync at every phase boundary
(pull root -> hash -> draw -> dispatch next phase).  On a tunneled chip
each boundary costs a ~25 ms round trip — at reference shapes that latency,
not compute, dominates the prover (SPEED.md §1).  With the coin ON the
device, every phase chains inside ONE executable and the host round trips
collapse from ~7 per statement batch to 2 (`prover/fused.py`).

State per statement: (seed (C, 8) u32 words, counter (C,) u32).  Every
operation mirrors `prover/channel.py` byte-for-byte:

  reseed(d):        seed = blake3(seed || d32); counter = 0
  draw():           counter += 1; h = blake3(seed || u64le(counter));
                    x = LE-u128(h[0:16]), retry while x >= p     (lane-local)
  draw_integers(k): counter += 1; pos = LE-u64(h[0:8]) & (n-1), dedup
  reseed_with_int:  seed = blake3(seed || u64le(nonce)); counter = 0

Bit-exactness is tested against the host coin in
`tests/test_device_coin.py`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blake3 as b3
from ..ops import f128
from ..ops import f128_ref as ref

#: p as 4 little-endian u32 words (for the rejection compare)
_P_WORDS = np.array([(ref.P >> (32 * i)) & 0xFFFFFFFF for i in range(4)],
                    dtype=np.uint32)


def coin_init(seed_digests: jnp.ndarray):
    """(C, 8) u32 seed digests (host blake3 of the context bytes) ->
    (seed, counter) state."""
    c = seed_digests.shape[0]
    return seed_digests, jnp.zeros((c,), jnp.uint32)


def reseed(state, digest: jnp.ndarray):
    """digest: (C, 8) u32 (e.g. a Merkle root column)."""
    seed, _ = state
    return b3.merge(seed, digest), jnp.zeros(seed.shape[:1], jnp.uint32)


def reseed_with_u64(state, value: jnp.ndarray):
    """value: (C,) uint64-as-(C, 2) u32 (lo, hi) — nonce reseed."""
    seed, _ = state
    return (b3.merge_with_u64(seed, value),
            jnp.zeros(seed.shape[:1], jnp.uint32))


def _next_hash(seed, counter):
    """counter already incremented; returns (C, 8) digest words."""
    ctr = jnp.stack([counter, jnp.zeros_like(counter)], axis=-1)
    return b3.merge_with_u64(seed, ctr)


def _lt_p(words: jnp.ndarray) -> jnp.ndarray:
    """(C, 4) LE u32 words < p, vectorized big-int compare."""
    lt = jnp.zeros(words.shape[:-1], bool)
    gt = jnp.zeros(words.shape[:-1], bool)
    for i in range(3, -1, -1):
        w = words[..., i]
        pw = jnp.uint32(int(_P_WORDS[i]))
        lt = lt | (~gt & (w < pw))
        gt = gt | (~lt & (w > pw))
    return lt


def draw(state) -> Tuple[jnp.ndarray, tuple]:
    """One field element per lane with per-lane rejection sampling.
    Returns ((8, C) limbs, new state)."""
    seed, counter = state

    def cond(carry):
        _, _, accepted = carry
        return ~jnp.all(accepted)

    def body(carry):
        ctr, words, accepted = carry
        ctr2 = jnp.where(accepted, ctr, ctr + 1)
        h = _next_hash(seed, ctr2)
        cand = h[..., :4]
        ok = _lt_p(cand)
        words = jnp.where(accepted[..., None], words, cand)
        accepted2 = accepted | ok
        return ctr2, words, accepted2

    c = seed.shape[0]
    init = (counter, jnp.zeros((c, 4), jnp.uint32),
            jnp.zeros((c,), bool))
    ctr, words, _ = jax.lax.while_loop(cond, body, init)
    limbs = f128.from_uint32_words(jnp.moveaxis(words, -1, 0))  # (8, C)
    return limbs, (seed, ctr)


def draw_powers(state, k: int):
    """Algebraic batching coefficients: 1, a, a^2, ... a^(k-1) from ONE
    draw (`RandomCoin.draw_coefficients(..., "algebraic")`).
    Returns ((8, C, k) limbs, new state)."""
    from . import poly

    a, state = draw(state)
    if k == 0:
        return f128.zeros((a.shape[1], 0)), state
    powers = poly.powers_of_b(a[:, :, None], 1 << max(
        0, (k - 1).bit_length()))                     # (8, C, 1, >=k)
    return powers[:, :, 0, :k], state


def draw_integers(state, k: int, domain_size: int, max_attempts: int = None):
    """k DISTINCT integers in [0, domain_size) per lane (keep-first order).
    Returns ((C, k) int32, new state)."""
    assert domain_size & (domain_size - 1) == 0
    mask = jnp.uint32(domain_size - 1)       # domain_size <= 2^32 always
    seed, counter = state
    c = seed.shape[0]

    def cond(carry):
        _, _, count = carry
        return ~jnp.all(count >= k)

    def body(carry):
        ctr, pos, count = carry
        done = count >= k
        ctr2 = jnp.where(done, ctr, ctr + 1)
        h = _next_hash(seed, ctr2)
        cand = (h[..., 0] & mask).astype(jnp.int32)    # LE-u64 & (n-1)
        seen = jnp.any((pos == cand[:, None])
                       & (jnp.arange(k)[None, :] < count[:, None]), axis=1)
        take = ~done & ~seen
        pos = jnp.where(
            take[:, None] & (jnp.arange(k)[None, :] == count[:, None]),
            cand[:, None], pos)
        count2 = count + take.astype(count.dtype)
        return ctr2, pos, count2

    init = (counter, jnp.full((c, k), -1, jnp.int32),
            jnp.zeros((c,), jnp.int32))
    ctr, pos, _ = jax.lax.while_loop(cond, body, init)
    return pos, (seed, ctr)


def hash_elements_device(limbs: jnp.ndarray) -> jnp.ndarray:
    """(8, C, K) limbs -> (C, 8) blake3 digest of the canonical 16-byte-LE
    concatenation (`channel.hash_elements`)."""
    words = f128.to_uint32_words(limbs)       # (4, C, K) canonical LE
    c, k = words.shape[1], words.shape[2]
    flat = jnp.transpose(words, (1, 2, 0)).reshape(c, k * 4)
    return b3.hash_words(flat, k * 16)


def reseed_elements(state, limbs: jnp.ndarray):
    """reseed with hash_elements of (8, C, K) limbs."""
    return reseed(state, hash_elements_device(limbs))
