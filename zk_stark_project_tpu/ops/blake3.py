"""Vectorized Blake3-256 on TPU (JAX, uint32 lanes).

Batched hashing of many equal-length messages — the Merkle/commitment
workload (`src/training/prover.rs:226-227`): leaf hashing of trace rows,
parent merging, grinding search.  The message length is static per call, so
chunk/tree structure unrolls at trace time; everything is uint32 add/xor/
rotate on the VPU, vectorized across the batch axis.

Bit-exact vs `ops/blake3_ref.py` (pure-python spec implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import blake3_ref as ref

_IV = np.array(ref.IV, dtype=np.uint32)
_PERM = ref.MSG_PERMUTATION

CHUNK_START = ref.CHUNK_START
CHUNK_END = ref.CHUNK_END
PARENT = ref.PARENT
ROOT = ref.ROOT


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _g(st, a, b, c, d, mx, my):
    st[a] = st[a] + st[b] + mx
    st[d] = _rotr(st[d] ^ st[a], 16)
    st[c] = st[c] + st[d]
    st[b] = _rotr(st[b] ^ st[c], 12)
    st[a] = st[a] + st[b] + my
    st[d] = _rotr(st[d] ^ st[a], 8)
    st[c] = st[c] + st[d]
    st[b] = _rotr(st[b] ^ st[c], 7)


def _compress(cv, block, counter_lo, counter_hi, block_len, flags):
    """One compression.  cv: (..., 8) u32; block: (..., 16) u32; scalars are
    python ints or broadcastable arrays.  Returns (..., 8)."""
    batch = cv.shape[:-1]

    def _const(v):
        return jnp.broadcast_to(jnp.uint32(v), batch)

    st = [cv[..., i] for i in range(8)]
    st += [_const(int(_IV[i])) for i in range(4)]
    for v in (counter_lo, counter_hi, block_len, flags):
        st.append(_const(v) if isinstance(v, int) else v.astype(jnp.uint32))
    m = [block[..., i] for i in range(16)]
    for r in range(7):
        _g(st, 0, 4, 8, 12, m[0], m[1])
        _g(st, 1, 5, 9, 13, m[2], m[3])
        _g(st, 2, 6, 10, 14, m[4], m[5])
        _g(st, 3, 7, 11, 15, m[6], m[7])
        _g(st, 0, 5, 10, 15, m[8], m[9])
        _g(st, 1, 6, 11, 12, m[10], m[11])
        _g(st, 2, 7, 8, 13, m[12], m[13])
        _g(st, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[_PERM[i]] for i in range(16)]
    return jnp.stack([st[i] ^ st[i + 8] for i in range(8)], axis=-1)


def _iv_cv(batch):
    return jnp.broadcast_to(jnp.asarray(_IV), batch + (8,))


@functools.partial(jax.jit, static_argnums=(1,))
def hash_words(words: jnp.ndarray, byte_len: int) -> jnp.ndarray:
    """Blake3-256 of a batch of equal-length messages.

    words: (..., W) uint32, little-endian packed; byte_len = true message
    length in bytes (must satisfy W == ceil(byte_len/4); sub-word tails are
    not supported — all framework messages are word-aligned).
    Returns (..., 8) uint32 digests.
    """
    assert byte_len % 4 == 0 and words.shape[-1] == byte_len // 4, \
        f"words {words.shape} vs byte_len {byte_len}"
    batch = words.shape[:-1]
    n_chunks = max(1, (byte_len + ref.CHUNK_LEN - 1) // ref.CHUNK_LEN)

    def chunk_cv(chunk_words, chunk_byte_len, chunk_counter, is_root):
        # chunk_words: (..., <=256) u32
        n_blocks = max(1, (chunk_byte_len + 63) // 64)
        cv = _iv_cv(batch)
        for i in range(n_blocks):
            blk_bytes = min(64, chunk_byte_len - i * 64) if chunk_byte_len else 0
            blk_words = chunk_words[..., i * 16:i * 16 + (blk_bytes + 3) // 4]
            pad = 16 - blk_words.shape[-1]
            if pad:
                blk_words = jnp.concatenate(
                    [blk_words, jnp.zeros(batch + (pad,), jnp.uint32)], axis=-1)
            flags = 0
            if i == 0:
                flags |= CHUNK_START
            if i == n_blocks - 1:
                flags |= CHUNK_END
                if is_root:
                    flags |= ROOT
            cv = _compress(cv, blk_words, chunk_counter & 0xFFFFFFFF,
                           chunk_counter >> 32, blk_bytes, flags)
        return cv

    def subtree_cv(sub_words, sub_byte_len, chunk_counter, is_root):
        nc = max(1, (sub_byte_len + ref.CHUNK_LEN - 1) // ref.CHUNK_LEN)
        if nc == 1:
            return chunk_cv(sub_words, sub_byte_len, chunk_counter, is_root)
        left_n = 1 << ((nc - 1).bit_length() - 1)
        lw = left_n * 256  # words per full chunk = 1024/4
        left = subtree_cv(sub_words[..., :lw], left_n * ref.CHUNK_LEN,
                          chunk_counter, False)
        right = subtree_cv(sub_words[..., lw:], sub_byte_len - left_n * ref.CHUNK_LEN,
                           chunk_counter + left_n, False)
        flags = PARENT | (ROOT if is_root else 0)
        return _compress(_iv_cv(batch), jnp.concatenate([left, right], axis=-1),
                         0, 0, 64, flags)

    return subtree_cv(words, byte_len, 0, True)


@jax.jit
def merge(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Hash two 32-byte digests: blake3(d1 || d2).  (..., 8) each."""
    return hash_words(jnp.concatenate([d1, d2], axis=-1), 64)


def hash_elements_words(words: jnp.ndarray) -> jnp.ndarray:
    """Hash field elements given as (..., 4*k) uint32 words (LE canonical) —
    winterfell `hash_elements` layout (16 bytes per element)."""
    return hash_words(words, words.shape[-1] * 4)


@jax.jit
def merge_with_u64(seed: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """blake3(seed || value_u64_le) for a batch of values.

    seed: (8,) uint32; values: (..., 2) uint32 (lo, hi).  Returns (..., 8).
    Used for grinding search over nonces.
    """
    batch = values.shape[:-1]
    seed_b = jnp.broadcast_to(seed, batch + (8,))
    return hash_words(jnp.concatenate([seed_b, values], axis=-1), 40)
