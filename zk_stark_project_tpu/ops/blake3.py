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


def _quarter(a, b, c, d, mx, my):
    """Four blake3 G functions at once on (..., 4) row vectors."""
    a = a + b + mx
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + my
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


# Per-round message index schedule (composition of MSG_PERMUTATION), static.
def _schedules():
    idx = list(range(16))
    out = []
    for _ in range(7):
        out.append(list(idx))
        idx = [idx[_PERM[i]] for i in range(16)]
    return out


_SCHEDULES = _schedules()


def _compress(cv, block, counter_lo, counter_hi, block_len, flags):
    """One compression in SIMD row form.  cv: (..., 8) u32; block: (..., 16)
    u32; counter/len/flags are python ints or batch-shaped arrays.
    Returns (..., 8).

    NOTE the row-vector formulation (state as four (..., 4) rows, diagonal
    rounds via lane rolls) is deliberate: the scalar-dataflow version makes
    XLA-CPU's fusion pass blow up (hour-long compiles).  It is also the
    layout a Pallas port wants.
    """
    batch = cv.shape[:-1]

    def _as_row(vals):
        cols = []
        for v in vals:
            if isinstance(v, int):
                cols.append(jnp.broadcast_to(jnp.uint32(v), batch))
            else:
                cols.append(jnp.broadcast_to(v.astype(jnp.uint32), batch))
        return jnp.stack(cols, axis=-1)

    a = cv[..., 0:4]
    b = cv[..., 4:8]
    c = jnp.broadcast_to(jnp.asarray(_IV[:4]), batch + (4,))
    d = _as_row([counter_lo, counter_hi, block_len, flags])
    m = block
    for r in range(7):
        s = _SCHEDULES[r]
        a, b, c, d = _quarter(a, b, c, d,
                              m[..., [s[0], s[2], s[4], s[6]]],
                              m[..., [s[1], s[3], s[5], s[7]]])
        b = jnp.roll(b, -1, axis=-1)
        c = jnp.roll(c, -2, axis=-1)
        d = jnp.roll(d, -3, axis=-1)
        a, b, c, d = _quarter(a, b, c, d,
                              m[..., [s[8], s[10], s[12], s[14]]],
                              m[..., [s[9], s[11], s[13], s[15]]])
        b = jnp.roll(b, 1, axis=-1)
        c = jnp.roll(c, 2, axis=-1)
        d = jnp.roll(d, 3, axis=-1)
    return jnp.concatenate([a ^ c, b ^ d], axis=-1)


def _iv_cv(batch):
    return jnp.broadcast_to(jnp.asarray(_IV), batch + (8,))


@functools.partial(jax.jit, static_argnums=(1,))
def hash_words(words: jnp.ndarray, byte_len: int) -> jnp.ndarray:
    """Blake3-256 of a batch of equal-length messages.

    words: (..., W) uint32, little-endian packed; byte_len = true message
    length in bytes (must satisfy W == ceil(byte_len/4); sub-word tails are
    not supported — all framework messages are word-aligned).
    Returns (..., 8) uint32 digests.

    Structure: all chunks advance in lockstep (chunks fold into the batch
    axis) and the 16 intra-chunk blocks run under lax.scan, so the compiled
    graph holds ONE compression regardless of message length; chunk CVs then
    tree-merge with one vectorized compression per parent level.
    """
    assert byte_len % 4 == 0 and words.shape[-1] == byte_len // 4, \
        f"words {words.shape} vs byte_len {byte_len}"
    batch = words.shape[:-1]
    n_chunks = max(1, (byte_len + ref.CHUNK_LEN - 1) // ref.CHUNK_LEN)
    single_chunk = n_chunks == 1

    # ---- per-chunk block schedule (static numpy) ----
    max_blocks = max(1, min(16, (byte_len + 63) // 64)) if single_chunk else 16
    exists = np.zeros((n_chunks, max_blocks), dtype=bool)
    blk_len = np.zeros((n_chunks, max_blocks), dtype=np.uint32)
    flags_np = np.zeros((n_chunks, max_blocks), dtype=np.uint32)
    for c in range(n_chunks):
        cbytes = min(ref.CHUNK_LEN, byte_len - c * ref.CHUNK_LEN)
        nb = max(1, (cbytes + 63) // 64)
        for i in range(nb):
            exists[c, i] = True
            blk_len[c, i] = min(64, cbytes - i * 64) if cbytes else 0
            fl = 0
            if i == 0:
                fl |= CHUNK_START
            if i == nb - 1:
                fl |= CHUNK_END
                if single_chunk:
                    fl |= ROOT
            flags_np[c, i] = fl

    # ---- pad words to (batch, n_chunks, max_blocks, 16) ----
    total = n_chunks * max_blocks * 16
    pad = total - words.shape[-1]
    if pad:
        words = jnp.concatenate(
            [words, jnp.zeros(batch + (pad,), jnp.uint32)], axis=-1)
    blocks = words.reshape(batch + (n_chunks, max_blocks, 16))
    # scan axis first: (max_blocks, batch..., n_chunks, 16)
    blocks = jnp.moveaxis(blocks, -2, 0)

    counters = np.arange(n_chunks, dtype=np.uint32)
    ctr_lo = jnp.broadcast_to(jnp.asarray(counters), batch + (n_chunks,))
    ctr_hi = jnp.zeros(batch + (n_chunks,), jnp.uint32)

    # The initial carry must share the input's varying manual axes (vma):
    # under shard_map a broadcast constant is "unvarying" while the scan body
    # output (derived from `words`) is "varying", and jax >= 0.9 rejects the
    # mismatched carry.  Adding a data-derived zero transfers the vma type
    # without changing values (XLA folds the add away).
    cv0 = _iv_cv(batch + (n_chunks,)) + (blocks[0][..., :8] & jnp.uint32(0))

    def step(cv, xs):
        blk, ex, bl, fl = xs
        new_cv = _compress(cv, blk, ctr_lo, ctr_hi,
                           jnp.broadcast_to(bl, batch + (n_chunks,)),
                           jnp.broadcast_to(fl, batch + (n_chunks,)))
        cv = jnp.where(ex[..., None], new_cv, cv)
        return cv, None

    xs = (blocks,
          jnp.asarray(exists.T),      # (max_blocks, n_chunks)
          jnp.asarray(blk_len.T),
          jnp.asarray(flags_np.T))
    # broadcast exists/len/flags over batch inside step via indexing order:
    # reshape to allow (max_blocks, 1.., n_chunks)
    expand = (slice(None),) + (None,) * len(batch) + (slice(None),)
    xs = (blocks, xs[1][expand], xs[2][expand], xs[3][expand])
    chunk_cvs, _ = jax.lax.scan(step, cv0, xs)
    # chunk_cvs: (batch..., n_chunks, 8)

    if single_chunk:
        return chunk_cvs[..., 0, :]

    # ---- left-heavy blake3 tree merge over chunk CVs (static recursion) ----
    def subtree(lo, hi, is_root):
        n = hi - lo
        if n == 1:
            return chunk_cvs[..., lo, :]
        left_n = 1 << ((n - 1).bit_length() - 1)
        left = subtree(lo, lo + left_n, False)
        right = subtree(lo + left_n, hi, False)
        fl = PARENT | (ROOT if is_root else 0)
        return _compress(_iv_cv(batch), jnp.concatenate([left, right], axis=-1),
                         0, 0, 64, fl)

    return subtree(0, n_chunks, True)


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


# ---------------------------------------------------------------------------
# Streaming primitives for multi-chunk leaf hashing (prover/big.py): one
# blake3 CHUNK at a time plus explicit parent merges, so a wide Merkle
# row (e.g. 240 f128 elements = 3840 bytes = 4 chunks) can be hashed in
# column-block passes without the whole row resident.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2))
def chunk_cv(words: jnp.ndarray, chunk_bytes: int,
             chunk_index: int) -> jnp.ndarray:
    """CV of ONE blake3 chunk: `words` (..., ceil(chunk_bytes/64)*16) u32
    holding the chunk's blocks, with chunk counter `chunk_index` and
    CHUNK_START/CHUNK_END flags — never ROOT (caller merges parents).

    Blocks run under lax.scan like `hash_words` (an unrolled 16-compress
    chain is a pathological XLA-CPU compile)."""
    assert 1 <= chunk_bytes <= ref.CHUNK_LEN
    n_blocks = max(1, (chunk_bytes + 63) // 64)
    batch = words.shape[:-1]
    total = n_blocks * 16
    if words.shape[-1] < total:
        pad = jnp.zeros(batch + (total - words.shape[-1],), jnp.uint32)
        words = jnp.concatenate([words, pad], axis=-1)
    blocks = jnp.moveaxis(words.reshape(batch + (n_blocks, 16)), -2, 0)
    blens, flags = [], []
    rem = chunk_bytes
    for b in range(n_blocks):
        bl = min(64, rem)
        rem -= bl
        blens.append(bl)
        flags.append((CHUNK_START if b == 0 else 0)
                     | (CHUNK_END if b == n_blocks - 1 else 0))
    cv0 = _iv_cv(batch) + (blocks[0][..., :8] & jnp.uint32(0))

    def step(cv, xs):
        blk, bl, fl = xs
        return _compress(cv, blk, chunk_index & 0xFFFFFFFF,
                         (chunk_index >> 32) & 0xFFFFFFFF,
                         jnp.broadcast_to(bl, batch),
                         jnp.broadcast_to(fl, batch)), None

    cv, _ = jax.lax.scan(step, cv0, (
        blocks, jnp.asarray(blens, jnp.uint32),
        jnp.asarray(flags, jnp.uint32)))
    return cv


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def chunk_cv_update(cv: jnp.ndarray, words: jnp.ndarray, b0: int,
                    total_blocks: int, chunk_bytes: int,
                    chunk_index: int) -> jnp.ndarray:
    """Advance a chunk CV over blocks [b0, b0+k) of a chunk with
    `total_blocks` blocks and `chunk_bytes` total bytes — the incremental
    form of `chunk_cv`, so one chunk's 1024 bytes can be hashed in
    column-block pieces (`prover/big.py`).  Start from `cv=None` -> IV."""
    batch = words.shape[:-1]
    k = words.shape[-1] // 16
    blocks = jnp.moveaxis(words.reshape(batch + (k, 16)), -2, 0)
    if cv is None:
        cv = _iv_cv(batch)
    blens, flags = [], []
    for i in range(k):
        b = b0 + i
        bl = min(64, chunk_bytes - b * 64)
        blens.append(bl)
        flags.append((CHUNK_START if b == 0 else 0)
                     | (CHUNK_END if b == total_blocks - 1 else 0))
    cv = cv + (blocks[0][..., :8] & jnp.uint32(0))

    def step(c, xs):
        blk, bl, fl = xs
        return _compress(c, blk, chunk_index & 0xFFFFFFFF,
                         (chunk_index >> 32) & 0xFFFFFFFF,
                         jnp.broadcast_to(bl, batch),
                         jnp.broadcast_to(fl, batch)), None

    cv, _ = jax.lax.scan(step, cv, (
        blocks, jnp.asarray(blens, jnp.uint32),
        jnp.asarray(flags, jnp.uint32)))
    return cv


@functools.partial(jax.jit, static_argnums=(2,))
def parent_cv(left: jnp.ndarray, right: jnp.ndarray,
              is_root: bool) -> jnp.ndarray:
    """blake3 parent node over two child CVs ((..., 8) each)."""
    fl = PARENT | (ROOT if is_root else 0)
    return _compress(_iv_cv(left.shape[:-1]),
                     jnp.concatenate([left, right], axis=-1), 0, 0, 64, fl)
