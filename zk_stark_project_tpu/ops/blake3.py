"""Vectorized Blake3-256 on TPU (JAX, uint32 lanes).

Batched hashing of many equal-length messages — the Merkle/commitment
workload (`src/training/prover.rs:226-227`): leaf hashing of trace rows,
parent merging, grinding search.  The message length is static per call, so
chunk/tree structure unrolls at trace time; everything is uint32 add/xor/
rotate on the VPU, vectorized across the batch axis.

Layout: the public API keeps digests batch-major (``(..., 8)`` u32) but the
compression pipeline runs WORDS-FIRST — state rows are ``(4,) + batch``,
message blocks ``(16,) + batch`` — so the batch axis stays on the TPU lane
dimension.  The batch-last formulation put the 4/8/16-word axis on lanes,
and XLA padded every temp to 128 lanes: a 2^23-batch parent merge needed
8.5 GB of temp HBM (32x waste) and OOM'd the 2^24-leaf Merkle build of the
2^20 north-star proof.  Words-first, the same program needs ~2.3 GB and
every vector op uses full lanes.  The word axis lives on sublanes; the
per-round diagonal rotations are rolls over that (tiny) leading axis.

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
    """Four blake3 G functions at once on (4,)+batch word rows."""
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


def _wf(x):
    """batch-last (..., W) -> words-first (W,) + batch."""
    return jnp.moveaxis(x, -1, 0)


def _bl(x):
    """words-first (W,) + batch -> batch-last (..., W)."""
    return jnp.moveaxis(x, 0, -1)


def _compress(cv, block, counter_lo, counter_hi, block_len, flags):
    """One compression, words-first.  cv: (8,)+batch u32; block: (16,)+batch
    u32; counter/len/flags are python ints or batch-shaped arrays.
    Returns (8,)+batch.

    The state sits as four (4,)+batch rows; diagonalization is a roll over
    the leading word axis (sublanes), so the batch axis keeps the full 128
    lanes and no temp is lane-padded.
    """
    batch = cv.shape[1:]

    def _row(v):
        if isinstance(v, int):
            return jnp.broadcast_to(jnp.uint32(v), batch)
        return jnp.broadcast_to(v.astype(jnp.uint32), batch)

    a = cv[0:4]
    b = cv[4:8]
    c = jnp.broadcast_to(
        jnp.asarray(_IV[:4]).reshape((4,) + (1,) * len(batch)),
        (4,) + batch)
    d = jnp.stack([_row(counter_lo), _row(counter_hi),
                   _row(block_len), _row(flags)])
    m = block
    for r in range(7):
        s = _SCHEDULES[r]
        a, b, c, d = _quarter(a, b, c, d,
                              m[np.array([s[0], s[2], s[4], s[6]])],
                              m[np.array([s[1], s[3], s[5], s[7]])])
        b = jnp.roll(b, -1, axis=0)
        c = jnp.roll(c, -2, axis=0)
        d = jnp.roll(d, -3, axis=0)
        a, b, c, d = _quarter(a, b, c, d,
                              m[np.array([s[8], s[10], s[12], s[14]])],
                              m[np.array([s[9], s[11], s[13], s[15]])])
        b = jnp.roll(b, 1, axis=0)
        c = jnp.roll(c, 2, axis=0)
        d = jnp.roll(d, 3, axis=0)
    return jnp.concatenate([a ^ c, b ^ d], axis=0)


def _iv_cv(batch):
    """(8,)+batch IV chaining value, words-first."""
    return jnp.broadcast_to(
        jnp.asarray(_IV).reshape((8,) + (1,) * len(batch)), (8,) + batch)


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
    return _bl(hash_words_wf(_wf(words), byte_len))


@functools.partial(jax.jit, static_argnums=(1,))
def hash_words_wf(wf: jnp.ndarray, byte_len: int) -> jnp.ndarray:
    """`hash_words` with WORDS-FIRST input and output: wf (W,) + batch,
    returns (8,) + batch digests.  Callers that can build the message in
    words-first layout (e.g. FRI's transposed-coset leaves at 2^24 rows)
    avoid the boundary transposes entirely — a batch-last (N, W) operand
    with a small W costs a lane-padded relayout at large N."""
    assert byte_len % 4 == 0 and wf.shape[0] == byte_len // 4, \
        f"words-first {wf.shape} vs byte_len {byte_len}"
    batch = wf.shape[1:]
    nb = len(batch)
    n_chunks = max(1, (byte_len + ref.CHUNK_LEN - 1) // ref.CHUNK_LEN)
    single_chunk = n_chunks == 1

    # ---- per-chunk block schedule (static numpy) ----
    max_blocks = max(1, min(16, (byte_len + 63) // 64)) if single_chunk else 16
    exists = np.zeros((n_chunks, max_blocks), dtype=bool)
    blk_len = np.zeros((n_chunks, max_blocks), dtype=np.uint32)
    flags_np = np.zeros((n_chunks, max_blocks), dtype=np.uint32)
    for c in range(n_chunks):
        cbytes = min(ref.CHUNK_LEN, byte_len - c * ref.CHUNK_LEN)
        nblk = max(1, (cbytes + 63) // 64)
        for i in range(nblk):
            exists[c, i] = True
            blk_len[c, i] = min(64, cbytes - i * 64) if cbytes else 0
            fl = 0
            if i == 0:
                fl |= CHUNK_START
            if i == nblk - 1:
                fl |= CHUNK_END
                if single_chunk:
                    fl |= ROOT
            flags_np[c, i] = fl

    # ---- words-first blocks: (max_blocks, 16, n_chunks) + batch ----
    total = n_chunks * max_blocks * 16
    pad = total - wf.shape[0]
    if pad:
        wf = jnp.concatenate(
            [wf, jnp.zeros((pad,) + batch, jnp.uint32)], axis=0)
    blocks = wf.reshape((n_chunks, max_blocks, 16) + batch)
    blocks = jnp.transpose(blocks,
                           (1, 2, 0) + tuple(range(3, 3 + nb)))

    counters = jnp.asarray(np.arange(n_chunks, dtype=np.uint32))
    ctr_shape = (n_chunks,) + (1,) * nb
    ctr_lo = jnp.broadcast_to(counters.reshape(ctr_shape),
                              (n_chunks,) + batch)
    ctr_hi = jnp.zeros((n_chunks,) + batch, jnp.uint32)

    # The initial carry must share the input's varying manual axes (vma):
    # under shard_map a broadcast constant is "unvarying" while the scan body
    # output (derived from `words`) is "varying", and jax >= 0.9 rejects the
    # mismatched carry.  Adding a data-derived zero transfers the vma type
    # without changing values (XLA folds the add away).
    cv0 = _iv_cv((n_chunks,) + batch) + (blocks[0][:8] & jnp.uint32(0))

    def step(cv, xs):
        blk, ex, bl, fl = xs
        new_cv = _compress(cv, blk, ctr_lo, ctr_hi,
                           jnp.broadcast_to(bl, (n_chunks,) + batch),
                           jnp.broadcast_to(fl, (n_chunks,) + batch))
        cv = jnp.where(ex[None], new_cv, cv)
        return cv, None

    expand = (slice(None), slice(None)) + (None,) * nb
    xs = (blocks,
          jnp.asarray(exists.T)[expand],      # (max_blocks, n_chunks, 1..)
          jnp.asarray(blk_len.T)[expand],
          jnp.asarray(flags_np.T)[expand])
    chunk_cvs, _ = jax.lax.scan(step, cv0, xs)
    # chunk_cvs: (8, n_chunks) + batch

    if single_chunk:
        return chunk_cvs[:, 0]

    # ---- left-heavy blake3 tree merge over chunk CVs (static recursion) ----
    def subtree(lo, hi, is_root):
        n = hi - lo
        if n == 1:
            return chunk_cvs[:, lo]
        left_n = 1 << ((n - 1).bit_length() - 1)
        left = subtree(lo, lo + left_n, False)
        right = subtree(lo + left_n, hi, False)
        fl = PARENT | (ROOT if is_root else 0)
        return _compress(_iv_cv(batch),
                         jnp.concatenate([left, right], axis=0),
                         0, 0, 64, fl)

    return subtree(0, n_chunks, True)


@jax.jit
def merge(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Hash two 32-byte digests: blake3(d1 || d2).  (..., 8) each."""
    block = jnp.concatenate([_wf(d1), _wf(d2)], axis=0)
    out = _compress(_iv_cv(block.shape[1:]), block, 0, 0, 64,
                    CHUNK_START | CHUNK_END | ROOT)
    return _bl(out)


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


def _scan_blocks(cv, blocks, blens, flags, chunk_index, batch):
    """lax.scan of `_compress` over a (k, 16)+batch block stack (an
    unrolled multi-compress chain is a pathological XLA-CPU compile)."""

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


@functools.partial(jax.jit, static_argnums=(1, 2))
def chunk_cv(words: jnp.ndarray, chunk_bytes: int,
             chunk_index: int) -> jnp.ndarray:
    """CV of ONE blake3 chunk: `words` (..., ceil(chunk_bytes/64)*16) u32
    holding the chunk's blocks, with chunk counter `chunk_index` and
    CHUNK_START/CHUNK_END flags — never ROOT (caller merges parents)."""
    assert 1 <= chunk_bytes <= ref.CHUNK_LEN
    n_blocks = max(1, (chunk_bytes + 63) // 64)
    batch = words.shape[:-1]
    wf = _wf(words)
    total = n_blocks * 16
    if wf.shape[0] < total:
        wf = jnp.concatenate(
            [wf, jnp.zeros((total - wf.shape[0],) + batch, jnp.uint32)],
            axis=0)
    blocks = wf.reshape((n_blocks, 16) + batch)
    blens, flags = [], []
    rem = chunk_bytes
    for b in range(n_blocks):
        bl = min(64, rem)
        rem -= bl
        blens.append(bl)
        flags.append((CHUNK_START if b == 0 else 0)
                     | (CHUNK_END if b == n_blocks - 1 else 0))
    cv0 = _iv_cv(batch) + (blocks[0][:8] & jnp.uint32(0))
    return _bl(_scan_blocks(cv0, blocks, blens, flags, chunk_index, batch))


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
    blocks = _wf(words).reshape((k, 16) + batch)
    if cv is None:
        cv_wf = _iv_cv(batch)
    else:
        cv_wf = _wf(cv)
    blens, flags = [], []
    for i in range(k):
        b = b0 + i
        bl = min(64, chunk_bytes - b * 64)
        blens.append(bl)
        flags.append((CHUNK_START if b == 0 else 0)
                     | (CHUNK_END if b == total_blocks - 1 else 0))
    cv_wf = cv_wf + (blocks[0][:8] & jnp.uint32(0))
    return _bl(_scan_blocks(cv_wf, blocks, blens, flags, chunk_index, batch))


@functools.partial(jax.jit, static_argnums=(2,))
def parent_cv(left: jnp.ndarray, right: jnp.ndarray,
              is_root: bool) -> jnp.ndarray:
    """blake3 parent node over two child CVs ((..., 8) each)."""
    fl = PARENT | (ROOT if is_root else 0)
    block = jnp.concatenate([_wf(left), _wf(right)], axis=0)
    return _bl(_compress(_iv_cv(block.shape[1:]), block, 0, 0, 64, fl))