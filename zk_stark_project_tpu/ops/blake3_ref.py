"""Blake3-256 — pure-python oracle implementation (from the BLAKE3 spec).

This is the hash the reference commits with: winterfell's
`Blake3_256` hasher + `MerkleTree` vector commitment
(`src/training/prover.rs:226-227`, `src/aggregation/prover.rs:199-200`).
Used host-side for the Fiat–Shamir transcript and the golden verifier; the
vectorized TPU version lives in `ops/blake3.py` and is tested bit-exact
against this one.

Only plain hashing (no keyed/derive modes) is needed.
"""

from __future__ import annotations

import struct
from typing import List, Sequence

IV = [
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
]

MSG_PERMUTATION = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3

BLOCK_LEN = 64
CHUNK_LEN = 1024

_MASK = 0xFFFFFFFF


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & _MASK


def _g(state: List[int], a: int, b: int, c: int, d: int, mx: int, my: int):
    state[a] = (state[a] + state[b] + mx) & _MASK
    state[d] = _rotr(state[d] ^ state[a], 16)
    state[c] = (state[c] + state[d]) & _MASK
    state[b] = _rotr(state[b] ^ state[c], 12)
    state[a] = (state[a] + state[b] + my) & _MASK
    state[d] = _rotr(state[d] ^ state[a], 8)
    state[c] = (state[c] + state[d]) & _MASK
    state[b] = _rotr(state[b] ^ state[c], 7)


def _round(state: List[int], m: Sequence[int]):
    _g(state, 0, 4, 8, 12, m[0], m[1])
    _g(state, 1, 5, 9, 13, m[2], m[3])
    _g(state, 2, 6, 10, 14, m[4], m[5])
    _g(state, 3, 7, 11, 15, m[6], m[7])
    _g(state, 0, 5, 10, 15, m[8], m[9])
    _g(state, 1, 6, 11, 12, m[10], m[11])
    _g(state, 2, 7, 8, 13, m[12], m[13])
    _g(state, 3, 4, 9, 14, m[14], m[15])


def compress(cv: Sequence[int], block_words: Sequence[int], counter: int,
             block_len: int, flags: int) -> List[int]:
    state = [int(v) for v in cv[:8]] + IV[:4] + [
        int(counter) & _MASK, (int(counter) >> 32) & _MASK,
        int(block_len), int(flags),
    ]
    m = [int(v) for v in block_words]
    for r in range(7):
        _round(state, m)
        if r < 6:
            m = [m[MSG_PERMUTATION[i]] for i in range(16)]
    return [(state[i] ^ state[i + 8]) & _MASK for i in range(8)]


def _words_from_bytes(b: bytes) -> List[int]:
    padded = b + b"\x00" * (-len(b) % 4)
    return list(struct.unpack("<%dI" % (len(padded) // 4), padded))


def _chunk_cv(chunk: bytes, chunk_counter: int, is_root: bool) -> List[int]:
    """Chaining value of one chunk (<= 1024 bytes)."""
    blocks = [chunk[i:i + BLOCK_LEN] for i in range(0, max(len(chunk), 1), BLOCK_LEN)]
    cv = list(IV)
    n = len(blocks)
    for i, blk in enumerate(blocks):
        words = _words_from_bytes(blk) + [0] * (16 - (len(blk) + 3) // 4)
        words = words[:16]
        flags = 0
        if i == 0:
            flags |= CHUNK_START
        if i == n - 1:
            flags |= CHUNK_END
            if is_root:
                flags |= ROOT
        cv = compress(cv, words, chunk_counter, len(blk), flags)
    return cv


def _left_chunks(n_chunks: int) -> int:
    """Largest power of two strictly less than n_chunks (spec tree rule)."""
    assert n_chunks >= 2
    return 1 << (n_chunks - 1).bit_length() - 1


def _subtree_cv(data: bytes, chunk_counter: int, is_root: bool) -> List[int]:
    n_chunks = max(1, (len(data) + CHUNK_LEN - 1) // CHUNK_LEN)
    if n_chunks == 1:
        return _chunk_cv(data, chunk_counter, is_root)
    left_n = _left_chunks(n_chunks)
    left = _subtree_cv(data[:left_n * CHUNK_LEN], chunk_counter, False)
    right = _subtree_cv(data[left_n * CHUNK_LEN:], chunk_counter + left_n, False)
    flags = PARENT | (ROOT if is_root else 0)
    return compress(IV, left + right, 0, BLOCK_LEN, flags)


def blake3(data: bytes) -> bytes:
    """256-bit BLAKE3 hash of `data`."""
    cv = _subtree_cv(data, 0, True)
    return struct.pack("<8I", *cv)


def blake3_hex(data: bytes) -> str:
    return blake3(data).hex()


# ---------------------------------------------------------------------------
# winterfell-hasher-shaped helpers (Blake3_256<Felt> semantics):
# elements serialize as canonical u128 little-endian (16 bytes each).
# ---------------------------------------------------------------------------


def hash_elements(elements: Sequence[int]) -> bytes:
    data = b"".join(int(e).to_bytes(16, "little") for e in elements)
    return blake3(data)


def merge(d1: bytes, d2: bytes) -> bytes:
    assert len(d1) == 32 and len(d2) == 32
    return blake3(d1 + d2)


def merge_with_int(seed: bytes, value: int) -> bytes:
    """blake3(seed || value as u64 LE) — transcript counter/nonce hashing."""
    assert len(seed) == 32
    return blake3(seed + int(value).to_bytes(8, "little"))
