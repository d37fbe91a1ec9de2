"""Fiat–Shamir transcript (random coin) over Blake3-256 — host side.

TPU-native replacement for winterfell's `DefaultRandomCoin<Blake3_256>`
(`src/training/prover.rs:227`, `src/aggregation/prover.rs:200`).  The
transcript is inherently sequential and tiny (a few hundred 64-byte hashes
per proof), so it runs on the host with the native C++ Blake3 when the
toolchain can build it (`zk_stark_project_tpu/native`), else the pure-python
oracle (`ops/blake3_ref.py`) — the same function the batched TPU kernel
(`ops/blake3.py`) implements, so digests produced on device (Merkle roots)
reseed the coin directly.

Transcript layout (documented contract; every byte is specified here so the
verifier and any future bit-exactness pass have a single source of truth):

  * seed0   = blake3(context_bytes)  where context_bytes =
              pub_inputs_bytes || trace_width:u32le || trace_length:u32le ||
              options.to_bytes()
  * reseed(d): seed = blake3(seed || d); counter = 0
  * draw():  counter += 1; h = blake3(seed || counter:u64le);
             x = LE-u128(h[0:16]); retry while x >= p
  * draw_integers(k, n): counter += 1; h = blake3(seed || counter:u64le);
             pos = LE-u64(h[0:8]) & (n-1)   (n a power of two), deduplicated
  * leading_zeros(nonce): h = blake3(seed || nonce:u64le);
             lz = 64 - bit_length(LE-u64(h[0:8]))

The reseed / per-draw / grinding hash FRAMINGS equal winterfell's
`Hasher::merge` (one 64-byte message of two digests) and
`Hasher::merge_with_int` (one 40-byte message of digest || u64-LE) by
construction, with the counter reset-to-0 and start-at-1 behavior of
`DefaultRandomCoin`; only the seed MATERIAL (`context_bytes`) and proof
serialization remain a self-defined contract — see BITEXACT.md.
"""

from __future__ import annotations

import struct
from typing import List, Sequence

import numpy as np

from ..ops import f128_ref as ref
from ..utils import fasthash as b3


def felt_to_bytes(x: int) -> bytes:
    """Canonical little-endian 16-byte layout of a field element (matches
    winterfell f128 `Serializable`)."""
    return int(x % ref.P).to_bytes(16, "little")


def felts_to_bytes(xs: Sequence[int]) -> bytes:
    # inlined felt_to_bytes: this serializes every proof opening's values
    # for leaf hashing (~100k elements per bs=1 pipeline), so the per-call
    # function overhead is worth dodging
    p = ref.P
    return b"".join((x % p).to_bytes(16, "little") for x in xs)


def hash_elements(xs: Sequence[int]) -> bytes:
    """blake3 of the canonical byte concatenation of field elements."""
    return b3.blake3(felts_to_bytes(xs))


def digest_words_to_bytes(words: np.ndarray) -> bytes:
    """(8,) uint32 digest (device layout) -> 32 bytes."""
    return np.asarray(words, dtype=np.uint32).astype("<u4").tobytes()


class RandomCoin:
    """Blake3-based public coin."""

    def __init__(self, seed_material: bytes):
        self.seed = b3.blake3(seed_material)
        self.counter = 0

    def reseed(self, digest: bytes) -> None:
        assert len(digest) == 32, "reseed expects a 32-byte digest"
        self.seed = b3.blake3(self.seed + digest)
        self.counter = 0

    def reseed_with_elements(self, xs: Sequence[int]) -> None:
        self.reseed(hash_elements(xs))

    def _next_hash(self) -> bytes:
        self.counter += 1
        return b3.blake3(self.seed + struct.pack("<Q", self.counter))

    def draw(self) -> int:
        """Draw one field element (rejection sampling on 128-bit strings)."""
        while True:
            h = self._next_hash()
            x = int.from_bytes(h[0:16], "little")
            if x < ref.P:
                return x

    def draw_many(self, k: int) -> List[int]:
        return [self.draw() for _ in range(k)]

    def draw_coefficients(self, k: int, batching: str) -> List[int]:
        """Constraint/DEEP batching coefficients: `algebraic` = powers
        1, a, a^2, ... of a single drawn element (winterfell
        BatchingMethod::Algebraic, `src/main.rs:106`); `linear` = k draws."""
        if batching == "algebraic":
            a = self.draw()
            out, cur = [], 1
            for _ in range(k):
                out.append(cur)
                cur = (cur * a) % ref.P
            return out
        return self.draw_many(k)

    def draw_integers(self, k: int, domain_size: int) -> List[int]:
        """Draw k *distinct* integers in [0, domain_size) (power of two).
        Matches the query-position draw; deduplication keeps first
        occurrence order."""
        assert domain_size & (domain_size - 1) == 0
        seen, out = set(), []
        attempts = 0
        while len(out) < k and attempts < 1000 * k:
            h = self._next_hash()
            pos = int.from_bytes(h[0:8], "little") & (domain_size - 1)
            attempts += 1
            if pos not in seen:
                seen.add(pos)
                out.append(pos)
        assert len(out) == k, "failed to draw distinct query positions"
        return out

    def leading_zeros(self, nonce: int) -> int:
        h = b3.blake3(self.seed + struct.pack("<Q", nonce))
        v = int.from_bytes(h[0:8], "little")
        return 64 - v.bit_length()

    def reseed_with_int(self, nonce: int) -> None:
        self.seed = b3.blake3(self.seed + struct.pack("<Q", nonce))
        self.counter = 0


def context_bytes(pub_inputs_bytes: bytes, trace_width: int,
                  trace_length: int, options) -> bytes:
    return (pub_inputs_bytes
            + struct.pack("<II", trace_width, trace_length)
            + options.to_bytes())
