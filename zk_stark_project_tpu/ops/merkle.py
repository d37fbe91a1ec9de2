"""Batched Blake3 Merkle tree — commitment layer (TPU) + host path logic.

Replaces winterfell's `MerkleTree<Blake3_256>` vector commitment
(`src/training/prover.rs:226-227`, `src/aggregation/prover.rs:199-200`):
leaves are 32-byte digests, parent = blake3(left || right).  Tree
construction is a log-depth batched reduction — each level is one vectorized
`merge` call over all sibling pairs (TPU VPU work); authentication-path
extraction and verification are cheap host-side index math.

Digests are (..., 8) uint32 word arrays (little-endian), matching
`ops/blake3.py`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import blake3 as b3
from . import blake3_ref


class MerkleTree:
    """Merkle tree over a power-of-two number of leaf digests.

    levels[0] = leaves (N, 8) uint32; levels[-1] = root (1, 8).
    """

    #: above this many leaves, level merges run SEGMENTED and SERIALIZED:
    #: async dispatch otherwise enqueues every level's jitted merge at
    #: once and their in/out buffers are ALL live until executed — the
    #: 2^24-leaf trace tree of the 2^20 north-star proof OOM'd next to
    #: the resident coefficient table (measured; bounded it fits).  Small
    #: trees stay fully async (the latency-bound regime).
    SYNC_LEAVES = 1 << 21
    SEG_PAIRS = 1 << 20

    def __init__(self, leaves: jnp.ndarray):
        n = leaves.shape[0]
        assert n & (n - 1) == 0 and n >= 1, "leaf count must be a power of two"
        sync = n > self.SYNC_LEAVES
        levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            # pair leaves by STRIDED slices fused into the merge program —
            # a (m, 16) reshape of the (2m, 8) level is a relayout XLA
            # lowers with a ~24x-padded temp (measured 12.9 GB at 2^24
            # leaves; `jit(reshape).compile().memory_analysis()`), while
            # strided slices cost zero temp and fuse into the hash
            m = cur.shape[0] // 2
            if not sync or m <= self.SEG_PAIRS:
                cur = b3.merge(cur[0::2], cur[1::2])
                if sync and cur.shape[0] > 1024:
                    cur.block_until_ready()
            else:
                segs = []
                for s in range(0, m, self.SEG_PAIRS):
                    seg = cur[2 * s:2 * (s + self.SEG_PAIRS)]
                    seg = b3.merge(seg[0::2], seg[1::2])
                    seg.block_until_ready()
                    segs.append(seg)
                cur = jnp.concatenate(segs)
            levels.append(cur)
        self.levels = levels

    @property
    def root(self) -> np.ndarray:
        return np.asarray(self.levels[-1][0])

    def root_bytes(self) -> bytes:
        return np.asarray(self.levels[-1][0]).astype("<u4").tobytes()

    @property
    def depth(self) -> int:
        return len(self.levels) - 1

    def prove(self, index: int) -> List[np.ndarray]:
        """Authentication path (sibling digests bottom-up) for one leaf."""
        path = []
        idx = index
        for level in self.levels[:-1]:
            path.append(np.asarray(level[idx ^ 1]))
            idx >>= 1
        return path

    def prove_batch(self, indices: Sequence[int]) -> List[List[np.ndarray]]:
        """Authentication paths for many leaves.

        Siblings are gathered ON DEVICE (one jnp.take per level) and pulled
        in a single host transfer — device->host roundtrips are the
        bottleneck on a tunneled TPU (each costs ~25ms; a per-node pull
        would be levels x queries of them)."""
        indices = list(indices)
        if not indices:
            return []
        gathered = []
        # copy: `idx >>= 1` below must never alias a caller-owned array
        idx = np.array(indices, dtype=np.int32, copy=True)
        for level in self.levels[:-1]:
            sib = jnp.take(level, jnp.asarray(idx ^ 1), axis=0)  # (P, 8)
            gathered.append(sib)
            idx >>= 1
        all_sibs = np.asarray(jnp.stack(gathered, axis=0))  # (L, P, 8)
        return [[all_sibs[l, q] for l in range(all_sibs.shape[0])]
                for q in range(len(indices))]


def verify_path(leaf_digest: np.ndarray, index: int,
                path: Sequence[np.ndarray], root: np.ndarray) -> bool:
    """Host-side (oracle) path verification via the python Blake3."""
    cur = np.asarray(leaf_digest, dtype=np.uint32).astype("<u4").tobytes()
    idx = index
    for sib in path:
        sib_b = np.asarray(sib, dtype=np.uint32).astype("<u4").tobytes()
        cur = blake3_ref.merge(sib_b, cur) if idx & 1 else blake3_ref.merge(cur, sib_b)
        idx >>= 1
    return cur == np.asarray(root, dtype=np.uint32).astype("<u4").tobytes()
