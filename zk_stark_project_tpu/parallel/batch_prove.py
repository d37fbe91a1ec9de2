"""Data-parallel proving: one client's statement per mesh slot.

The reference proves each device's training update sequentially in a host
loop (`src/main.rs:160-261`); the statements are independent (SURVEY.md §2
"Data parallel"), so the TPU-native form shards the *client axis* of a
batched trace tensor across the mesh and runs the heavy prover phases
(interpolation, LDE, leaf hashing, Merkle reduction) on every client at
once — XLA inserts no collectives at all for this axis until the roots are
gathered.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import blake3 as b3
from ..ops import f128, ntt


def batched_commit(traces: jnp.ndarray, offset: int, blowup: int,
                   mesh: Mesh, axis_name: str = "dp") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """traces: (C, 8, W, n) batched client traces, sharded on the client
    axis.  Returns (lde (C, 8, W, N) sharded the same way, roots (C, 8)).

    Everything inside is per-client independent; with in/out shardings on
    the client axis XLA compiles one per-shard program and zero collectives.
    """
    c = traces.shape[0]

    @jax.jit
    def commit_one(trace):
        polys = ntt.interpolate(trace)
        lde = ntt.coset_evaluate(polys, offset, blowup)
        w = lde.shape[1]
        words = f128.to_uint32_words(lde)            # (4, W, N)
        words = jnp.transpose(words, (2, 1, 0)).reshape(lde.shape[2], w * 4)
        leaves = b3.hash_words(words, w * 16)        # (N, 8)
        # log-depth Merkle reduction to the root
        cur = leaves
        while cur.shape[0] > 1:
            cur = b3.merge(cur[0::2], cur[1::2])
        return lde, cur[0]

    sharding = NamedSharding(mesh, P(axis_name))
    traces = jax.device_put(traces, sharding)
    lde, roots = jax.vmap(commit_one)(traces)
    return lde, roots
