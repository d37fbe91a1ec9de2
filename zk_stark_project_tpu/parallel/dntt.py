"""Distributed NTT over a device mesh — the framework's
"context parallelism" (SURVEY.md §5: trace length is the long dimension;
sharding the NTT/LDE domain across chips is the CP/SP equivalent and the
BASELINE north-star workload).

Four-step (transpose) algorithm over N = N1 * N2 points on D devices,
N1 = D * r rows, columns n2 sharded:

  X[k1 + N1*k2] = sum_{n2} w_N^(n2*k1) * w_N2^(n2*k2)
                  * (sum_{n1} x[n1*N2 + n2] * w_N1^(n1*k1))

  1. local column NTTs of size N1 (each device holds all n1 for its n2
     block) — pure VPU work;
  2. elementwise twiddle w_N^(n2*k1) (host-precomputed table, sharded in);
  3. ONE all-to-all that transposes the shard axis from n2 to k1 (this is
     the butterfly-exchange moment; over ICI on a real slice);
  4. local row NTTs of size N2.

Output is in "transposed digit" order: out[k1, k2] = X[k1 + N1*k2], sharded
on k1.  `untranspose` gives the natural-order vector (a host/gather-side
reshape+transpose; protocol consumers fold the order into their indexing
instead of paying the shuffle).

Winterfell's rayon `concurrent` feature (`Cargo.toml:11`) is the
single-host analog this replaces.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import ntt


@functools.lru_cache(maxsize=None)
def _twiddle_table(log2_n1: int, log2_n2: int) -> np.ndarray:
    """w_N^(n1k_row * n2col) table of shape (8, N1, N2) as uint32 limbs (host)."""
    n1, n2 = 1 << log2_n1, 1 << log2_n2
    w = ref.root_of_unity(log2_n1 + log2_n2)
    # T[k1, n2] = w^(k1*n2)
    rows = np.zeros((n1, n2), dtype=object)
    for k1 in range(n1):
        base = pow(w, k1, ref.P)
        cur = 1
        for j in range(n2):
            rows[k1, j] = cur
            cur = (cur * base) % ref.P
    return np.stack(
        [((rows >> (ref.LIMB_BITS * i)) & ref.LIMB_MASK).astype(np.uint32)
         for i in range(ref.NUM_LIMBS)], axis=0)


def _ntt_along(x: jnp.ndarray, axis: int, inverse: bool = False) -> jnp.ndarray:
    moved = jnp.moveaxis(x, axis, -1)
    out = ntt.ntt(moved, inverse=inverse)
    return jnp.moveaxis(out, -1, axis)


def dntt(values: jnp.ndarray, mesh: Mesh, axis_name: str = "tp",
         log2_n1: Optional[int] = None) -> jnp.ndarray:
    """Distributed NTT of (8, N) values (natural order) over mesh axis
    `axis_name`.  Returns (8, N1, N2) evaluations in transposed-digit order
    (out[:, k1, k2] = X[k1 + N1*k2]), sharded on k1.
    """
    n = values.shape[-1]
    d = mesh.shape[axis_name]
    log2_n = n.bit_length() - 1
    if log2_n1 is None:
        log2_n1 = max((d - 1).bit_length(), log2_n // 2)
        log2_n1 = max(log2_n1, (d - 1).bit_length())
    log2_n2 = log2_n - log2_n1
    n1, n2 = 1 << log2_n1, 1 << log2_n2
    assert n1 % d == 0 and n2 % d == 0, "N1 and N2 must be divisible by D"

    tw = jnp.asarray(_twiddle_table(log2_n1, log2_n2))
    mat = values.reshape(8, n1, n2)

    def kernel(block, tw_block):
        # block: (8, N1, N2/D) — all n1, a shard of n2
        a = _ntt_along(block, 1)                     # size-N1 NTTs over n1
        a = f128.mul(a, tw_block)                    # w_N^(k1*n2)
        # transpose shard axis: n2-sharded -> k1-sharded
        a = jax.lax.all_to_all(a, axis_name, split_axis=1, concat_axis=2,
                               tiled=True)           # (8, N1/D, N2)
        return _ntt_along(a, 2)                      # size-N2 NTTs over n2

    spec_in = P(None, None, axis_name)
    spec_out = P(None, axis_name, None)
    f = jax.shard_map(kernel, mesh=mesh, in_specs=(spec_in, spec_in),
                      out_specs=spec_out)
    return f(mat, tw)


def untranspose(out: jnp.ndarray) -> jnp.ndarray:
    """(8, N1, N2) transposed-digit output -> (8, N) natural order."""
    n1, n2 = out.shape[1], out.shape[2]
    return jnp.transpose(out, (0, 2, 1)).reshape(8, n1 * n2)


def dntt_natural(values: jnp.ndarray, mesh: Mesh,
                 axis_name: str = "tp") -> jnp.ndarray:
    """Convenience: distributed NTT returning natural order (pays a global
    transpose; use `dntt` + transposed-order consumers in hot paths)."""
    return untranspose(dntt(values, mesh, axis_name))
