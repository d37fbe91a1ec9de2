"""Pallas TPU kernel for the grinding (proof-of-work) search.

The generic Blake3 (`ops/blake3.py`) keeps the hash state as (..., 4) row
vectors — the right shape for XLA-CPU compile times, but on TPU it leaves
125 of 128 VPU lanes idle.  Grinding hashes ONE 40-byte block per nonce
(seed || nonce_u64, `RandomCoin::check_leading_zeros` semantics), millions
of times — so this kernel lays the nonce axis across the lanes and keeps
all 16 state words as separate (C, R, 128) planes: full-width VPU, zero
HBM traffic besides the two output digest words.

Bit-exact vs `ops/blake3_ref.py` (tested in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import blake3_ref as ref

_IV = tuple(int(x) for x in ref.IV)
_FLAGS = ref.CHUNK_START | ref.CHUNK_END | ref.ROOT  # single 40-byte block

#: nonce rows per grid step (R * 128 nonces per step)
_ROWS = 16


def _schedules():
    idx = list(range(16))
    out = []
    for _ in range(7):
        out.append(list(idx))
        idx = [idx[ref.MSG_PERMUTATION[i]] for i in range(16)]
    return out


_SCHEDULES = _schedules()


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _pow_kernel(seed_ref, base_ref, o0_ref, o1_ref):
    from jax.experimental import pallas as pl

    c = seed_ref.shape[0]
    i = pl.program_id(0)
    shape = (c, _ROWS, 128)

    r_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    l_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    flat = r_ids * jnp.uint32(128) + l_ids
    lo = base_ref[0, 0] + i.astype(jnp.uint32) * jnp.uint32(_ROWS * 128) + flat
    hi = jnp.broadcast_to(base_ref[0, 1], shape)

    def m(j):
        if j < 8:
            return seed_ref[:, j:j + 1][:, :, None]  # (C,1,1) broadcast
        if j == 8:
            return lo
        if j == 9:
            return hi
        return jnp.uint32(0)

    v = [jnp.broadcast_to(jnp.uint32(_IV[k]), shape) for k in range(8)]
    v += [jnp.broadcast_to(jnp.uint32(_IV[k]), shape) for k in range(4)]
    v += [jnp.broadcast_to(jnp.uint32(0), shape),      # counter lo
          jnp.broadcast_to(jnp.uint32(0), shape),      # counter hi
          jnp.broadcast_to(jnp.uint32(40), shape),     # block len
          jnp.broadcast_to(jnp.uint32(_FLAGS), shape)]

    def g(a, b, cc, d, mx, my):
        a = a + b + mx
        d = _rotr(d ^ a, 16)
        cc = cc + d
        b = _rotr(b ^ cc, 12)
        a = a + b + my
        d = _rotr(d ^ a, 8)
        cc = cc + d
        b = _rotr(b ^ cc, 7)
        return a, b, cc, d

    for r in range(7):
        s = _SCHEDULES[r]
        for col in range(4):
            (v[col], v[col + 4], v[col + 8], v[col + 12]) = g(
                v[col], v[col + 4], v[col + 8], v[col + 12],
                m(s[2 * col]), m(s[2 * col + 1]))
        diag = [(0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14)]
        for di, (a_i, b_i, c_i, d_i) in enumerate(diag):
            (v[a_i], v[b_i], v[c_i], v[d_i]) = g(
                v[a_i], v[b_i], v[c_i], v[d_i],
                m(s[8 + 2 * di]), m(s[9 + 2 * di]))

    o0_ref[:] = (v[0] ^ v[8]).reshape(c, _ROWS * 128)
    o1_ref[:] = (v[1] ^ v[9]).reshape(c, _ROWS * 128)


@functools.partial(jax.jit, static_argnums=(3,))
def pow_digest_words(seeds: jnp.ndarray, base_lo: jnp.ndarray,
                     base_hi: jnp.ndarray, chunk_log2: int):
    """First two digest words of blake3(seed || nonce_u64_le) for a chunk
    of 2^chunk_log2 nonces per seed.

    seeds: (C, 8) uint32.  The chunk base (base_lo, base_hi) must be
    chunk-aligned so lo never carries into hi.  Returns (w0, w1), each
    (C, 2^chunk_log2) uint32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os
    interpret = os.environ.get("ZKSTARK_FORCE_PALLAS") == "interpret"

    c = seeds.shape[0]
    size = 1 << chunk_log2
    tile = _ROWS * 128
    assert size % tile == 0, "chunk must be a multiple of the kernel tile"
    base = jnp.stack([base_lo, base_hi]).reshape(1, 2)

    out_spec = pl.BlockSpec((c, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    w0, w1 = pl.pallas_call(
        _pow_kernel,
        out_shape=(jax.ShapeDtypeStruct((c, size), jnp.uint32),
                   jax.ShapeDtypeStruct((c, size), jnp.uint32)),
        grid=(size // tile,),
        in_specs=[
            pl.BlockSpec((c, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(seeds, base)
    return w0, w1
