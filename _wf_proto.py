"""Prototype: words-first blake3 compress — temp-memory + bit-exactness."""
import jax, jax.numpy as jnp, numpy as np
from zk_stark_project_tpu.ops import blake3_ref as ref
from zk_stark_project_tpu.ops import blake3 as b3

_IV = np.array(ref.IV, dtype=np.uint32)
_SCHED = b3._SCHEDULES


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _quarter_wf(a, b, c, d, mx, my):
    a = a + b + mx
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + my
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _compress_wf(cv, block, counter_lo, counter_hi, block_len, flags):
    """cv: (8,)+batch; block: (16,)+batch. words-first."""
    batch = cv.shape[1:]

    def _row(v):
        if isinstance(v, int):
            return jnp.broadcast_to(jnp.uint32(v), batch)
        return jnp.broadcast_to(v.astype(jnp.uint32), batch)

    a = cv[0:4]
    b = cv[4:8]
    c = jnp.broadcast_to(jnp.asarray(_IV[:4]).reshape((4,) + (1,) * len(batch)), (4,) + batch)
    d = jnp.stack([_row(counter_lo), _row(counter_hi), _row(block_len), _row(flags)])
    m = block
    for r in range(7):
        s = _SCHED[r]
        a, b, c, d = _quarter_wf(a, b, c, d,
                                 m[np.array([s[0], s[2], s[4], s[6]])],
                                 m[np.array([s[1], s[3], s[5], s[7]])])
        b = jnp.roll(b, -1, axis=0)
        c = jnp.roll(c, -2, axis=0)
        d = jnp.roll(d, -3, axis=0)
        a, b, c, d = _quarter_wf(a, b, c, d,
                                 m[np.array([s[8], s[10], s[12], s[14]])],
                                 m[np.array([s[9], s[11], s[13], s[15]])])
        b = jnp.roll(b, 1, axis=0)
        c = jnp.roll(c, 2, axis=0)
        d = jnp.roll(d, 3, axis=0)
    return jnp.concatenate([a ^ c, b ^ d], axis=0)


def merge_wf(d1, d2):
    """(N, 8) x (N, 8) -> (N, 8), words-first internally."""
    blk = jnp.concatenate([jnp.moveaxis(d1, -1, 0), jnp.moveaxis(d2, -1, 0)], axis=0)
    iv = jnp.broadcast_to(jnp.asarray(_IV).reshape(8, 1), (8,) + blk.shape[1:])
    out = _compress_wf(iv, blk, 0, 0, 64, ref.CHUNK_START | ref.CHUNK_END | ref.ROOT)
    return jnp.moveaxis(out, 0, -1)


if __name__ == "__main__":
    S = jax.ShapeDtypeStruct
    N = 1 << 23
    c = jax.jit(merge_wf).lower(S((N, 8), jnp.uint32), S((N, 8), jnp.uint32)).compile()
    m = c.memory_analysis()
    print(f"merge_wf batch 2^23: out={m.output_size_in_bytes/2**20:.0f}M temp={m.temp_size_in_bytes/2**20:.0f}M")
    c2 = jax.jit(lambda x: merge_wf(x[0::2], x[1::2])).lower(S((1 << 24, 8), jnp.uint32)).compile()
    m2 = c2.memory_analysis()
    print(f"strided level merge 2^24: out={m2.output_size_in_bytes/2**20:.0f}M temp={m2.temp_size_in_bytes/2**20:.0f}M")
    # bit-exactness vs oracle (root-flag parent merge semantics like b3.merge)
    rng = np.random.default_rng(0)
    d1 = rng.integers(0, 2**32, (5, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2**32, (5, 8), dtype=np.uint32)
    got = np.asarray(merge_wf(jnp.asarray(d1), jnp.asarray(d2)))
    ok = True
    for i in range(5):
        want = ref.merge(d1[i].astype("<u4").tobytes(), d2[i].astype("<u4").tobytes())
        if got[i].astype("<u4").tobytes() != want:
            ok = False
    print("bit-exact vs oracle:", ok)
    old = np.asarray(b3.merge(jnp.asarray(d1), jnp.asarray(d2)))
    print("matches row-form merge:", bool((old == got).all()))
