"""Native C++ host runtime: bit-exactness vs the pure-python oracles.

The native library backs the Fiat–Shamir transcript and verifier Merkle
checks (via `utils/fasthash.py`), so equality with the oracles here is what
keeps transcripts identical whichever backend is active.
"""

import random

import pytest

from zk_stark_project_tpu import native
from zk_stark_project_tpu.ops import blake3_ref as b3
from zk_stark_project_tpu.ops import f128_ref as ref
from zk_stark_project_tpu.ops import mimc
from zk_stark_project_tpu.utils import fasthash

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def test_blake3_lengths(rng):
    # spans: empty, sub-block, block edges, sub-chunk, multi-chunk, deep tree
    for ln in [0, 1, 31, 32, 63, 64, 65, 127, 320, 960, 1023, 1024, 1025,
               2048, 3840, 4096, 5000, 9000, 1024 * 8 + 17]:
        data = bytes(rng.randrange(256) for _ in range(ln))
        assert native.blake3(data) == b3.blake3(data), ln


def test_blake3_merge_and_rows(rng):
    import numpy as np
    a, b = b3.blake3(b"left"), b3.blake3(b"right")
    assert native.blake3_merge(a, b) == b3.merge(a, b)
    rows = np.frombuffer(
        bytes(rng.randrange(256) for _ in range(6 * 96)),
        dtype=np.uint8).reshape(6, 96)
    got = native.blake3_rows(rows)
    for i in range(6):
        assert got[i].tobytes() == b3.blake3(rows[i].tobytes())


def test_f128_ops(rng):
    xs = [rng.randrange(ref.P) for _ in range(128)]
    ys = [rng.randrange(ref.P) for _ in range(128)]
    edge = [0, 1, 2, ref.P - 1, ref.P - 2, 2 ** 127, 2 ** 64, 2 ** 64 - 1,
            2 ** 127 + 2 ** 63, ref.P - 2 ** 40]
    xs += edge
    ys += list(reversed(edge))
    assert native.f128_add(xs, ys) == [(x + y) % ref.P for x, y in zip(xs, ys)]
    assert native.f128_sub(xs, ys) == [(x - y) % ref.P for x, y in zip(xs, ys)]
    assert native.f128_mul(xs, ys) == [(x * y) % ref.P for x, y in zip(xs, ys)]
    nz = [x for x in xs[:16] if x]
    assert native.f128_inv(nz) == [ref.inv(x) for x in nz]


def test_f128_poly_eval(rng):
    coeffs = [rng.randrange(ref.P) for _ in range(33)]
    x = rng.randrange(ref.P)
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % ref.P
    assert native.f128_poly_eval(coeffs, x) == expect


def test_mimc(rng):
    rcs = mimc.round_constants_int()
    x, z = rng.randrange(ref.P), rng.randrange(ref.P)
    assert native.mimc_cipher(x, rcs[5], z) == mimc.ref_mimc_cipher(x, rcs[5], z)
    w = [[rng.randrange(ref.P) for _ in range(9)] for _ in range(6)]
    b = [rng.randrange(ref.P) for _ in range(6)]
    cells = []
    for i in range(6):
        cells.extend(w[i])
        cells.append(b[i])
    idx = mimc.state_rc_indices(6, 9)
    assert native.mimc_hash_state(cells, rcs, idx) == \
        mimc.ref_mimc_hash_matrix(w, b)


def test_merkle_verify(rng):
    leaves = [b3.blake3(bytes([i, i + 1])) for i in range(16)]
    levels = [leaves]
    cur = leaves
    while len(cur) > 1:
        cur = [b3.merge(cur[i], cur[i + 1]) for i in range(0, len(cur), 2)]
        levels.append(cur)
    root = levels[-1][0]
    for i in range(16):
        path, idx = [], i
        for level in levels[:-1]:
            path.append(level[idx ^ 1])
            idx >>= 1
        assert native.merkle_verify(leaves[i], i, path, root)
        assert fasthash.merkle_verify(leaves[i], i, path, root)
        assert not native.merkle_verify(leaves[i], i ^ 1, path, root)
        bad = path[:1] + [b3.blake3(b"x")] + path[2:]
        assert not native.merkle_verify(leaves[i], i, bad, root)


def test_fasthash_dispatch():
    # whichever backend fasthash picked, it must agree with the oracle
    data = b"transcript-bytes" * 7
    assert fasthash.blake3(data) == b3.blake3(data)
    a, b = b3.blake3(b"1"), b3.blake3(b"2")
    assert fasthash.merge(a, b) == b3.merge(a, b)
