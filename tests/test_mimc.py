"""MiMC-e7 (f128 variant) — JAX vs python-int oracle.

Workload mirrors `benches/bench_mimc.rs` (cipher + 6x9 matrix hash).
"""

import numpy as np

from zk_stark_project_tpu.ops import f128, f128_ref as ref, mimc


def test_round_constants():
    rcs = mimc.round_constants_int()
    assert rcs[0] == 1_000_000
    assert rcs[63] == 64_000_000
    assert len(rcs) == 64


def test_cipher_matches_oracle(rng):
    inputs = [rng.getrandbits(128) % ref.P for _ in range(8)]
    rc = 3_000_000
    z = rng.getrandbits(100)
    got = f128.to_ints(
        mimc.mimc_cipher(f128.from_ints(inputs), f128.from_int(rc), f128.from_int(z))
    )
    want = [mimc.ref_mimc_cipher(x, rc, z % ref.P) for x in inputs]
    assert [int(v) for v in got] == want


def test_hash_matrix_matches_oracle(rng):
    ac, fe = 6, 9
    w = [[rng.getrandbits(64) for _ in range(fe)] for _ in range(ac)]
    b = [rng.getrandbits(64) for _ in range(ac)]
    w_l = f128.from_ints(np.array(w, dtype=object))
    b_l = f128.from_ints(np.array(b, dtype=object))
    got = f128.to_int(mimc.mimc_hash_matrix(w_l, b_l))
    assert got == mimc.ref_mimc_hash_matrix(w, b)


def test_cipher_batch_broadcast(rng):
    """Vectorization across many lanes must equal per-element hashing."""
    xs = [rng.getrandbits(128) % ref.P for _ in range(32)]
    rc = 1_000_000
    z = 42
    batch = f128.to_ints(
        mimc.mimc_cipher(f128.from_ints(xs), f128.from_int(rc), f128.from_int(z))
    )
    for x, got in zip(xs, batch):
        assert int(got) == mimc.ref_mimc_cipher(x, rc, z)
