"""Blake3: python oracle vs spec vectors, and JAX vs oracle bit-exactness."""

import numpy as np
import pytest

from zk_stark_project_tpu.ops import blake3 as b3
from zk_stark_project_tpu.ops import blake3_ref as ref


def test_empty_input_spec_vector():
    # Official BLAKE3 test vector for the empty input.
    assert ref.blake3_hex(b"") == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )


def _to_words(data: bytes) -> np.ndarray:
    assert len(data) % 4 == 0
    return np.frombuffer(data, dtype="<u4")


@pytest.mark.parametrize("nbytes", [4, 32, 64, 128, 1024, 1920, 3840, 4096, 8192])
def test_jax_matches_oracle(rng, nbytes):
    """Word-aligned messages across block/chunk/tree boundaries."""
    batch = 4
    msgs = [bytes(rng.getrandbits(8) for _ in range(nbytes)) for _ in range(batch)]
    words = np.stack([_to_words(m) for m in msgs])  # (batch, W)
    got = np.asarray(b3.hash_words(words, nbytes))  # (batch, 8)
    for i, m in enumerate(msgs):
        want = np.frombuffer(ref.blake3(m), dtype="<u4")
        assert np.array_equal(got[i], want), f"mismatch at len={nbytes} idx={i}"


def test_merge_matches_oracle(rng):
    d1 = bytes(rng.getrandbits(8) for _ in range(32))
    d2 = bytes(rng.getrandbits(8) for _ in range(32))
    got = np.asarray(b3.merge(_to_words(d1)[None], _to_words(d2)[None]))[0]
    want = np.frombuffer(ref.merge(d1, d2), dtype="<u4")
    assert np.array_equal(got, want)


def test_merge_with_u64_matches_oracle(rng):
    seed = bytes(rng.getrandbits(8) for _ in range(32))
    vals = [0, 1, 2**32 - 1, 2**32, 2**63, rng.getrandbits(64)]
    v32 = np.array([[v & 0xFFFFFFFF, v >> 32] for v in vals], dtype=np.uint32)
    got = np.asarray(b3.merge_with_u64(_to_words(seed), v32))
    for i, v in enumerate(vals):
        want = np.frombuffer(ref.merge_with_int(seed, v), dtype="<u4")
        assert np.array_equal(got[i], want)


def test_hash_elements_layout(rng):
    """hash_elements = blake3 over canonical 16-byte LE element serialization
    (winterfell Blake3_256::hash_elements layout)."""
    from zk_stark_project_tpu.ops import f128, f128_ref
    els = [rng.getrandbits(128) % f128_ref.P for _ in range(7)]
    limbs = f128.from_ints(els)  # (8, 7)
    words = f128.to_uint32_words(limbs)  # (4, 7)
    row = np.asarray(words).T.reshape(-1)  # element-major LE words
    got = np.asarray(b3.hash_elements_words(row[None]))[0]
    want = np.frombuffer(ref.hash_elements(els), dtype="<u4")
    assert np.array_equal(got, want)
