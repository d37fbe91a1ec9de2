"""Host-side hash dispatch: native C++ Blake3 when available, else oracle.

The Fiat–Shamir transcript (`prover/channel.py`) and the verifier's Merkle
path checks (`verifier/verify.py`) run on the host; with the pure-python
Blake3 a single reference-options proof costs thousands of slow
compressions.  This module picks the C++ implementation
(`zk_stark_project_tpu/native`) when it can be built, falling back to the
spec oracle (`ops/blake3_ref.py`).  Both are bit-exact by test
(`tests/test_native.py`), so the choice never changes transcripts.
"""

from __future__ import annotations

from typing import Sequence

from ..ops import blake3_ref as _oracle

try:  # pragma: no cover - availability depends on the host toolchain
    from .. import native as _native
    _HAVE_NATIVE = _native.available()
except Exception:  # noqa: BLE001 - any build/load failure means fallback
    _native = None
    _HAVE_NATIVE = False


def native_active() -> bool:
    return _HAVE_NATIVE


if _HAVE_NATIVE:
    blake3 = _native.blake3
    merge = _native.blake3_merge

    def merkle_verify(leaf: bytes, index: int, path: Sequence[bytes],
                      root: bytes) -> bool:
        return _native.merkle_verify(leaf, index, list(path), root)
else:
    blake3 = _oracle.blake3
    merge = _oracle.merge

    def merkle_verify(leaf: bytes, index: int, path: Sequence[bytes],
                      root: bytes) -> bool:
        cur = leaf
        idx = index
        for sib in path:
            cur = _oracle.merge(sib, cur) if idx & 1 else _oracle.merge(cur, sib)
            idx >>= 1
        return cur == root
