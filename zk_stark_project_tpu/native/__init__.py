"""Native host runtime — C++ via ctypes, with transparent fallback.

The reference's host-side engine is native Rust (winterfell,
`Cargo.toml:11`); this package is its C++ counterpart for everything that
stays on the host in the TPU design: the Fiat–Shamir Blake3 transcript,
Merkle path verification, f128 scalar/array arithmetic, and MiMC digests.
The device compute path (JAX/Pallas) never goes through here.

The shared library is compiled on first use with g++ (baked into the image)
and cached next to the sources; if no compiler is available every consumer
falls back to the pure-python oracles, so the framework keeps working —
just slower on host-side verification.

Usage:
    from zk_stark_project_tpu import native
    if native.available():
        native.blake3(b"...")
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "zkstark_native.cc")
_LIB_PATH = os.path.join(_HERE, "_zkstark_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_u64p = ctypes.POINTER(ctypes.c_uint64)


def _build() -> Optional[str]:
    """Compile the shared library if needed.  Returns the path or None."""
    if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    tmp = _LIB_PATH + ".tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-fno-exceptions", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, _LIB_PATH)
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("ZKSTARK_NO_NATIVE"):
            _build_failed = True
            return None
        path = _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            # Stale cache from another platform/arch: rebuild once, then
            # degrade to the pure-python path rather than crash.
            try:
                os.remove(path)
            except OSError:
                pass
            path = _build()
            try:
                lib = ctypes.CDLL(path) if path else None
            except OSError:
                lib = None
            if lib is None:
                _build_failed = True
                return None
        lib.zk_blake3.argtypes = [_u8p, ctypes.c_uint64, _u8p]
        lib.zk_blake3_merge.argtypes = [_u8p, _u8p, _u8p]
        lib.zk_blake3_rows.argtypes = [_u8p, ctypes.c_uint64,
                                       ctypes.c_uint64, _u8p]
        lib.zk_merkle_level.argtypes = [_u8p, ctypes.c_uint64, _u8p]
        lib.zk_merkle_verify.argtypes = [_u8p, ctypes.c_uint64, _u8p,
                                         ctypes.c_uint32, _u8p]
        lib.zk_merkle_verify.restype = ctypes.c_int
        for name in ("zk_f128_add_arrays", "zk_f128_sub_arrays",
                     "zk_f128_mul_arrays"):
            getattr(lib, name).argtypes = [_u64p, _u64p, _u64p,
                                           ctypes.c_uint64]
        lib.zk_f128_inv_arrays.argtypes = [_u64p, _u64p, ctypes.c_uint64]
        lib.zk_f128_pow_arrays.argtypes = [_u64p, _u64p, _u64p,
                                           ctypes.c_uint64]
        lib.zk_f128_poly_eval.argtypes = [_u64p, ctypes.c_uint64, _u64p,
                                          _u64p]
        lib.zk_mimc_cipher.argtypes = [_u64p, _u64p, _u64p, _u64p]
        lib.zk_mimc_hash_state.argtypes = [_u64p, ctypes.c_uint64, _u64p,
                                           _u32p, _u64p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Blake3 / Merkle
# ---------------------------------------------------------------------------


def blake3(data: bytes) -> bytes:
    lib = _load()
    assert lib is not None
    out = (ctypes.c_uint8 * 32)()
    buf = (ctypes.c_uint8 * max(len(data), 1)).from_buffer_copy(
        data or b"\x00")
    lib.zk_blake3(buf, len(data), out)
    return bytes(out)


def blake3_merge(a: bytes, b: bytes) -> bytes:
    lib = _load()
    assert lib is not None
    out = (ctypes.c_uint8 * 32)()
    ab = (ctypes.c_uint8 * 32).from_buffer_copy(a)
    bb = (ctypes.c_uint8 * 32).from_buffer_copy(b)
    lib.zk_blake3_merge(ab, bb, out)
    return bytes(out)


def blake3_rows(rows: np.ndarray) -> np.ndarray:
    """Hash each row of a (N, row_bytes) uint8 array -> (N, 32) uint8."""
    lib = _load()
    assert lib is not None
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n, rb = rows.shape
    out = np.empty((n, 32), dtype=np.uint8)
    lib.zk_blake3_rows(rows.ctypes.data_as(_u8p), n, rb,
                       out.ctypes.data_as(_u8p))
    return out


def merkle_verify(leaf: bytes, index: int, path: Sequence[bytes],
                  root: bytes) -> bool:
    lib = _load()
    assert lib is not None
    depth = len(path)
    pbuf = np.frombuffer(b"".join(path) or b"\x00", dtype=np.uint8)
    lb = (ctypes.c_uint8 * 32).from_buffer_copy(leaf)
    rb = (ctypes.c_uint8 * 32).from_buffer_copy(root)
    return bool(lib.zk_merkle_verify(lb, index, pbuf.ctypes.data_as(_u8p),
                                     depth, rb))


# ---------------------------------------------------------------------------
# f128 (elements as python ints; arrays as (N,2) uint64 LE lo/hi)
# ---------------------------------------------------------------------------


def _pack(xs: Sequence[int]) -> np.ndarray:
    arr = np.empty((len(xs), 2), dtype=np.uint64)
    for i, x in enumerate(xs):
        x = int(x)
        arr[i, 0] = x & 0xFFFFFFFFFFFFFFFF
        arr[i, 1] = x >> 64
    return arr


def _unpack(arr: np.ndarray) -> List[int]:
    return [int(arr[i, 0]) | (int(arr[i, 1]) << 64)
            for i in range(arr.shape[0])]


def _binop(name: str, a: Sequence[int], b: Sequence[int]) -> List[int]:
    lib = _load()
    assert lib is not None
    pa, pb = _pack(a), _pack(b)
    out = np.empty_like(pa)
    getattr(lib, name)(pa.ctypes.data_as(_u64p), pb.ctypes.data_as(_u64p),
                       out.ctypes.data_as(_u64p), len(a))
    return _unpack(out)


def f128_add(a: Sequence[int], b: Sequence[int]) -> List[int]:
    return _binop("zk_f128_add_arrays", a, b)


def f128_sub(a: Sequence[int], b: Sequence[int]) -> List[int]:
    return _binop("zk_f128_sub_arrays", a, b)


def f128_mul(a: Sequence[int], b: Sequence[int]) -> List[int]:
    return _binop("zk_f128_mul_arrays", a, b)


def f128_inv(a: Sequence[int]) -> List[int]:
    lib = _load()
    assert lib is not None
    pa = _pack(a)
    out = np.empty_like(pa)
    lib.zk_f128_inv_arrays(pa.ctypes.data_as(_u64p),
                           out.ctypes.data_as(_u64p), len(a))
    return _unpack(out)


def f128_poly_eval(coeffs: Sequence[int], x: int) -> int:
    lib = _load()
    assert lib is not None
    pc, px = _pack(coeffs), _pack([x])
    out = np.empty((1, 2), dtype=np.uint64)
    lib.zk_f128_poly_eval(pc.ctypes.data_as(_u64p), len(coeffs),
                          px.ctypes.data_as(_u64p),
                          out.ctypes.data_as(_u64p))
    return _unpack(out)[0]


def mimc_cipher(inp: int, rc: int, z: int) -> int:
    lib = _load()
    assert lib is not None
    pi, pr, pz = _pack([inp]), _pack([rc]), _pack([z])
    out = np.empty((1, 2), dtype=np.uint64)
    lib.zk_mimc_cipher(pi.ctypes.data_as(_u64p), pr.ctypes.data_as(_u64p),
                       pz.ctypes.data_as(_u64p), out.ctypes.data_as(_u64p))
    return _unpack(out)[0]


def mimc_hash_state(cells: Sequence[int], rcs: Sequence[int],
                    rc_indices: Sequence[int]) -> int:
    lib = _load()
    assert lib is not None
    pc, pr = _pack(cells), _pack(rcs)
    idx = np.asarray(rc_indices, dtype=np.uint32)
    out = np.empty((1, 2), dtype=np.uint64)
    lib.zk_mimc_hash_state(pc.ctypes.data_as(_u64p), len(cells),
                           pr.ctypes.data_as(_u64p),
                           idx.ctypes.data_as(_u32p),
                           out.ctypes.data_as(_u64p))
    return _unpack(out)[0]
