"""AOT warm-start cache — serialized `jax.export` artifacts for the hot
executables.

Why this exists: with the persistent *compile* cache fully primed, a cold
process still pays ~35 s of Python tracing + ~16 s of StableHLO lowering
before the first proof (measured on the aggregation statement alone —
the limb-decomposed field arithmetic makes the jaxprs enormous).  The
reference's Rust binary has no such cost; its equivalent is `cargo build`.
This module is the TPU-native answer: the traced+lowered module for each
hot executable is serialized once (`jax.export`, zlib-compressed) into a
COMMITTED directory (`.jax_aot/`), so a fresh sandbox deserializes the
StableHLO (~1 s) instead of re-tracing, and the persistent compile cache
(`.jax_cache-tpu/`, also committed) supplies the compiled TPU executable.

Correctness guard: artifact keys include a hash of the SOURCE of every
compute-path module plus the jax version, arg shapes/dtypes and the
wrapped config — any code change invalidates the artifact and the next
TPU run silently re-exports.  A stale artifact can therefore never serve
a different computation than the live code.

Scope: active only on the TPU backend (`enabled()`); CPU/test runs always
trace live code.  Opt out with ZKSTARK_NO_AOT=1.
"""

from __future__ import annotations

import functools
import hashlib
import os
import zlib
from typing import Callable

import jax

AOT_DIR = os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_aot"))


def enabled() -> bool:
    if os.environ.get("ZKSTARK_NO_AOT") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


@functools.lru_cache(maxsize=None)
def _source_fingerprint() -> str:
    """Hash of every compute-path module's source + the jax version.

    Includes every module whose *Python-computed values* end up baked into
    the traced graphs — notably `ops/f128_ref` (field modulus, roots of
    unity, coset offsets: host-side python ints embedded as constants by
    phases.py/fused.py) and the prover drivers that compute trace-time
    statics (stark/batch/channel/proof).
    """
    import inspect

    from ..models import aggregation, ml_math, training, training_v2
    from ..ops import blake3, f128, f128_pallas, f128_ref, merkle, mimc, ntt
    from ..ops import pow_pallas, signed
    from . import batch, channel, device_coin, fri, fused, phases, poly
    from . import proof as proof_mod
    from . import stark

    h = hashlib.sha256()
    for mod in (blake3, f128, f128_pallas, f128_ref, merkle, mimc, ntt,
                pow_pallas, signed, batch, channel, device_coin, fri, fused,
                phases, poly, proof_mod, stark, aggregation, ml_math,
                training, training_v2):
        try:
            h.update(inspect.getsource(mod).encode())
        except (OSError, TypeError):
            h.update(b"<no source>")
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


def _digest(name: str, static_key, args) -> str:
    shapes = jax.tree.map(
        lambda a: (tuple(a.shape), str(a.dtype)) if hasattr(a, "shape")
        else ("py", repr(a)), args)
    try:
        env = (jax.default_backend(), jax.device_count())
    except Exception:  # noqa: BLE001
        env = ("unknown", 0)
    blob = repr((name, static_key, shapes, env,
                 _source_fingerprint())).encode()
    return hashlib.sha256(blob).hexdigest()[:20]


@functools.lru_cache(maxsize=None)
def _resolve_cached(name: str, digest: str):
    """Holder for the per-(name, arg-shape) resolved callable."""
    return {}


def call(name: str, static_key, fn: Callable, *args):
    """Run `fn(*args)` through the AOT artifact cache.

    `fn` must be a jit-wrapped callable whose graph depends only on
    `static_key` and the shapes/dtypes of `args`.  On the TPU backend the
    first call per (name, shapes) either deserializes a committed artifact
    (skipping trace+lower entirely) or exports the live function and saves
    the artifact for the next sandbox.  Elsewhere it is `fn(*args)`.
    """
    if not enabled():
        return fn(*args)
    digest = _digest(name, static_key, args)
    slot = _resolve_cached(name, digest)
    if "call" not in slot:
        path = os.path.join(AOT_DIR, f"{name}-{digest}.jaxexp")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(zlib.decompress(f.read()))
                loaded = jax.jit(exp.call)
                # First execution validates the artifact end-to-end: a
                # deserialize that succeeds can still fail at compile/run
                # time (platform or topology drift not covered by the
                # digest); fall back to the live trace instead of turning
                # a cache problem into a cold-start crash.
                out = loaded(*args)
                slot["call"] = loaded
                return out
            except Exception:  # noqa: BLE001 - fall back to live trace
                pass
        try:
            exp = jax.export.export(fn)(*args)
            os.makedirs(AOT_DIR, exist_ok=True)
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(zlib.compress(exp.serialize(), 6))
            os.replace(tmp, path)
            # run through the exported call so the persistent compile
            # cache entry matches what the next sandbox will execute
            loaded = jax.jit(exp.call)
        except Exception:  # noqa: BLE001 - AOT is an optimization only
            loaded = fn
        slot["call"] = loaded
    return slot["call"](*args)
