"""zk_stark_project_tpu — a TPU-native zk-STARK proving framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
Winterfell-based `FireMines/zk_stark_project` reference: f128 field arithmetic
on 32-bit TPU lanes, NTT/LDE, Blake3 Merkle commitments, AIR constraint
evaluation, DEEP composition, FRI, and the two reference statements (masked
SGD training-update AIR and signed fixed-point federated-aggregation AIR),
plus the surrounding federated-learning simulation, CLI and benchmark
harnesses.

Reference parity citations use `file:line` into the reference repo
(`FireMines/zk_stark_project`).
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, process-wide.

    The limb-arithmetic graphs (f128 mul chains, blake3 rounds) are cheap to
    run but expensive to compile; without a persistent cache every process
    pays the full compile bill again (the headline bench lost ~10 minutes of
    warmup to this).  Opt out with ZKSTARK_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("ZKSTARK_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        # Default to an in-repo cache dir: /tmp dies with the sandbox, so a
        # cold driver session would re-pay every XLA/Mosaic compile (~3.6 min
        # at round 2).  The repo directory persists across sessions.
        #
        # The dir is suffixed with a host-CPU fingerprint: XLA:CPU AOT cache
        # entries bake in the compile machine's vector ISA, and loading an
        # entry from a beefier host SEGFAULTS (observed: avx512/amx entries
        # from a prior round's machine crashing `_fold` here).  Keying the
        # directory by CPU identity makes cross-machine reuse impossible
        # while keeping same-machine persistence.
        #
        # The flags line alone is NOT enough: hosts with identical flags can
        # still get different XLA target options (+prefer-no-gather, amx
        # scheduling variants keyed on the CPU *model*), and a same-key
        # stale entry is rejected at load (cpu_aot_loader errors all over
        # the round-3 MULTICHIP tail) — wasted time on every cold process.
        # So hash the full CPU identity (vendor/family/model/flags) plus
        # the jax+jaxlib versions.
        # Belt and braces: also key on the hostname.  Within one round the
        # builder/judge/driver may be DIFFERENT hosts sharing this
        # filesystem; XLA:CPU derives target features from CPUID directly,
        # which can differ even when /proc/cpuinfo text matches.  The CPU
        # dir is gitignored (never crosses rounds), so per-host keying
        # costs nothing and makes cross-host loads impossible.
        import hashlib
        import platform

        ident = [jax.__version__, platform.node()]
        try:
            import jaxlib

            ident.append(getattr(jaxlib, "__version__", "?"))
        except Exception:  # noqa: BLE001
            pass
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("vendor_id", "cpu family", "model",
                                        "stepping", "flags")):
                        ident.append(line.strip())
                    if line.strip() == "" and len(ident) > 2:
                        break  # first core only
        except OSError:
            pass
        tag = hashlib.sha256("\n".join(ident).encode()).hexdigest()[:12]
        default_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            f".jax_cache-{tag}")
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("ZKSTARK_COMPILE_CACHE",
                                         os.path.normpath(default_dir)))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


def use_tpu_compile_cache() -> None:
    """Re-point the persistent compile cache at the COMMITTED TPU dir.

    CPU cache entries bake in the compiling host's vector ISA (loading one
    on a different machine segfaults -- see `_enable_compile_cache`), so the
    default dir is host-fingerprinted and gitignored.  TPU executables are
    compiled for the *chip*, not the host, so they are host-portable: they
    live in `.jax_cache-tpu/` which IS committed, and a fresh sandbox
    starts warm instead of re-paying ~3.5 min of XLA/Mosaic compiles
    (round-2 bench tail: 217.9 s cold).

    Called automatically the first time a TPU hot path is selected
    (`ops/f128._pallas_backend_default`); safe to call repeatedly.
    """
    import os

    if (os.environ.get("ZKSTARK_NO_COMPILE_CACHE")
            or os.environ.get("ZKSTARK_COMPILE_CACHE")):
        return
    try:
        import jax

        tpu_dir = os.path.normpath(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            ".jax_cache-tpu"))
        if jax.config.jax_compilation_cache_dir == tpu_dir:
            return
        jax.config.update("jax_compilation_cache_dir", tpu_dir)
        # jax initializes the persistent cache lazily ONCE; if a compile
        # already happened under the fingerprinted dir, drop that handle so
        # subsequent compiles read/write the TPU dir.
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


_enable_compile_cache()
