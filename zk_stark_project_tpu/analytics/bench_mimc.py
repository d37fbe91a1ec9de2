"""MiMC microbenchmark — criterion-equivalent of `benches/bench_mimc.rs`:

  * bench_mimc_cipher: single-cell 64-round x^7 chain, seeded random inputs
    (`bench_mimc.rs:17-34`);
  * bench_mimc_hash: 6x9 matrix + bias digest (`bench_mimc.rs:39-57`);
  * plus the TPU-native headline: *batched* cipher throughput (the chain is
    sequential; the TPU win is hashing many cells at once — SURVEY.md §7).

Run: python -m zk_stark_project_tpu.analytics.bench_mimc [--batch 4096]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _bench(fn, warmup: int = 2, iters: int = 10) -> float:
    for _ in range(warmup):
        fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args(argv)

    import jax

    from ..models.ml_math import AC, FE
    from ..ops import f128, mimc

    # seeded inputs (the reference uses StdRng from [24u8;32],
    # `bench_mimc.rs:5,19`)
    rng = np.random.default_rng(24)

    inp = f128.from_ints(np.asarray(int(rng.integers(0, 2 ** 63))))
    rc = f128.from_int(1_000_000)
    z = f128.zeros(())
    t_cipher = _bench(
        lambda: jax.block_until_ready(mimc.mimc_cipher(inp, rc, z)),
        iters=args.iters)

    w = f128.from_ints(np.asarray(
        rng.integers(0, 2 ** 62, size=(AC, FE)), dtype=object))
    b = f128.from_ints(np.asarray(
        rng.integers(0, 2 ** 62, size=(AC,)), dtype=object))
    t_hash = _bench(
        lambda: jax.block_until_ready(mimc.mimc_hash_matrix(w, b)),
        iters=max(1, args.iters // 2))

    batch = f128.from_ints(np.asarray(
        rng.integers(0, 2 ** 62, size=args.batch), dtype=object))
    rc_b = f128.full((args.batch,), 1_000_000)
    z_b = f128.zeros((args.batch,))
    t_batched = _bench(
        lambda: jax.block_until_ready(mimc.mimc_cipher(batch, rc_b, z_b)),
        iters=args.iters)

    out = {
        "mimc_cipher_us": round(t_cipher * 1e6, 1),
        "mimc_hash_6x9_ms": round(t_hash * 1e3, 2),
        "mimc_cipher_batched_per_cell_ns":
            round(t_batched / args.batch * 1e9, 1),
        "batched_ciphers_per_sec": round(args.batch / t_batched),
        "batch": args.batch,
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
