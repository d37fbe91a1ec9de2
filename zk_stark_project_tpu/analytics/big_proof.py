"""The 2^20-row north-star proof — one REAL training statement at the
BASELINE trace length, proved end-to-end on one chip and verified.

trace_len = next_pow2(120*bs) = 2^20 at bs = 8738
(`src/training/prover.rs:65`); 240 columns -> an 8 GB trace and a 129 GB
blowup-16 LDE, far past HBM — proved with the streaming prover
(`prover/big.py`).  Records wall-clock per phase and peak device memory.

    python -m zk_stark_project_tpu.analytics.big_proof [--bs 8738]
        [--queries N --blowup N --grinding N]   # smaller dry runs
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8738)
    ap.add_argument("--queries", type=int, default=None)
    ap.add_argument("--blowup", type=int, default=None)
    ap.add_argument("--grinding", type=int, default=None)
    ap.add_argument("--col-block", type=int, default=32)
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--air", default="v1", choices=["v1", "v2"],
                    help="v1 = reference-parity inert AIR (boundary-only "
                         "streamed composition); v2 = sound SGD AIR "
                         "(per-coset streamed transition constraints)")
    args = ap.parse_args(argv)

    import numpy as np

    from ..models import ml_math
    from ..models.ml_math import AC, FE
    from ..models.training import TrainingUpdateProver, trace_length_for
    from ..ops.signed import f64_to_felt
    from ..prover.big import prove_big
    from ..prover.options import REFERENCE_OPTIONS, ProofOptions
    from ..verifier import verify

    opts = REFERENCE_OPTIONS
    if args.queries or args.blowup or args.grinding is not None:
        opts = ProofOptions(
            num_queries=args.queries or opts.num_queries,
            blowup_factor=args.blowup or opts.blowup_factor,
            grinding_bits=(args.grinding if args.grinding is not None
                           else opts.grinding_bits),
            fri_folding_factor=opts.fri_folding_factor,
            fri_remainder_max_degree=opts.fri_remainder_max_degree)
    bs = args.bs
    n = trace_length_for(bs)
    print(f"bs={bs} -> trace 240 x {n} (2^{n.bit_length() - 1}), "
          f"options {opts}", flush=True)

    rng = np.random.default_rng(0)
    w, ws, b, bsn = ml_math.generate_initial_model(FE, AC, 1.0, rng)
    x = [[f64_to_felt(float(v)) for v in rng.normal(0, 1.0, FE)]
         for _ in range(bs)]
    xs = [[0] * FE for _ in range(bs)]
    y = [ml_math.label_to_one_hot(float(rng.integers(1, AC + 1)), AC, 1e6)
         for _ in range(bs)]

    t0 = time.perf_counter()
    if args.air == "v2":
        from ..models.training_v2 import (TrainingUpdateV2Prover,
                                          build_polys_streamed_v2,
                                          signed_pair_to_natural)

        state = [signed_pair_to_natural(w[j][i], ws[j][i])
                 for j in range(AC) for i in range(FE)]
        state += [signed_pair_to_natural(b[j], bsn[j]) for j in range(AC)]
        prover = TrainingUpdateV2Prover(opts, state, x, y,
                                        f64_to_felt(0.0001),
                                        f64_to_felt(1e6), bs, rng=rng)
        polys = build_polys_streamed_v2(prover)
    else:
        prover = TrainingUpdateProver(opts, w, b, ws, bsn, x, xs, y,
                                      f64_to_felt(0.0001),
                                      f64_to_felt(1e6), bs, rng=rng)

        from ..models.training import build_polys_streamed

        # block-streamed build: trace + masks + iNTT temps never coexist
        # (the standard build OOMs 16 GB HBM at 2^20 rows); also computes
        # the boundary rows so air() below needs no trace
        polys = build_polys_streamed(prover)
    t_trace = time.perf_counter() - t0
    print(f"trace polys built (streamed): {t_trace:.1f}s", flush=True)
    air = prover.air()

    def say(msg):
        print(f"  [prove] {msg}", flush=True)

    t1 = time.perf_counter()
    proof = prove_big(air, col_block=args.col_block, progress=say,
                      polys=polys)
    t_prove = time.perf_counter() - t1

    mem = None
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        mem = stats.get("peak_bytes_in_use")
    except Exception:  # noqa: BLE001
        pass

    t2 = time.perf_counter()
    if not args.skip_verify:
        verify(air, proof)
    t_verify = time.perf_counter() - t2

    print(json.dumps({
        "metric": "training_proof_2e20",
        "air": args.air,
        "trace_rows": n, "bs": bs,
        "trace_build_seconds": round(t_trace, 2),
        "prove_seconds": round(t_prove, 2),
        "verify_seconds": round(t_verify, 2),
        "proof_bytes": proof.size_bytes,
        "peak_hbm_bytes": mem,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
