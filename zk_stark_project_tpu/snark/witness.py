"""SNARK witness generation — the numpy plaintext SGD that computes the
expected new model + MiMC digests for the ZoKrates circuits (reference
`verification/time_memory_analytics/analyze.py:235-259` and
`aggregator/analyze.py:96-181`).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..ops.mimc_bn254 import convert_matrix, mimc_hash


def mse_prime_int(y_true: np.ndarray, y_pred: np.ndarray) -> np.ndarray:
    return 2 * (y_pred - y_true) // y_true.size


def training_witness(batch: int, fe: int = 9, ac: int = 6,
                     precision: int = 1000, lr: int = 10,
                     seed: int = 0) -> List[str]:
    """Seeded synthetic training witness (`analyze.py:235-259`): integer
    SGD over `batch` samples, returning the flat zokrates argument list."""
    # Quirks kept for faithfulness to the reference witness generator
    # (`analyze.py:235-259`): the SGD loop iterates over the FIELD-ENCODED
    # sample matrix (X is overwritten by convert_matrix before the loop),
    # and `gdigest` is the INITIAL model's hash even though the circuit's
    # `gobal_hash_check` (root.zok) compares against the post-training
    # model — the reference benchmarks witness/proof generation and never
    # checks the circuit's boolean output.
    rng = np.random.RandomState(seed)
    bias = (rng.randn(ac) * precision).astype(int)
    weights = (rng.randn(ac, fe) * precision).astype(int)
    w, w_sign = convert_matrix(weights)
    b, b_sign = convert_matrix(bias)
    x = (rng.randn(batch, fe) * precision).astype(int)
    x, x_sign = convert_matrix(x)
    labels = []
    w_curr = weights.astype(object).copy()
    b_curr = bias.astype(object).copy()
    for xi in x:
        lbl = int(rng.randint(1, ac))
        labels.append(lbl)
        y_true = np.zeros(ac, dtype=int)
        y_true[lbl - 1] = precision
        out = (w_curr.dot(xi) // precision) + b_curr
        err = mse_prime_int(y_true, out)
        w_curr = w_curr - ((np.outer(err, xi) // precision) // lr)
        b_curr = b_curr - np.asarray([e // lr for e in err], dtype=object)
    new_w, _ = convert_matrix(np.array(w_curr, dtype=object))
    new_b, _ = convert_matrix(np.array(b_curr, dtype=object))
    ldigest = mimc_hash(new_w, new_b)
    gdigest = mimc_hash(w, b)
    return args_parser([w, w_sign, b, b_sign, x, x_sign, labels,
                        lr, precision, new_w, new_b, ldigest, gdigest])


def aggregator_witness(c: int = 8, fe: int = 9, ac: int = 6,
                       precision: int = 1000, seed: int = 0) -> List[str]:
    """Seeded synthetic aggregation witness (`aggregator/analyze.py:96-181`):
    FedAvg over c client models, digests, flat argument list."""
    rng = np.random.RandomState(seed)
    global_w_raw = (rng.randn(ac, fe) * precision).astype(int)
    global_b_raw = (rng.randn(ac) * precision).astype(int)
    local_w_raw = [(rng.randn(ac, fe) * precision).astype(int)
                   for _ in range(c)]
    local_b_raw = [(rng.randn(ac) * precision).astype(int)
                   for _ in range(c)]
    # FedAvg (int-truncating), like the circuit's update_global chain
    new_w = global_w_raw.astype(object).copy()
    new_b = global_b_raw.astype(object).copy()
    for lw, lb in zip(local_w_raw, local_b_raw):
        new_w = global_w_raw + (lw - global_w_raw) // c
        new_b = global_b_raw + (lb - global_b_raw) // c
    gw, gw_s = convert_matrix(global_w_raw)
    gb, gb_s = convert_matrix(global_b_raw)
    lw_enc = [convert_matrix(lw) for lw in local_w_raw]
    lb_enc = [convert_matrix(lb) for lb in local_b_raw]
    ew, ew_s = convert_matrix(np.array(new_w, dtype=object))
    eb, eb_s = convert_matrix(np.array(new_b, dtype=object))
    lhashes = [mimc_hash(lw, lb) for (lw, _), (lb, _) in zip(lw_enc, lb_enc)]
    gdigest = mimc_hash(ew, eb)
    return args_parser([
        [v for v, _ in lw_enc], [s for _, s in lw_enc],
        [v for v, _ in lb_enc], [s for _, s in lb_enc],
        gw, gw_s, gb, gb_s, lhashes, ew, ew_s, eb, eb_s, gdigest])


def args_parser(args) -> List[str]:
    """Flatten nested values into zokrates CLI string arguments."""
    out: List[str] = []
    for arg in args:
        if isinstance(arg, (list, tuple, np.ndarray)):
            out.extend(args_parser(list(arg)))
        else:
            out.append(str(int(arg)))
    return out
