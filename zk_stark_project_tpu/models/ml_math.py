"""ML-in-the-field math: 1-layer NN forward / MSE' / SGD backward over signed
fixed-point f128 pairs — the reference's `src/helper.rs` L1 layer, rebuilt as
batched JAX ops plus a python-int oracle.

Semantics are an exact port (same op order, since signed ops are not
associative in the encoding):

  * forward_propagation_layer (`src/helper.rs:282-327`): per activation j,
    left-fold sum_i mul(w[j,i], x[i]) from (0,+), then div by pr, then + b[j].
  * mse_prime (`src/helper.rs:245-270`): 2*(pred - y)/ac_f with
    ac_f = f64_to_felt(ac).
  * backward_propagation_layer (`src/helper.rs:345-401`):
    b -= err/lr;  w[j,i] -= ((err[j]*x[i])/lr)/pr.

Divisions are by *public* scalars (pr, lr, ac_f), so the JAX path uses
precomputed host-side inverses (`signed.div_by_inv`) — identical results,
no in-graph field inversions.

JAX value convention: a signed tensor is a pair of limb arrays
((8,) + shape, (8,) + shape) for (value, sign).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import f128
from ..ops import f128_ref as ref
from ..ops import signed
from ..ops.signed import f64_to_felt

# Reference model dimensions (`src/helper.rs:18-22`).
AC = 6
FE = 9
C = 8
#: flattened state cells: AC*FE weights + AC biases (`src/helper.rs:63`).
STATE_CELLS = AC * FE + AC

#: reference hyper-parameters (`src/main.rs:200-201`): lr = f64_to_felt(1e-4),
#: pr = f64_to_felt(1e6).
LR_INT = f64_to_felt(0.0001)
PR_INT = f64_to_felt(1e6)


def _inv_int(x: int) -> int:
    return ref.inv(x % ref.P)


class Pair(tuple):
    """Tiny (value, sign) convenience wrapper."""
    def __new__(cls, v, s):
        return super().__new__(cls, (v, s))


# ---------------------------------------------------------------------------
# JAX path (batched over arbitrary leading shapes)
# ---------------------------------------------------------------------------


def forward_layer(w, ws, b, bs, x, xs, pr_int: int):
    """w: (8,...,AC,FE); b: (8,...,AC); x: (8,...,FE).  Returns (out, out_s)
    of shape (8,...,AC).  `src/helper.rs:282-327`."""
    ac = b.shape[-1]
    fe = x.shape[-1]
    # left-fold over features, vectorized over activations
    t = f128.zeros(w.shape[1:-1])   # (..., AC)
    t_s = f128.zeros(w.shape[1:-1])
    for i in range(fe):
        p, p_s = signed.mul(w[..., i], ws[..., i],
                            x[..., i:i + 1], xs[..., i:i + 1])
        t, t_s = signed.add(t, t_s, p, p_s)
    pr_inv = f128.full(t.shape[1:], _inv_int(pr_int))
    q, q_s = signed.div_by_inv(t, t_s, pr_inv, f128.zeros(t.shape[1:]))
    return signed.add(q, q_s, b, bs)


def mse_prime(y, out, out_s, ac: int):
    """2*(out - y)/ac_f per activation.  `src/helper.rs:245-270`."""
    shape = out.shape[1:]
    zero = f128.zeros(shape)
    d, d_s = signed.sub(out, out_s, y, zero)
    two = f128.full(shape, f64_to_felt(2.0))
    n, n_s = signed.mul(d, d_s, two, zero)
    acf_inv = f128.full(shape, _inv_int(f64_to_felt(float(ac))))
    return signed.div_by_inv(n, n_s, acf_inv, zero)


def backward_layer(w, ws, b, bs, x, xs, err, err_s,
                   lr_int: int, pr_int: int):
    """SGD update; returns (w', ws', b', bs').  `src/helper.rs:345-401`."""
    lr_inv_b = f128.full(b.shape[1:], _inv_int(lr_int))
    zero_b = f128.zeros(b.shape[1:])
    t, t_s = signed.div_by_inv(err, err_s, lr_inv_b, zero_b)
    b2, bs2 = signed.sub(b, bs, t, t_s)

    # outer product err[j] * x[i] over (..., AC, FE)
    e_v, e_s = err[..., :, None], err_s[..., :, None]
    x_v, x_s = x[..., None, :], xs[..., None, :]
    p, p_s = signed.mul(e_v, e_s, x_v, x_s)
    zero_w = f128.zeros(p.shape[1:])
    lr_inv_w = f128.full(p.shape[1:], _inv_int(lr_int))
    pr_inv_w = f128.full(p.shape[1:], _inv_int(pr_int))
    t1, t1_s = signed.div_by_inv(p, p_s, lr_inv_w, zero_w)
    g, g_s = signed.div_by_inv(t1, t1_s, pr_inv_w, zero_w)
    w2, ws2 = signed.sub(w, ws, g, g_s)
    return w2, ws2, b2, bs2


def sgd_step(w, ws, b, bs, x, xs, y, lr_int: int, pr_int: int):
    """One full forward -> mse' -> backward step (one trace row of the
    training statement, `src/training/prover.rs:150-170`)."""
    out, out_s = forward_layer(w, ws, b, bs, x, xs, pr_int)
    err, err_s = mse_prime(y, out, out_s, b.shape[-1])
    return backward_layer(w, ws, b, bs, x, xs, err, err_s, lr_int, pr_int)


# ---------------------------------------------------------------------------
# Python-int oracle (tests + host-side witness cross-checks)
# ---------------------------------------------------------------------------


def ref_forward(w, ws, b, bs, x, xs, pr: int):
    ac, fe = len(b), len(x)
    out, out_s = [0] * ac, [0] * ac
    for j in range(ac):
        t, t_s = 0, 0
        for i in range(fe):
            p, p_s = signed.ref_mul(w[j][i], ws[j][i], x[i], xs[i])
            t, t_s = signed.ref_add(t, t_s, p, p_s)
        q, q_s = signed.ref_div(t, t_s, pr, 0)
        out[j], out_s[j] = signed.ref_add(q, q_s, b[j], bs[j])
    return out, out_s


def ref_mse_prime(y, out, out_s, ac: int):
    r, r_s = [0] * ac, [0] * ac
    acf = f64_to_felt(float(ac))
    for j in range(ac):
        d, d_s = signed.ref_sub(out[j], out_s[j], y[j], 0)
        n, n_s = signed.ref_mul(d, d_s, f64_to_felt(2.0), 0)
        r[j], r_s[j] = signed.ref_div(n, n_s, acf, 0)
    return r, r_s


def ref_backward(w, ws, b, bs, x, xs, err, err_s, lr: int, pr: int):
    ac, fe = len(b), len(x)
    w2 = [row[:] for row in w]
    ws2 = [row[:] for row in ws]
    b2, bs2 = list(b), list(bs)
    for j in range(ac):
        t, t_s = signed.ref_div(err[j], err_s[j], lr, 0)
        b2[j], bs2[j] = signed.ref_sub(b[j], bs[j], t, t_s)
    for i in range(fe):
        for j in range(ac):
            p, p_s = signed.ref_mul(err[j], err_s[j], x[i], xs[i])
            t, t_s = signed.ref_div(p, p_s, lr, 0)
            g, g_s = signed.ref_div(t, t_s, pr, 0)
            w2[j][i], ws2[j][i] = signed.ref_sub(w[j][i], ws[j][i], g, g_s)
    return w2, ws2, b2, bs2


def ref_sgd_step(w, ws, b, bs, x, xs, y, lr: int, pr: int):
    out, out_s = ref_forward(w, ws, b, bs, x, xs, pr)
    err, err_s = ref_mse_prime(y, out, out_s, len(b))
    return ref_backward(w, ws, b, bs, x, xs, err, err_s, lr, pr)


# ---------------------------------------------------------------------------
# Encoding / state layout helpers (`src/helper.rs:104-211`)
# ---------------------------------------------------------------------------


def label_to_one_hot(label: float, ac: int, precision: float) -> List[int]:
    """`src/helper.rs:150-162`: one-hot with value f64_to_signed(precision);
    idx 0 for label < 1 else label-1.  Returns ac canonical ints (signs are
    all 0 for positive precision)."""
    v = [0] * ac
    idx = 0 if label < 1.0 else max(int(label) - 1, 0)
    if idx < ac:
        val, _ = signed.f64_to_signed_felt(precision, 1.0)
        v[idx] = val
    return v


def flatten_state_interleaved(w, ws, b, bs) -> List[int]:
    """[v0,s0,v1,s1,...] weights row-major then biases
    (`src/training/prover.rs:104-115`)."""
    flat = []
    for row, srow in zip(w, ws):
        for v, s in zip(row, srow):
            flat.extend((v, s))
    for v, s in zip(b, bs):
        flat.extend((v, s))
    return flat


def split_state_with_sign(row: Sequence[int], ac: int, fe: int):
    """Inverse of flatten_state_interleaved (`src/helper.rs:165-194`)."""
    assert len(row) == 2 * ac * (fe + 1)
    w = [[row[2 * (j * fe + i)] for i in range(fe)] for j in range(ac)]
    ws = [[row[2 * (j * fe + i) + 1] for i in range(fe)] for j in range(ac)]
    b = [row[2 * (ac * fe + j)] for j in range(ac)]
    bs = [row[2 * (ac * fe + j) + 1] for j in range(ac)]
    return w, b, ws, bs


def flatten_state(w, b) -> List[int]:
    """[w row-major..., b...] without signs
    (`src/aggregation/prover.rs:39-46`)."""
    out = []
    for row in w:
        out.extend(row)
    out.extend(b)
    return out


def unflatten_state(state: Sequence[int], ac: int, fe: int):
    w = [list(state[i * fe:(i + 1) * fe]) for i in range(ac)]
    b = list(state[ac * fe:ac * fe + ac])
    return w, b


def generate_initial_model(fe: int, ac: int, sigma: float,
                           rng: np.random.Generator):
    """Normal(0, sigma) init, signed-encoded (`src/helper.rs:108-131`).
    RNG is injectable (SURVEY.md pin #4)."""
    w, ws = [], []
    b, bs = [], []
    for _ in range(ac):
        row, srow = [], []
        for _ in range(fe):
            v, s = signed.f64_to_signed_felt(float(rng.normal(0.0, sigma)), 1e6)
            row.append(v)
            srow.append(s)
        w.append(row)
        ws.append(srow)
        v, s = signed.f64_to_signed_felt(float(rng.normal(0.0, sigma)), 1e6)
        b.append(v)
        bs.append(s)
    return w, ws, b, bs
