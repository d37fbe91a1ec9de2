"""MiMC-e7 hash over f128 — JAX kernel + python-int oracle.

Port of the reference's Rust MiMC (`src/helper.rs:213-233`):

  mimc_cipher(input, rc, z): 64 rounds of  x <- (x + rc + z)^7 ; return x + z
  mimc_hash_matrix(w, b, rcs): sequential sponge over the 60 model cells,
      z <- mimc_cipher(cell, rcs[idx % 64], z), weights row-major then the
      row's bias interleaved per activation row.

Round constants are f64_to_felt(1..=64) = 1e6..64e6 (`src/helper.rs:404-406`)
— NOTE this is the *Rust/f128* variant; the BN254 variant used by the
ZoKrates/SNARK comparison pipeline lives in `ops/mimc_bn254.py`.

The chain is inherently sequential in rounds and cells; the TPU win is
*vectorizing across many independent hashes* (Merkle-style digest workloads),
which `mimc_cipher` supports by broadcasting over batch shapes.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from . import f128
from . import f128_ref as ref
from .signed import f64_to_felt

ROUNDS = 64


def round_constants_int() -> List[int]:
    """f64_to_felt(i) for i in 1..=64 (`src/helper.rs:404-406`)."""
    return [f64_to_felt(float(i)) for i in range(1, 65)]


def _pow7(x: jnp.ndarray) -> jnp.ndarray:
    if f128.use_pallas():
        from . import f128_pallas

        return f128_pallas.pow7(x)  # 4 muls fused in one VMEM pass
    # x^7 = x^4 * x^2 * x : 2 squarings + 2 muls
    x2 = f128.mul(x, x)
    x4 = f128.mul(x2, x2)
    return f128.mul(f128.mul(x4, x2), x)


def mimc_cipher(inp: jnp.ndarray, rc: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """64 rounds of x <- (x + rc + z)^7, then + z.  Broadcasts over batch.

    `src/helper.rs:213-220`.
    """
    rc_z = f128.add(rc, z)

    def body(_, x):
        return _pow7(f128.add(x, rc_z))

    out = jax.lax.fori_loop(0, ROUNDS, body, inp)
    return f128.add(out, z)


def mimc_hash_state(flat_state: jnp.ndarray, rc_indices: Sequence[int]) -> jnp.ndarray:
    """Sequential sponge over a flat list of cells with given rc indices.

    flat_state: (8, n_cells); rc_indices: python ints (static).
    Returns (8,) digest.
    """
    rcs = round_constants_int()
    z = f128.zeros(())
    for cell_idx, rc_idx in enumerate(rc_indices):
        rc = f128.from_int(rcs[rc_idx % ROUNDS])
        z = mimc_cipher(flat_state[:, cell_idx], rc, z)
    return z


def state_rc_indices(ac: int, fe: int) -> List[int]:
    """The rc index sequence of mimc_hash_matrix (`src/helper.rs:222-233`):
    for each activation row: fe weight cells with rc index j (col), then the
    bias cell with rc index i (row)."""
    idx = []
    for i in range(ac):
        idx.extend(range(fe))
        idx.append(i)
    return idx


def mimc_hash_matrix(w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Digest of a (ac, fe) weight matrix + (ac,) bias vector.

    w: (8, ac, fe) limbs; b: (8, ac) limbs.  Returns (8,) digest.
    `src/helper.rs:222-233`.
    """
    ac, fe = w.shape[1], w.shape[2]
    cells = jnp.concatenate(
        [w.reshape(8, ac, fe), b.reshape(8, ac, 1)], axis=2
    ).reshape(8, ac * (fe + 1))
    return mimc_hash_state(cells, state_rc_indices(ac, fe))


# ---------------------------------------------------------------------------
# Python-int oracle
# ---------------------------------------------------------------------------


def ref_mimc_cipher(inp: int, rc: int, z: int) -> int:
    x = inp % ref.P
    for _ in range(ROUNDS):
        x = pow((x + rc + z) % ref.P, 7, ref.P)
    return (x + z) % ref.P


def ref_mimc_hash_matrix(w: Sequence[Sequence[int]], b: Sequence[int]) -> int:
    rcs = round_constants_int()
    z = 0
    for i in range(len(w)):
        for j in range(len(w[i])):
            z = ref_mimc_cipher(w[i][j], rcs[j % ROUNDS], z)
        z = ref_mimc_cipher(b[i], rcs[i % ROUNDS], z)
    return z
