"""Execution trace container — the witness matrix.

TPU-native analog of winterfell's `TraceTable<Felt>` (built by the reference
at `src/training/prover.rs:213`, `src/aggregation/prover.rs:157-160`): the
trace is stored column-major as one uint32 limb array of shape
(8, width, length) so the whole-trace interpolation + LDE is a single batched
NTT call and per-row leaf hashing is a single reshape.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import f128


class TraceTable:
    """Column-major trace of f128 elements.

    data: (8, width, length) uint32 limbs (red128 lazy representation).
    """

    def __init__(self, data: jnp.ndarray):
        assert data.ndim == 3 and data.shape[0] == f128.NUM_LIMBS
        n = data.shape[2]
        assert n & (n - 1) == 0, "trace length must be a power of two"
        self.data = data

    @classmethod
    def from_columns(cls, columns: Sequence[Sequence[int]]) -> "TraceTable":
        """Build from python-int columns (each of equal power-of-two length)."""
        arr = np.asarray(columns, dtype=object)  # (W, n)
        return cls(f128.from_ints(arr))

    @classmethod
    def from_rows(cls, rows: Sequence[Sequence[int]]) -> "TraceTable":
        arr = np.asarray(rows, dtype=object).T  # (W, n)
        return cls(f128.from_ints(arr))

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def length(self) -> int:
        return self.data.shape[2]

    def get(self, col: int, step: int) -> int:
        """Host read of one cell as a canonical python int (like
        `TraceTable::get`, used for public-input extraction at
        `src/training/prover.rs:245-246`)."""
        return int(f128.to_ints(self.data[:, col, step]))

    def get_row(self, step: int) -> List[int]:
        return list(f128.to_ints(self.data[:, :, step]))

    def get_column(self, col: int) -> List[int]:
        return list(f128.to_ints(self.data[:, col, :]))
