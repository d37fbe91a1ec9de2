"""Proof options — the STARK protocol parameters.

Mirrors winterfell's `ProofOptions::new(40, 16, 21, FieldExtension::None,
16, 7, BatchingMethod::Algebraic, BatchingMethod::Algebraic)` as used by the
reference everywhere (`src/main.rs:98-107`, `tests/integration_tests.rs:69-75`).
Positional meaning per winterfell 0.12 (the reference's inline comments at
`src/main.rs:99-104` are wrong — see SURVEY.md §1/L4): 40 queries, LDE blowup
16, 21 grinding bits, no field extension, FRI folding factor 16, FRI remainder
max degree 7, algebraic (powers-of-one-alpha) batching for both constraint
composition and DEEP.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ProofOptions:
    num_queries: int = 40
    blowup_factor: int = 16
    grinding_bits: int = 21
    fri_folding_factor: int = 16
    fri_remainder_max_degree: int = 7
    # "algebraic" = constraint/DEEP coefficients are powers of a single drawn
    # element (winterfell BatchingMethod::Algebraic); "linear" would draw one
    # element per constraint.
    batching: str = "algebraic"

    def __post_init__(self):
        assert self.blowup_factor & (self.blowup_factor - 1) == 0
        assert self.fri_folding_factor & (self.fri_folding_factor - 1) == 0
        assert (self.fri_remainder_max_degree + 1) & self.fri_remainder_max_degree == 0 or True
        assert self.num_queries > 0
        assert self.batching in ("algebraic", "linear")

    def to_bytes(self) -> bytes:
        """Serialize into the proof context (fixed 6-byte layout)."""
        return bytes([
            self.num_queries,
            self.blowup_factor,
            self.grinding_bits,
            self.fri_folding_factor,
            self.fri_remainder_max_degree,
            0 if self.batching == "algebraic" else 1,
        ])


#: The reference's proof options (`src/main.rs:98-107`).
REFERENCE_OPTIONS = ProofOptions()


def fast_options(num_queries: int = 12, blowup: int = 8,
                 grinding: int = 0) -> ProofOptions:
    """Lighter options for fast tests (fewer queries, no grinding)."""
    return ProofOptions(num_queries=num_queries, blowup_factor=blowup,
                        grinding_bits=grinding, fri_folding_factor=4,
                        fri_remainder_max_degree=7)
