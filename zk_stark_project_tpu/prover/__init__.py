"""STARK prover engine: the TPU-native replacement for the winterfell
pipeline the reference depends on (SURVEY.md §1/L4)."""

from .air import Air, Assertion
from .options import ProofOptions, REFERENCE_OPTIONS, fast_options
from .proof import MerkleOpening, Proof
from .stark import prove
from .trace import TraceTable

__all__ = [
    "Air", "Assertion", "ProofOptions", "REFERENCE_OPTIONS", "fast_options",
    "MerkleOpening", "Proof", "prove", "TraceTable",
]
