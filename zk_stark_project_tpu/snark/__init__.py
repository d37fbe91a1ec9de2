"""SNARK (ZoKrates/Groth16) comparison pipeline — SURVEY.md §1/L7: circuit
emitters, witness generators, and the gated zokrates CLI harness whose
export step produces the Groth16 BN254 Solidity verifiers."""

from .circuits import aggregator_circuit, training_circuit, write_circuits
from .harness import SnarkUnavailable, run_snark_pipeline
from .witness import aggregator_witness, args_parser, training_witness

__all__ = [
    "aggregator_circuit", "training_circuit", "write_circuits",
    "SnarkUnavailable", "run_snark_pipeline",
    "aggregator_witness", "args_parser", "training_witness",
]
