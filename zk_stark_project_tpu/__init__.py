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
