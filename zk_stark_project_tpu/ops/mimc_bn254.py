"""MiMC-e7 over the BN254 (alt_bn128) scalar field — the *SNARK-side*
variant of the hash.

The framework has two MiMC flavors (SURVEY.md pin #6):
  * `ops/mimc.py` — f128 field, round constants f64_to_felt(1..=64); used by
    the STARK aggregation digest (`src/helper.rs:213-233,404-406`).
  * this module — BN254 scalar field, the explicit 64-constant table shared
    byte-for-byte by the reference's python (`devices/middleware/hash.py:3-68`)
    and its ZoKrates circuits (`verification/zokrates/root.zok:206-219`);
    used only by the SNARK-comparison pipeline.

The constant table is protocol data (NOT derivable: it deviates from the
apparent i^7+42 pattern at several odd indices), so it is reproduced
verbatim.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

#: BN254 scalar field modulus (`hash.py:70`).
SNARK_SCALAR_FIELD = (
    21888242871839275222246405745257275088548364400416034343698204186575808495617
)

#: `devices/middleware/hash.py:3-68` == `verification/zokrates/root.zok:206-219`.
ROUND_CONSTANTS: List[int] = [
    42, 43, 170, 2209, 16426, 78087, 279978, 823517, 2097194, 4782931,
    10000042, 19487209, 35831850, 62748495, 105413546, 170859333,
    268435498, 410338651, 612220074, 893871697, 1280000042, 1801088567,
    2494357930, 3404825421, 4586471466, 6103515587, 8031810218,
    10460353177, 13492928554, 17249876351, 21870000042, 27512614133,
    34359738410, 42618442955, 52523350186, 64339296833, 78364164138,
    94931877159, 114415582634, 137231006717, 163840000042, 194754273907,
    230539333290, 271818611081, 319277809706, 373669453167, 435817657258,
    506623120485, 587068342314, 678223072891, 781250000042, 897410677873,
    1028071702570, 1174711139799, 1338925210026, 1522435234413,
    1727094849578, 1954897493219, 2207984167594, 2488651484857,
    2799360000042, 3142742835999, 3521614606250, 3938980639125,
]


def convert_matrix(m) -> Tuple[np.ndarray, np.ndarray]:
    """Negative -> field complement + sign mask (`hash.py:75-81`)."""
    m = np.array(m, dtype=object)
    adjusted = np.where(m < 0, SNARK_SCALAR_FIELD + m, m)
    sign_mask = np.where(m > 0, 0, 1)
    return adjusted, sign_mask


def mimc(x: int, k: int, e: int = 7, rounds: int = 64) -> int:
    """`hash.py:108-115`."""
    x = int(x)
    for i in range(rounds):
        a = (x + k + ROUND_CONSTANTS[i]) % SNARK_SCALAR_FIELD
        x = pow(a, e, SNARK_SCALAR_FIELD)
    return (x + k) % SNARK_SCALAR_FIELD


def mimc_hash(w: Sequence[Sequence[int]], b: Sequence[int], k: int = 0,
              e: int = 7, rounds: int = 64) -> int:
    """Sponge over weights (row-major) with the row bias interleaved
    (`hash.py:129-135`)."""
    for i in range(len(w)):
        for j in range(len(w[i])):
            k = mimc(int(w[i][j]), k, e, rounds)
        k = mimc(int(b[i]), k, e, rounds)
    return k
