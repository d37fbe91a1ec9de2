"""AIR (Algebraic Intermediate Representation) framework.

TPU-native analog of winterfell's `Air` trait as the reference uses it
(`src/training/air.rs:101-291`, `src/aggregation/air.rs:89-152`): an AIR
declares trace shape, transition constraints (with degrees), boundary
assertions, and public inputs feeding the Fiat–Shamir transcript.

Two evaluation paths (the reference gets this duality from Rust generics over
`FieldElement`, `src/signed.rs:17-48`):

  * `evaluate_transitions_jax(cur, nxt)` — vectorized over the whole
    constraint-evaluation domain on device; frames are (8, W, D) limb arrays.
  * `evaluate_transitions_at(cur, nxt)` — python ints at the single
    out-of-domain point, used by the (auditable, host-side) verifier.

Both must implement the same polynomials.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax.numpy as jnp

from ..ops import f128_ref as ref
from .options import ProofOptions


@dataclasses.dataclass(frozen=True)
class Assertion:
    """column `col` equals `value` at row `step` (winterfell
    `Assertion::single`)."""
    col: int
    step: int
    value: int


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


class Air:
    """Base class.  Subclasses set `transition_degrees` and implement the
    constraint/assertion/pub-input methods."""

    #: one entry per transition constraint; entry = algebraic degree in the
    #: trace polynomials (winterfell `TransitionConstraintDegree::new(d)`).
    transition_degrees: List[int] = []

    #: static name of this AIR's batched transition kernel
    #: (`prover/phases.py::TRANSITION_KERNELS`; "zero" = inert transitions).
    #: None falls back to the un-batched `evaluate_transitions_jax` path.
    transition_kind = None

    #: True when `evaluate_transitions_at` needs the evaluation point z
    #: (AIRs with periodic columns, e.g. `models/training_v2.py`); the
    #: verifier then calls it as (cur, nxt, z).
    needs_point = False

    def transition_params(self):
        """Per-statement transition-kernel parameters as python ints /
        nested int lists (stacked to (8, C, ...) limb arrays when proofs
        are batched)."""
        return {}

    def periodic_rows(self):
        """Optional PUBLIC periodic columns: an (n_p, n) object-int array
        of per-row values over the trace domain (e.g. the v2 row
        selector), or None.  Provers CE-evaluate them and pass the result
        to the transition kernel as params["periodic_ce"]; batched proofs
        require identical periodic rows across the batch (they must
        depend only on shape-level public inputs)."""
        return None

    def __init__(self, trace_width: int, trace_length: int,
                 options: ProofOptions):
        assert trace_length & (trace_length - 1) == 0
        self.trace_width = trace_width
        self.trace_length = trace_length
        self.options = options

    # -- protocol-derived context ------------------------------------------

    @property
    def num_transition_constraints(self) -> int:
        return len(self.transition_degrees)

    @property
    def ce_blowup(self) -> int:
        """Constraint-evaluation domain blowup: smallest power of two that
        dominates every constraint's quotient degree (min 2, like
        winterfell's AirContext)."""
        return max(2, _next_pow2(max(self.transition_degrees, default=1)))

    @property
    def num_composition_columns(self) -> int:
        """The composition polynomial (degree < ce_blowup * n) is split into
        this many degree-(n-1) columns."""
        return self.ce_blowup

    @property
    def trace_domain_generator(self) -> int:
        return ref.root_of_unity(self.trace_length.bit_length() - 1)

    @property
    def lde_domain_size(self) -> int:
        return self.trace_length * self.options.blowup_factor

    @property
    def domain_offset(self) -> int:
        """LDE/CE coset offset = the field's multiplicative generator
        (winterfell StarkDomain convention)."""
        return ref.GENERATOR

    # -- to be implemented by statements -----------------------------------

    def get_assertions(self) -> List[Assertion]:
        raise NotImplementedError

    def evaluate_transitions_jax(self, cur: jnp.ndarray,
                                 nxt: jnp.ndarray) -> jnp.ndarray:
        """cur/nxt: (8, W, D) trace-frame evaluations over a domain of D
        points.  Returns (8, K, D) constraint evaluations (un-divided)."""
        raise NotImplementedError

    def evaluate_transitions_at(self, cur: Sequence[int],
                                nxt: Sequence[int]) -> List[int]:
        """Same constraints at one point, python-int arithmetic."""
        raise NotImplementedError

    def pub_input_elements(self) -> List[int]:
        """Field elements feeding the transcript seed (winterfell
        `ToElements`)."""
        raise NotImplementedError

    def pub_input_bytes(self) -> bytes:
        """Byte serialization (winterfell `Serializable::write_into`)."""
        from .channel import felts_to_bytes
        return felts_to_bytes(self.pub_input_elements())
