"""Host-side (auditable) STARK verifier."""

from .verify import VerificationError, verify

__all__ = ["VerificationError", "verify"]
