"""Round-level checkpoint / resume for multi-round FL proving runs.

The reference has NO checkpointing in the proving path (SURVEY.md §5); its
closest artifact is the IPFS pickle that persists global models across
calls (`devices/middleware/ipfs.py:16-36`).  For long batched-proving runs
(one aggregation proof per FL round, the reference's multi-round configs)
this module adds resumable round state:

  * the global model (weights + bias) and the aggregator-selector cursor,
  * EVERY RNG stream (numpy `Generator.bit_generator.state` dicts), so a
    resumed run replays bit-identically to an uninterrupted one
    (SURVEY.md pin #4: all randomness is injectable),
  * the round's proof artifacts (serialized `Proof` bytes + digest).

Writes are atomic (tmp file + `os.replace`) and self-checking (embedded
SHA-256 over the payload), so a checkpoint can never be observed
half-written and a corrupted file is detected at load, not silently
resumed from.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_MAGIC = b"ZKSTARK-CKPT-v1\n"
_FILE_RE = re.compile(r"^round_(\d+)\.ckpt$")


# ---------------------------------------------------------------------------
# RNG state capture
# ---------------------------------------------------------------------------


def capture_rng(gen: np.random.Generator) -> Dict[str, Any]:
    """Snapshot a numpy Generator's full bit-generator state."""
    return gen.bit_generator.state


def restore_rng(state: Dict[str, Any]) -> np.random.Generator:
    """Rebuild a Generator whose stream continues exactly from `state`."""
    cls = getattr(np.random, state["bit_generator"])
    bg = cls()
    bg.state = state
    return np.random.Generator(bg)


def restore_rng_inplace(gen: np.random.Generator,
                        state: Dict[str, Any]) -> None:
    """Restore `state` into an EXISTING Generator object.  In-place matters:
    components share Generator references (e.g. the FL local net holds the
    same object as its middleware), so rebinding an attribute would fork
    the stream while in-place restoration updates every holder at once."""
    if gen.bit_generator.state["bit_generator"] != state["bit_generator"]:
        raise ValueError("bit-generator type mismatch on restore")
    gen.bit_generator.state = state


# ---------------------------------------------------------------------------
# Checkpoint files
# ---------------------------------------------------------------------------


class CheckpointCorrupt(RuntimeError):
    pass


class CheckpointManager:
    """Atomic, checksummed per-round checkpoints under one directory."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    # -- paths ----------------------------------------------------------------

    def _path(self, round_idx: int) -> str:
        return os.path.join(self.directory, f"round_{round_idx}.ckpt")

    def proof_path(self, round_idx: int) -> str:
        return os.path.join(self.directory, f"round_{round_idx}.proof")

    def rounds(self) -> List[int]:
        out = []
        for name in os.listdir(self.directory):
            m = _FILE_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    # -- save / load ------------------------------------------------------------

    def save_round(self, round_idx: int, state: Dict[str, Any],
                   proof_bytes: Optional[bytes] = None) -> str:
        """Persist `state` (and optionally the round's proof) atomically."""
        payload = pickle.dumps(state, protocol=pickle.HIGHEST_PROTOCOL)
        digest = hashlib.sha256(payload).digest()
        path = self._path(round_idx)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_MAGIC)
            f.write(digest)
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        if proof_bytes is not None:
            ptmp = self.proof_path(round_idx) + ".tmp"
            with open(ptmp, "wb") as f:
                f.write(proof_bytes)
                f.flush()
                os.fsync(f.fileno())
            os.replace(ptmp, self.proof_path(round_idx))
        return path

    def load_round(self, round_idx: int) -> Dict[str, Any]:
        with open(self._path(round_idx), "rb") as f:
            blob = f.read()
        if not blob.startswith(_MAGIC):
            raise CheckpointCorrupt(f"bad magic in {self._path(round_idx)}")
        digest = blob[len(_MAGIC):len(_MAGIC) + 32]
        payload = blob[len(_MAGIC) + 32:]
        if hashlib.sha256(payload).digest() != digest:
            raise CheckpointCorrupt(
                f"checksum mismatch in {self._path(round_idx)}")
        return pickle.loads(payload)

    def load_proof(self, round_idx: int) -> Optional[bytes]:
        path = self.proof_path(round_idx)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    def latest(self) -> Optional[Tuple[int, Dict[str, Any]]]:
        """(round_idx, state) of the newest loadable checkpoint, skipping
        any trailing corrupted files (e.g. a crash mid-fsync elsewhere)."""
        for idx in reversed(self.rounds()):
            try:
                return idx, self.load_round(idx)
            except (CheckpointCorrupt, pickle.UnpicklingError, OSError):
                continue
        return None
