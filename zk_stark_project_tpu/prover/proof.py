"""Proof container + binary serialization.

Everything the verifier needs beyond the public inputs.  `to_bytes()` gives
the byte size the harness contract reports ("Proof size: N bytes",
`src/main.rs:474` parsed at
`verification/time_memory_analytics/analyze.py:476-482`).

Layout (all integers little-endian; field elements canonical 16-byte LE):

  header:   trace_width:u32 trace_length:u32 options(6B)
  roots:    trace_root(32B) comp_root(32B)
  ood:      W felts (cur) | W felts (next) | m felts (comp columns at z)
  fri:      n_layers:u32 [root(32B)]*  (rem_deg+1) felts remainder
  pow:      nonce:u64
  openings: trace rows | comp rows | per-layer fri cosets
            each opening: position:u32 n_values:u32 felts.. n_path:u32 digests..
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List

from .options import ProofOptions


@dataclasses.dataclass
class MerkleOpening:
    position: int
    values: List[int]          # field elements (canonical ints)
    path: List[bytes]          # 32-byte sibling digests, leaf -> root

    def to_bytes(self) -> bytes:
        out = [struct.pack("<II", self.position, len(self.values))]
        for v in self.values:
            out.append(v.to_bytes(16, "little"))
        out.append(struct.pack("<I", len(self.path)))
        out.extend(self.path)
        return b"".join(out)

    @classmethod
    def read(cls, buf: bytes, off: int):
        position, nv = struct.unpack_from("<II", buf, off)
        off += 8
        values = []
        for _ in range(nv):
            values.append(int.from_bytes(buf[off:off + 16], "little"))
            off += 16
        (npath,) = struct.unpack_from("<I", buf, off)
        off += 4
        path = []
        for _ in range(npath):
            path.append(buf[off:off + 32])
            off += 32
        return cls(position, values, path), off


def _write_felts(out: List[bytes], xs: List[int]) -> None:
    out.append(struct.pack("<I", len(xs)))
    for x in xs:
        out.append(x.to_bytes(16, "little"))


def _read_felts(buf: bytes, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    xs = []
    for _ in range(n):
        xs.append(int.from_bytes(buf[off:off + 16], "little"))
        off += 16
    return xs, off


@dataclasses.dataclass
class Proof:
    trace_width: int
    trace_length: int
    options: ProofOptions
    trace_root: bytes
    comp_root: bytes
    ood_trace_cur: List[int]
    ood_trace_next: List[int]
    ood_comp: List[int]
    fri_roots: List[bytes]
    fri_remainder: List[int]
    pow_nonce: int
    trace_openings: List[MerkleOpening]
    comp_openings: List[MerkleOpening]
    fri_openings: List[List[MerkleOpening]]

    def to_bytes(self) -> bytes:
        o = self.options
        out: List[bytes] = [
            struct.pack("<II", self.trace_width, self.trace_length),
            o.to_bytes(),
            self.trace_root, self.comp_root,
        ]
        _write_felts(out, self.ood_trace_cur)
        _write_felts(out, self.ood_trace_next)
        _write_felts(out, self.ood_comp)
        out.append(struct.pack("<I", len(self.fri_roots)))
        out.extend(self.fri_roots)
        _write_felts(out, self.fri_remainder)
        out.append(struct.pack("<Q", self.pow_nonce))
        for group in (self.trace_openings, self.comp_openings):
            out.append(struct.pack("<I", len(group)))
            out.extend(op.to_bytes() for op in group)
        out.append(struct.pack("<I", len(self.fri_openings)))
        for layer in self.fri_openings:
            out.append(struct.pack("<I", len(layer)))
            out.extend(op.to_bytes() for op in layer)
        return b"".join(out)

    @property
    def size_bytes(self) -> int:
        # cached: the CLI prints the size right after proving, and a full
        # re-serialization per lookup showed up in the pipeline profile
        if not hasattr(self, "_size_bytes"):
            object.__setattr__(self, "_size_bytes", len(self.to_bytes()))
        return self._size_bytes

    @classmethod
    def from_bytes(cls, buf: bytes) -> "Proof":
        off = 0
        tw, tl = struct.unpack_from("<II", buf, off)
        off += 8
        ob = buf[off:off + 6]
        off += 6
        options = ProofOptions(
            num_queries=ob[0], blowup_factor=ob[1], grinding_bits=ob[2],
            fri_folding_factor=ob[3], fri_remainder_max_degree=ob[4],
            batching="algebraic" if ob[5] == 0 else "linear")
        trace_root = buf[off:off + 32]; off += 32
        comp_root = buf[off:off + 32]; off += 32
        ood_cur, off = _read_felts(buf, off)
        ood_nxt, off = _read_felts(buf, off)
        ood_comp, off = _read_felts(buf, off)
        (nroots,) = struct.unpack_from("<I", buf, off); off += 4
        fri_roots = []
        for _ in range(nroots):
            fri_roots.append(buf[off:off + 32]); off += 32
        fri_remainder, off = _read_felts(buf, off)
        (pow_nonce,) = struct.unpack_from("<Q", buf, off); off += 8
        groups = []
        for _ in range(2):
            (n,) = struct.unpack_from("<I", buf, off); off += 4
            ops = []
            for _ in range(n):
                op, off = MerkleOpening.read(buf, off)
                ops.append(op)
            groups.append(ops)
        (nlayers,) = struct.unpack_from("<I", buf, off); off += 4
        fri_openings = []
        for _ in range(nlayers):
            (n,) = struct.unpack_from("<I", buf, off); off += 4
            layer = []
            for _ in range(n):
                op, off = MerkleOpening.read(buf, off)
                layer.append(op)
            fri_openings.append(layer)
        return cls(tw, tl, options, trace_root, comp_root, ood_cur, ood_nxt,
                   ood_comp, fri_roots, fri_remainder, pow_nonce,
                   groups[0], groups[1], fri_openings)
