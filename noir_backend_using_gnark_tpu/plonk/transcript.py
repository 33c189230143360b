"""Fiat-Shamir transcript for the PLONK/Groth16 provers.

SHA-256 sponge with labeled absorption. The reference delegates its
transcript to gnark's internal fiat-shamir (invisible behind
``plonk.Prove``, backend/plonk/plonk.go:69); ours is specified here so
that proofs are verifiable by any reimplementation:

  * ``absorb(label, data)`` appends ``len(label) || label || len(data)
    || data`` (4-byte BE lengths) into a running SHA-256;
  * ``challenge(name)`` forks the state with the name, reduces the
    digest big-endian mod r, and absorbs the drawn value (so later
    challenges depend on earlier ones).

Deterministic given the same absorbed artifacts. Byte-compatibility
with gnark v0.8's transcript is NOT claimed (cannot be validated
in-environment; tracked as a conformance gap in README).
"""

from __future__ import annotations

import hashlib

from ..utils import bigint

FR = bigint.FR_MODULUS


class Transcript:
    def __init__(self, protocol: str):
        self._h = hashlib.sha256()
        self.absorb(b"protocol", protocol.encode())

    def absorb(self, label: bytes, data: bytes) -> None:
        self._h.update(len(label).to_bytes(4, "big"))
        self._h.update(label)
        self._h.update(len(data).to_bytes(4, "big"))
        self._h.update(data)

    def absorb_felt(self, label: bytes, value: int) -> None:
        self.absorb(label, bigint.felt_to_bytes_be(value))

    def absorb_point(self, label: bytes, point) -> None:
        """Affine G1 point as 64 bytes (x||y BE), infinity as zeros."""
        if point is None:
            self.absorb(label, b"\x00" * 64)
        else:
            x, y = point
            self.absorb(label, x.to_bytes(32, "big") + y.to_bytes(32, "big"))

    def challenge(self, name: bytes) -> int:
        fork = self._h.copy()
        fork.update(b"challenge:" + name)
        value = int.from_bytes(fork.digest(), "big") % FR
        self.absorb(b"drawn:" + name, bigint.felt_to_bytes_be(value))
        return value
