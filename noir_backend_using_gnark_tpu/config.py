"""Runtime configuration.

The reference selects curve/scheme at *compile time* via cargo features
(Cargo.toml:32-37, cfg-if dispatch in src/gnark_backend_wrapper/
mod.rs:13-54); here it's a runtime dataclass. BLS12-381 and Groth16
mirror the reference's alternative features (groth16 = the WIP path,
SURVEY.md §2.9).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    curve: str = "bn254"  # only curve; reference's bls12_381 flag descoped (README)
    scheme: str = "plonk"  # or "groth16"
    # PLONK proof protocol/layout: "gnark" = gnark v0.8 linearized
    # openings + gnark transcript, serialized as raw gnark WriteTo
    # blobs (the reference's artifact format, helpers.go:75-80);
    # "expanded" = our 15-opening layout in the NTPU container.
    proof_format: str = "gnark"
    # SRS cache: mirrors $XDG_CONFIG/noir-lang/srs.hex (common.go:78-84).
    srs_path: Optional[str] = None
    # SRS size when generating. The reference hardcodes 1_000_000
    # (common.go:137); we default to a power of two plus blinding slack
    # and grow on demand.
    srs_size: int = 1 << 12
    # Deterministic proof blinding (None = fresh randomness per proof).
    prover_seed: Optional[bytes] = None
    # Device mesh axes for the sharded pipeline ("1x1" = single chip).
    mesh_shape: tuple = (1,)
    mesh_axis_names: tuple = ("shard",)

    def validate(self):
        if self.curve not in ("bn254", "bls12_381"):
            raise ValueError(f"unsupported curve {self.curve!r}")
        if self.curve == "bls12_381":
            # Mirrors the reference's ACTUAL bls12_381 capability: the
            # cargo feature (Cargo.toml:33-36) swaps only the Rust-side
            # Fr felt conversion (src/gnark_backend_wrapper/mod.rs:
            # 13-33), while every FFI call lands in a Go backend
            # hard-wired to bn254 (gnark_backend_ffi/main.go:16-21) —
            # so proving over BLS12-381 does not exist upstream either.
            # Here: Fr arithmetic/codecs/NTT domains work (ops/field.
            # BLS_FR, utils/bigint BLS_FR_* constants); the proving
            # pipeline raises in api.Backend (381-bit Fq is outside the
            # 16x16 limb scheme the G1/pairing engine is built on).
            pass
        if self.scheme not in ("plonk", "groth16"):
            raise ValueError(f"unknown scheme {self.scheme}")
        if self.proof_format not in ("gnark", "expanded"):
            raise ValueError(f"unknown proof_format {self.proof_format}")
        return self


DEFAULT = Config()
