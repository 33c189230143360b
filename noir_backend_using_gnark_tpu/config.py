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
        if self.curve != "bn254":
            # The reference's bls12_381 cargo feature is DESCOPED here
            # (documented in README "Curve support"): the limb layout
            # and two-adicity constants are BN254-specific today.
            raise ValueError(
                f"unsupported curve {self.curve!r}: bn254 only "
                "(bls12_381 descoped — see README)"
            )
        if self.scheme not in ("plonk", "groth16"):
            raise ValueError(f"unknown scheme {self.scheme}")
        return self


DEFAULT = Config()
