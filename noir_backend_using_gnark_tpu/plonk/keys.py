"""PLONK key and proof containers.

Our equivalents of gnark's plonk.ProvingKey / VerifyingKey / Proof (the
artifacts the reference moves as hex blobs across the FFI —
helpers.go:49-94). Device-resident polynomial data lives on the proving
key; the verifying key and proof are plain host objects (ints and
affine points) since verification is host-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import numpy as np


@dataclass
class VerifyingKey:
    n: int  # domain size (power of two)
    nb_public: int
    generator: int  # omega for the size-n subgroup
    k1: int
    k2: int
    q_l: object  # affine int points (x, y) or None
    q_r: object
    q_o: object
    q_m: object
    q_c: object
    s1: object
    s2: object
    s3: object
    g2_gen: object  # host FQ2 affine pair
    g2_alpha: object

    def commitment_list(self):
        return [
            self.q_l,
            self.q_r,
            self.q_o,
            self.q_m,
            self.q_c,
            self.s1,
            self.s2,
            self.s3,
        ]


@dataclass
class ProvingKey:
    """Device-side prover data. Everything shaped for the TPU pipeline."""

    n: int
    nb_public: int
    nb_vars: int
    k1: int
    k2: int
    # Wire variable index per row, including public & padding rows: (n,) int32.
    wire_a: np.ndarray
    wire_b: np.ndarray
    wire_c: np.ndarray
    # Selector polynomials, coefficient form (16, n) Montgomery.
    ql: jax.Array
    qr: jax.Array
    qo: jax.Array
    qm: jax.Array
    qc: jax.Array
    # Permutation polynomials sigma_col, coefficient form (16, n).
    s1: jax.Array
    s2: jax.Array
    s3: jax.Array
    # sigma evaluation vectors on H (16, n) — used in the z product.
    s1_evals: jax.Array
    s2_evals: jax.Array
    s3_evals: jax.Array
    vk: VerifyingKey = None
    srs: object = None  # kzg.SRS
    # 8-byte fingerprint of the SRS this pk was built against (set by
    # artifacts.pk_from_bytes for v2 blobs; None = legacy/unknown).
    srs_fingerprint: Optional[bytes] = None


@dataclass
class Proof:
    """All commitments are host affine int points (or None).

    This is the 'expanded' PLONK layout: selector/sigma openings are
    included so the verifier checks the full identity numerically at
    zeta — simpler and sound; proof is a few hundred bytes larger than
    gnark's linearized variant (optimization tracked for later rounds).
    """

    a: object
    b: object
    c: object
    z: object
    t0: object
    t1: object
    t2: object
    # Evaluations at zeta (ints), in ZETA_OPENING_LABELS order.
    evals: list
    z_omega: int  # z(zeta * omega)
    w_zeta: object  # batched opening proof at zeta
    w_zeta_omega: object  # opening proof for z at zeta*omega


#: Fixed ordering of the batched zeta opening (prover and verifier must agree).
ZETA_OPENING_LABELS = (
    "a",
    "b",
    "c",
    "z",
    "s1",
    "s2",
    "s3",
    "ql",
    "qr",
    "qo",
    "qm",
    "qc",
    "t0",
    "t1",
    "t2",
)
