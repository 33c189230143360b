"""PLONK Setup: constraint table -> proving/verifying keys.

Our replacement for gnark's ``plonk.Setup`` as driven by the reference's
``Preprocess`` (backend/plonk/plonk.go:13-27): build selector and
permutation polynomials from the lowered gate table, commit to them with
KZG, and package the keys.

Row layout (gnark v0.8 public placeholder rows, setup.go's
"-PUB_INPUT_i + qk_i = 0" convention):
  * rows 0..l-1: one gate per public input: qL=-1, wires a=b=c=var i;
    the prover completes qk with +pub_i on these rows (the PI
    polynomial in prove.py) and the verifier adds
    PI(zeta) = sum_i +pub_i * L_i(zeta) to the identity;
  * rows l..l+g-1: the lowered ACIR gates (acir/lowering.py);
  * padding rows to the next power of two: all-zero selectors, wires
    pointing at variable 0.

The copy-constraint permutation runs over the 3n wire slots; sigma is
built by chaining each variable's slot occurrences into a cycle.
"""

from __future__ import annotations

import numpy as np

from ..acir.lowering import PlonkCircuit
from ..kzg import kzg
from ..ops import field as F
from ..ops import ntt as N
from ..utils import bigint
from .keys import ProvingKey, VerifyingKey

FR = F.FR
R = bigint.FR_MODULUS

# Coset multipliers for the b and c wire columns. Validated in
# :func:`_check_cosets` (must generate disjoint cosets of every 2^k
# subgroup used as a domain).
K1 = 5
K2 = 25


def _check_cosets(n: int):
    # 5 is a quadratic non-residue with multiplicative order not dividing
    # 2^28, so 5*H and 25*H are disjoint from H and from each other.
    assert pow(K1, n, R) != 1, "k1 lies in the domain subgroup"
    assert pow(K2, n, R) != 1, "k2 lies in the domain subgroup"
    assert pow(K2 * pow(K1, -1, R) % R, n, R) != 1, "k2/k1 lies in the subgroup"


def domain_size_for(pc: PlonkCircuit) -> int:
    """Smallest power-of-two domain covering the rows.

    ``NOIRTPU_MIN_DOMAIN`` (env) raises the floor — padding many small
    circuits to one common domain lets them share every compiled
    kernel shape (the integration suite pads its 15 programs to n=32
    so the whole tier pays for ONE set of XLA compiles).
    """
    import os

    floor = int(os.environ.get("NOIRTPU_MIN_DOMAIN", "8"))
    rows = pc.nb_public + pc.n_gates
    n = 8
    while n < max(rows, floor):
        n *= 2
    return n


def build_tables(pc: PlonkCircuit):
    """Host-side: full-row selector vectors + wire index vectors."""
    n = domain_size_for(pc)
    l = pc.nb_public
    g = pc.n_gates

    ql = [0] * n
    qr = [0] * n
    qo = [0] * n
    qm = [0] * n
    qc = [0] * n
    wa = np.zeros(n, np.int32)
    wb = np.zeros(n, np.int32)
    wc = np.zeros(n, np.int32)

    for i in range(l):
        ql[i] = R - 1  # gnark's qL = -1 placeholder (setup.go)
        wa[i] = i
        wb[i] = i
        wc[i] = i
    for j in range(g):
        r = l + j
        ql[r] = pc.q_l[j] % R
        qr[r] = pc.q_r[j] % R
        qo[r] = pc.q_o[j] % R
        qm[r] = pc.q_m[j] % R
        qc[r] = pc.q_c[j] % R
        wa[r] = pc.wire_a[j]
        wb[r] = pc.wire_b[j]
        wc[r] = pc.wire_c[j]
    return n, (ql, qr, qo, qm, qc), (wa, wb, wc)


def build_sigma(n: int, wires, domain: N.Domain):
    """Permutation evaluations. Slot (col, row) carries the identity
    value eta_col * omega^row; sigma sends each slot to the next slot in
    its variable's occurrence cycle. Returns three length-n int lists
    (evaluations of sigma_1..3 on H)."""
    wa, wb, wc = wires
    omega_pows = [pow(domain.w_int, i, R) for i in range(n)]
    eta = (1, K1, K2)

    occurrences: dict[int, list] = {}
    for col, w in enumerate((wa, wb, wc)):
        for row in range(n):
            occurrences.setdefault(int(w[row]), []).append((col, row))

    sigma = [[0] * n for _ in range(3)]
    for slots in occurrences.values():
        m = len(slots)
        for idx, (col, row) in enumerate(slots):
            ncol, nrow = slots[(idx + 1) % m]
            sigma[col][row] = eta[ncol] * omega_pows[nrow] % R
    return sigma


def setup(pc: PlonkCircuit, srs: kzg.SRS) -> tuple[ProvingKey, VerifyingKey]:
    n, selectors, wires = build_tables(pc)
    _check_cosets(n)
    domain = N.Domain.get(n)
    sigma = build_sigma(n, wires, domain)

    if srs.size < n + 8:
        raise ValueError(f"SRS size {srs.size} too small for domain {n} (+blinding)")

    # Interpolate: evaluation vectors -> coefficient form on device.
    sel_coeffs = [N.intt(F.from_ints(v, FR), domain) for v in selectors]
    sig_evals = [F.from_ints(v, FR) for v in sigma]
    sig_coeffs = [N.intt(e, domain) for e in sig_evals]

    # All 8 selector/sigma commitments in ONE dispatch + readback
    # (shares the prover's stacked commit kernel + batched window join).
    commitments = kzg.commit_many_ints(srs, sel_coeffs + sig_coeffs)

    vk = VerifyingKey(
        n=n,
        nb_public=pc.nb_public,
        generator=domain.w_int,
        k1=K1,
        k2=K2,
        q_l=commitments[0],
        q_r=commitments[1],
        q_o=commitments[2],
        q_m=commitments[3],
        q_c=commitments[4],
        s1=commitments[5],
        s2=commitments[6],
        s3=commitments[7],
        g2_gen=srs.g2_gen,
        g2_alpha=srs.g2_alpha,
    )
    pk = ProvingKey(
        n=n,
        nb_public=pc.nb_public,
        nb_vars=pc.nb_vars,
        k1=K1,
        k2=K2,
        wire_a=wires[0],
        wire_b=wires[1],
        wire_c=wires[2],
        ql=sel_coeffs[0],
        qr=sel_coeffs[1],
        qo=sel_coeffs[2],
        qm=sel_coeffs[3],
        qc=sel_coeffs[4],
        s1=sig_coeffs[0],
        s2=sig_coeffs[1],
        s3=sig_coeffs[2],
        s1_evals=sig_evals[0],
        s2_evals=sig_evals[1],
        s3_evals=sig_evals[2],
        vk=vk,
        srs=srs,
    )
    return pk, vk
