"""Device G2 arithmetic (ops/curve2) vs the host reference."""

import jax
import numpy as np
import pytest

from noir_backend_using_gnark_tpu.ops import curve2 as C2
from noir_backend_using_gnark_tpu.ops import field as F
from noir_backend_using_gnark_tpu.utils import bigint, hostcurve as H

R = bigint.FR_MODULUS


def _to_host_single(pt):
    return C2.to_affine2_host(jax.tree_util.tree_map(lambda a: a[..., None], pt))[0]


def test_affine2_roundtrip(rng):
    g2 = H.g2_generator()
    pts = [None, g2, H.g2_mul(g2, 7), H.g2_mul(g2, rng.randrange(1, R))]
    qx, qy, inf = C2.from_affine2_host(pts)
    assert list(np.asarray(inf)) == [True, False, False, False]
    # Lift to Jacobian z=1 and convert back.
    n = len(pts)
    z0 = F.from_ints([0 if p is None else 1 for p in pts], F.FQ)
    z1 = F.zeros((n,))
    jac = C2.JacobianPoint2(qx[0], qx[1], qy[0], qy[1], z0, z1)
    back = C2.to_affine2_host(jac)
    assert back == pts


def test_fixed_base_mul2_matches_host(rng):
    # Padded to 64 = groth16._size_class's floor so this compile is
    # shared with the groth16 tests (jit keys on shapes).
    ks = [0, 1, 2, 5, rng.randrange(1, R), rng.randrange(1, R)] + [0] * 58
    tx, ty = C2.g2_powers_table(256)
    sc = F.from_ints(ks, F.FR, to_mont=False)
    out = C2.fixed_base_mul2(tx[0], tx[1], ty[0], ty[1], sc)
    got = C2.to_affine2_host(out)
    g2 = H.g2_generator()
    want = [H.g2_mul(g2, k) for k in ks]
    assert got == want


def test_double_and_add_match_host(rng):
    g2 = H.g2_generator()
    a = H.g2_mul(g2, 11)
    b = H.g2_mul(g2, 29)
    qx, qy, _ = C2.from_affine2_host([a, b])
    one = F.from_ints([1, 1], F.FQ)
    jac = C2.JacobianPoint2(qx[0], qx[1], qy[0], qy[1], one, F.zeros((2,)))
    dbl = C2.to_affine2_host(C2.double2(jac))
    assert dbl == [H.g2_mul(g2, 22), H.g2_mul(g2, 58)]
    qxb = tuple(c[:, 1:2] for c in qx)
    qyb = tuple(c[:, 1:2] for c in qy)
    summed = C2.add_mixed2(
        jax.tree_util.tree_map(lambda t: t[:, :1], jac),
        qxb,
        qyb,
        np.zeros((1,), bool),
    )
    assert C2.to_affine2_host(summed) == [H.g2_mul(g2, 40)]


def test_g2_msm_matches_host(rng):
    g2 = H.g2_generator()
    n = 64  # groth16._size_class floor — shares the compiled module
    mults = [rng.randrange(1, R) for _ in range(16)]
    pts = [H.g2_mul(g2, m) for m in mults] + [None] * (n - 16)
    scalars = [rng.randrange(R) for _ in range(16)] + [0] * (n - 16)
    qx, qy, inf = C2.from_affine2_host(pts)
    sc = F.from_ints(scalars, F.FR, to_mont=False)
    out = C2.g2_msm(qx, qy, inf, sc)
    got = _to_host_single(out)
    want = None
    for p, s in zip(pts[:16], scalars[:16]):
        want = H.g2_add(want, H.g2_mul(p, s))
    assert got == want


def test_g2_msm_handles_infinity_and_zero(rng):
    g2 = H.g2_generator()
    pts = [g2, None, H.g2_mul(g2, 3), g2] + [None] * 60
    scalars = [5, 7, 0, 2] + [0] * 60
    qx, qy, inf = C2.from_affine2_host(pts)
    sc = F.from_ints(scalars, F.FR, to_mont=False)
    got = _to_host_single(C2.g2_msm(qx, qy, inf, sc))
    assert got == H.g2_mul(g2, 7)
