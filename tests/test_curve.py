"""Curve-kernel tests: ops/curve.py vs the pure-Python host group law."""

import numpy as np

from noir_backend_using_gnark_tpu.ops import curve as C
from noir_backend_using_gnark_tpu.utils import hostcurve as H


def _rand_points(rng, n):
    """Random G1 points as multiples of the generator."""
    g = H.g1_generator()
    return [H.g1_mul(g, rng.randrange(1, H.R)) for _ in range(n)]


def test_affine_roundtrip(rng):
    pts = _rand_points(rng, 4) + [None, H.g1_generator()]
    batch = C.from_affine_ints(pts)
    assert C.to_affine_ints(batch) == pts


def test_add_matches_host(rng):
    n = 8
    ps = _rand_points(rng, n)
    qs = _rand_points(rng, n)
    # Exercise special cases: identity operands, doubling, inverse pairs.
    ps += [None, None, ps[0], ps[1], ps[2]]
    qs += [qs[0], None, ps[0], H.g1_neg(ps[1]), ps[3]]
    got = C.to_affine_ints(C.add(C.from_affine_ints(ps), C.from_affine_ints(qs)))
    want = [H.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_double_matches_host(rng):
    ps = _rand_points(rng, 6) + [None]
    got = C.to_affine_ints(C.double(C.from_affine_ints(ps)))
    want = [H.g1_add(p, p) for p in ps]
    assert got == want


def test_add_mixed(rng):
    ps = _rand_points(rng, 4) + [None, ps_extra := H.g1_generator()]
    qs = _rand_points(rng, 4) + [ps_extra, None]
    p_batch = C.from_affine_ints(ps)
    qx, qy, qinf = C.to_affine(C.from_affine_ints(qs))
    got = C.to_affine_ints(C.add_mixed(p_batch, qx, qy, qinf))
    want = [H.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_scalar_mul(rng):
    from noir_backend_using_gnark_tpu.ops import field as F

    g = H.g1_generator()
    scalars = [0, 1, 2, 5, H.R - 1, rng.randrange(H.R)]
    pts = [g] * len(scalars)
    sc = F.from_ints(scalars, F.FR, to_mont=False)
    got = C.to_affine_ints(C.scalar_mul(C.from_affine_ints(pts), sc))
    want = [H.g1_mul(g, s) for s in scalars]
    assert got == want


def test_fixed_base_mul(rng):
    from noir_backend_using_gnark_tpu.ops import field as F

    tx, ty = C.generator_powers_table(64)  # small table: scalars < 2^64
    scalars = [0, 1, 3, 2**40 + 17, rng.randrange(2**64)]
    sc = F.from_ints(scalars, F.FR, to_mont=False)
    got = C.to_affine_ints(C.fixed_base_mul(tx, ty, sc))
    g = H.g1_generator()
    want = [H.g1_mul(g, s) for s in scalars]
    assert got == want
