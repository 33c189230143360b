"""Host reference curve/pairing sanity tests (pure Python, no JAX)."""

import pytest

from noir_backend_using_gnark_tpu.utils import hostcurve as H


def test_generators_on_curve():
    assert H.g1_is_on_curve(H.g1_generator())
    assert H.g2_is_on_curve(H.g2_generator())


def test_g1_group_law(rng):
    g = H.g1_generator()
    a, b = rng.randrange(1, H.R), rng.randrange(1, H.R)
    pa, pb = H.g1_mul(g, a), H.g1_mul(g, b)
    assert H.g1_add(pa, pb) == H.g1_mul(g, (a + b) % H.R)
    assert H.g1_add(pa, H.g1_neg(pa)) is None
    assert H.g1_mul(g, H.R) is None


def test_g2_group_law(rng):
    g2 = H.g2_generator()
    a, b = rng.randrange(1, H.R), rng.randrange(1, H.R)
    qa, qb = H.g2_mul(g2, a), H.g2_mul(g2, b)
    assert H.g2_add(qa, qb) == H.g2_mul(g2, (a + b) % H.R)
    assert H.g2_is_on_curve(qa)
    assert H.g2_mul(g2, H.R) is None


def test_fq2_field():
    x = H.FQ2([3, 7])
    assert x * x.inv() == H.FQ2.one()
    assert (x + (-x)).is_zero()


def test_fq12_field():
    x = H.FQ12(list(range(1, 13)))
    assert x * x.inv() == H.FQ12.one()


@pytest.mark.slow
def test_pairing_bilinearity():
    g1 = H.g1_generator()
    g2 = H.g2_generator()
    e_ab = H.pairing(H.g1_mul(g1, 6), H.g2_mul(g2, 5))
    e_base = H.pairing(g1, g2)
    assert e_ab == e_base**30
    # e(P, Q)^r == 1
    assert e_base**H.R == H.FQ12.one()


@pytest.mark.slow
def test_pairing_product_check():
    g1 = H.g1_generator()
    g2 = H.g2_generator()
    # e(2G1, 3G2) * e(-6G1, G2) == 1
    pairs = [
        (H.g1_mul(g1, 2), H.g2_mul(g2, 3)),
        (H.g1_neg(H.g1_mul(g1, 6)), g2),
    ]
    assert H.pairing_product_is_one(pairs)
    bad = [(H.g1_mul(g1, 2), H.g2_mul(g2, 3)), (H.g1_neg(H.g1_mul(g1, 5)), g2)]
    assert not H.pairing_product_is_one(bad)
