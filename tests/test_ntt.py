"""NTT tests vs naive host evaluation."""

import numpy as np

from noir_backend_using_gnark_tpu.ops import field as F
from noir_backend_using_gnark_tpu.ops import ntt as N
from noir_backend_using_gnark_tpu.utils import bigint

R = bigint.FR_MODULUS


def naive_ntt(coeffs, w):
    n = len(coeffs)
    return [sum(c * pow(w, i * j, R) for j, c in enumerate(coeffs)) % R for i in range(n)]


def test_powers_of():
    base = F.from_ints([7], F.FR)
    got = F.to_ints(N.powers_of(base, 9, F.FR), F.FR)
    assert got == [pow(7, i, R) for i in range(9)]


def test_bit_reverse():
    assert list(N.bit_reverse_perm(8)) == [0, 4, 2, 6, 1, 5, 3, 7]


def test_ntt_matches_naive(rng):
    n = 16
    dom = N.Domain.get(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    got = F.to_ints(N.ntt(F.from_ints(coeffs, F.FR), dom), F.FR)
    assert got == naive_ntt(coeffs, dom.w_int)


def test_intt_roundtrip(rng):
    n = 64
    dom = N.Domain.get(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    a = F.from_ints(coeffs, F.FR)
    back = F.to_ints(N.intt(N.ntt(a, dom), dom), F.FR)
    assert back == coeffs


def test_coset_roundtrip_and_values(rng):
    n = 8
    g = bigint.FR_MULTIPLICATIVE_GENERATOR
    dom = N.Domain.get(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    a = F.from_ints(coeffs, F.FR)
    ev = N.coset_ntt(a, g, dom)
    # value at coset point g*w^i
    got = F.to_ints(ev, F.FR)
    for i in range(n):
        x = g * pow(dom.w_int, i, R) % R
        want = sum(c * pow(x, j, R) for j, c in enumerate(coeffs)) % R
        assert got[i] == want
    back = F.to_ints(N.coset_intt(ev, g, dom), F.FR)
    assert back == coeffs
