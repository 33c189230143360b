"""Field-kernel tests: ops/field.py vs Python-int ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from noir_backend_using_gnark_tpu.ops import field as F
from noir_backend_using_gnark_tpu.utils import bigint


def _rand_elems(rng, spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


def test_limb_roundtrip(rng):
    vals = _rand_elems(rng, F.FR, 10) + [0, 1, F.FR.modulus - 1]
    arr = bigint.ints_to_limb_array(vals)
    assert bigint.limb_array_to_ints(arr) == vals


def test_mont_roundtrip(rng):
    vals = _rand_elems(rng, F.FR, 32)
    x = F.from_ints(vals, F.FR)
    assert F.to_ints(x, F.FR) == vals


def test_root_of_unity_constants():
    # FR_ROOT_OF_UNITY has exact order 2^28.
    w = bigint.FR_ROOT_OF_UNITY
    r = bigint.FR_MODULUS
    assert pow(w, 1 << 28, r) == 1
    assert pow(w, 1 << 27, r) != 1


def test_add_sub_neg(rng):
    for spec in (F.FR, F.FQ):
        a_i = _rand_elems(rng, spec, 64) + [0, spec.modulus - 1]
        b_i = _rand_elems(rng, spec, 64) + [spec.modulus - 1, spec.modulus - 1]
        a = F.from_ints(a_i, spec, to_mont=False)
        b = F.from_ints(b_i, spec, to_mont=False)
        got_add = F.to_ints(F.add(a, b, spec), spec, from_mont=False)
        got_sub = F.to_ints(F.sub(a, b, spec), spec, from_mont=False)
        got_neg = F.to_ints(F.neg(a, spec), spec, from_mont=False)
        for ga, gs, gn, x, y in zip(got_add, got_sub, got_neg, a_i, b_i):
            assert ga == (x + y) % spec.modulus
            assert gs == (x - y) % spec.modulus
            assert gn == (-x) % spec.modulus


def test_mont_mul(rng):
    for spec in (F.FR, F.FQ):
        a_i = _rand_elems(rng, spec, 64) + [0, 1, spec.modulus - 1, spec.modulus - 1]
        b_i = _rand_elems(rng, spec, 64) + [1, 0, spec.modulus - 1, 1]
        a = F.from_ints(a_i, spec)
        b = F.from_ints(b_i, spec)
        got = F.to_ints(F.mont_mul(a, b, spec), spec)
        for g, x, y in zip(got, a_i, b_i):
            assert g == x * y % spec.modulus


def test_mont_mul_jit_matches_eager(rng):
    a_i = _rand_elems(rng, F.FR, 16)
    b_i = _rand_elems(rng, F.FR, 16)
    a = F.from_ints(a_i, F.FR)
    b = F.from_ints(b_i, F.FR)
    jitted = jax.jit(lambda x, y: F.mont_mul(x, y, F.FR))
    np.testing.assert_array_equal(np.asarray(jitted(a, b)), np.asarray(F.mont_mul(a, b, F.FR)))


def test_pow_and_inv(rng):
    spec = F.FR
    a_i = _rand_elems(rng, spec, 8) + [1, spec.modulus - 1]
    a = F.from_ints(a_i, spec)
    # x * x^-1 == 1
    got_inv = F.to_ints(F.inv(a, spec), spec)
    for g, x in zip(got_inv, a_i):
        assert g * x % spec.modulus == 1
    # cube
    got_cube = F.to_ints(F.mont_pow_const(a, 3, spec), spec)
    for g, x in zip(got_cube, a_i):
        assert g == pow(x, 3, spec.modulus)


def test_inv_zero_is_zero():
    a = F.from_ints([0], F.FR)
    # Fermat pow gives 0 for 0 naturally.
    assert F.to_ints(F.inv(a, F.FR), F.FR) == [0]


def test_batch_inv(rng):
    spec = F.FR
    a_i = _rand_elems(rng, spec, 33) + [0, 1, 0, spec.modulus - 1]
    a = F.from_ints(a_i, spec)
    got = F.to_ints(F.batch_inv(a, spec), spec)
    for g, x in zip(got, a_i):
        if x == 0:
            assert g == 0
        else:
            assert g * x % spec.modulus == 1


def test_select_eq_iszero(rng):
    spec = F.FR
    a = F.from_ints([5, 0, 7], spec, to_mont=False)
    b = F.from_ints([5, 1, 9], spec, to_mont=False)
    np.testing.assert_array_equal(np.asarray(F.eq(a, b)), [True, False, False])
    np.testing.assert_array_equal(np.asarray(F.is_zero(a)), [False, True, False])
    cond = jnp.asarray([True, False, True])
    got = F.to_ints(F.select(cond, a, b), spec, from_mont=False)
    assert got == [5, 1, 7]


def test_to_from_mont_consistency(rng):
    spec = F.FQ
    vals = _rand_elems(rng, spec, 16)
    canon = F.from_ints(vals, spec, to_mont=False)
    mont = F.to_mont(canon, spec)
    back = F.from_mont(mont, spec)
    assert F.to_ints(back, spec, from_mont=False) == vals
    # matches host-side Montgomery conversion
    assert F.to_ints(mont, spec, from_mont=True) == vals
