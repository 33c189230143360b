"""Sanitizer + failure-recovery tiers (SURVEY.md §5).

The sanitizer is the integer-crypto analogue of jax_debug_nans (the
reference leans on Go's -race / Rust's borrow checker instead — we
check the invariants a JAX limb kernel can actually break: limb range,
canonicality, on-curve). The retry tier is the recovery path for the
compile-relay failures that killed long proves in earlier rounds.
"""

import pathlib

import numpy as np
import pytest

from noir_backend_using_gnark_tpu.acir import lowering, parse, solver
from noir_backend_using_gnark_tpu.kzg import kzg
from noir_backend_using_gnark_tpu.plonk import prove as plonk_prove
from noir_backend_using_gnark_tpu.plonk import setup as plonk_setup
from noir_backend_using_gnark_tpu.plonk import verify as plonk_verify
from noir_backend_using_gnark_tpu.utils import bigint, retry, sanitize

FIX = pathlib.Path(__file__).parent / "fixtures"
R = bigint.FR_MODULUS
Q = bigint.FQ_MODULUS


@pytest.fixture()
def sanitizing():
    sanitize.enable(True)
    yield
    sanitize.enable(False)


def _limbs(values):
    return bigint.ints_to_limb_array(values)


# ---------------------------------------------------------------------------
# check_field
# ---------------------------------------------------------------------------


def test_canonical_batch_passes(sanitizing):
    sanitize.check_field(_limbs([0, 1, 12345, R - 1]), R, "t")


def test_limb_overflow_detected(sanitizing):
    arr = _limbs([0, 1, 2, 3]).copy()
    arr[7, 2] = 0x1_0000  # 17-bit limb: a missed carry
    with pytest.raises(sanitize.SanitizeError, match="limb overflow"):
        sanitize.check_field(arr, R, "t")


def test_non_canonical_detected(sanitizing):
    # The modulus itself (v == p) and p+2 are representable in 16-bit
    # limbs but are not canonical field elements.
    for v in (R, R + 2):
        with pytest.raises(sanitize.SanitizeError, match="non-canonical"):
            sanitize.check_field(_limbs([0, v]), R, "t")


def test_batch_shape_agnostic(sanitizing):
    arr = _limbs([1, 2, 3, 4, 5, 6]).reshape(16, 2, 3)
    sanitize.check_field(arr, R, "t")
    bad = arr.copy()
    bad[:, 1, 2] = _limbs([R])[:, 0]
    with pytest.raises(sanitize.SanitizeError):
        sanitize.check_field(bad, R, "t")


def test_disabled_is_noop():
    was = sanitize.enabled()
    sanitize.enable(False)
    try:
        arr = _limbs([R])  # non-canonical — but the tier is off
        sanitize.check_field(arr, R, "t")
    finally:
        sanitize.enable(was)


# ---------------------------------------------------------------------------
# check_g1_affine
# ---------------------------------------------------------------------------


def test_generator_on_curve(sanitizing):
    sanitize.check_g1_affine(_limbs([1, 0]), _limbs([2, 0]), Q, "t")


def test_off_curve_detected(sanitizing):
    with pytest.raises(sanitize.SanitizeError, match="off-curve"):
        sanitize.check_g1_affine(_limbs([1]), _limbs([3]), Q, "t", sample=1)


def test_montgomery_form_points(sanitizing):
    r = 1 << 256
    sanitize.check_g1_affine(
        _limbs([1 * r % Q]), _limbs([2 * r % Q]), Q, "t", mont=True
    )
    with pytest.raises(sanitize.SanitizeError, match="off-curve"):
        sanitize.check_g1_affine(
            _limbs([1 * r % Q]), _limbs([3 * r % Q]), Q, "t", mont=True
        )


def test_msm_entry_rejects_corrupt_points(sanitizing):
    """The armed tier trips at the MSM entry, before any device work."""
    import jax.numpy as jnp

    from noir_backend_using_gnark_tpu.ops import msm as M

    r = 1 << 256
    n = 4
    pts = M.AffineBatch(
        jnp.asarray(_limbs([1 * r % Q] * n)),
        jnp.asarray(_limbs([3 * r % Q] * n)),  # off-curve y
        jnp.zeros((n,), bool),
    )
    scalars = jnp.asarray(_limbs([1] * n))
    with pytest.raises(sanitize.SanitizeError, match="off-curve"):
        M.msm(pts, scalars)


# ---------------------------------------------------------------------------
# Sanitized end-to-end prove (the -race-tier analogue CI runs)
# ---------------------------------------------------------------------------


def test_prove_under_sanitizer(sanitizing):
    circuit = parse.parse_circuit((FIX / "acir_x_neq_y.json").read_text())
    witness = solver.solve(circuit, {1: 5, 2: 7})
    values = solver.dense_values(circuit, witness)
    pc = lowering.lower_to_plonk(circuit)
    assignment = lowering.build_assignment(pc, values)
    pk, vk = plonk_setup.setup(pc, kzg.generate_srs(32, 123456789))
    proof = plonk_prove.prove(pk, assignment, rng_seed=b"\x01" * 32)
    publics = [values[i - 1] for i in pc.public_witness_indices]
    assert plonk_verify.verify(vk, proof, publics)


# ---------------------------------------------------------------------------
# retry tier
# ---------------------------------------------------------------------------


def test_is_transient_classification():
    assert retry.is_transient(RuntimeError("remote_compile: read body: EOF"))
    assert retry.is_transient(OSError("Connection reset by peer"))
    assert retry.is_transient(
        RuntimeError(
            "INTERNAL: http://127.0.0.1:8083/remote_compile: read body: "
            "response body closed before all bytes were read"
        )
    )  # the exact round-3 bench killer (BENCH_r03 msm_2e24_error)
    assert not retry.is_transient(ValueError("witness unsatisfied"))
    # Anchored patterns (advisor r4): incidental substrings must NOT
    # classify as transient — a local pipe EOF, a message containing
    # "element 5023", or the word fragments of a 502/503 code.
    assert not retry.is_transient(EOFError())
    assert not retry.is_transient(ValueError("bad felt at element 5023"))
    assert not retry.is_transient(RuntimeError("EOF"))


def test_retry_recovers_transient():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("remote_compile: connection reset")
        return 42

    assert retry.retry_transient(flaky, "t", pause_s=0.0) == 42
    assert calls["n"] == 2


def test_retry_propagates_real_errors_immediately():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("constraint system unsatisfied")

    with pytest.raises(ValueError):
        retry.retry_transient(broken, "t", pause_s=0.0)
    assert calls["n"] == 1


def test_retry_gives_up_after_tries():
    calls = {"n": 0}

    def always_transient():
        calls["n"] += 1
        raise RuntimeError("503 service unavailable")

    with pytest.raises(RuntimeError):
        retry.retry_transient(always_transient, "t", tries=3, pause_s=0.0)
    assert calls["n"] == 3
