"""End-to-end PLONK tests: the reference fixtures proved and verified.

This is the TPU equivalent of the reference's Go demo main()
(gnark_backend_ffi/main.go:223-248): the same three inline ACIR
circuits, with setup -> prove -> verify plus negative cases.
"""

import pathlib

import pytest

from noir_backend_using_gnark_tpu.acir import lowering, parse, solver
from noir_backend_using_gnark_tpu.kzg import kzg
from noir_backend_using_gnark_tpu.plonk import prove as plonk_prove
from noir_backend_using_gnark_tpu.plonk import setup as plonk_setup
from noir_backend_using_gnark_tpu.plonk import verify as plonk_verify
from noir_backend_using_gnark_tpu.utils import bigint

FIX = pathlib.Path(__file__).parent / "fixtures"
R = bigint.FR_MODULUS

SRS_ALPHA = 123456789  # test-only toxic waste


@pytest.fixture(scope="module")
def srs():
    return kzg.generate_srs(32, SRS_ALPHA)


def _prove_and_verify(srs, fixture, initial_witness, seed=b"\x01" * 32):
    circuit = parse.parse_circuit((FIX / fixture).read_text())
    witness = solver.solve(circuit, initial_witness)
    values = solver.dense_values(circuit, witness)
    pc = lowering.lower_to_plonk(circuit)
    assignment = lowering.build_assignment(pc, values)
    assert lowering.check_satisfied(pc, assignment, R) == []
    pk, vk = plonk_setup.setup(pc, srs)
    proof = plonk_prove.prove(pk, assignment, rng_seed=seed)
    publics = [values[i - 1] for i in pc.public_witness_indices]
    return vk, proof, publics


def test_x_neq_y_proves(srs):
    vk, proof, publics = _prove_and_verify(srs, "acir_x_neq_y.json", {1: 0, 2: 1})
    assert plonk_verify.verify(vk, proof, publics)
    # Wrong public input must fail.
    assert not plonk_verify.verify(vk, proof, [(publics[0] + 1) % R])


def test_x_eq_y_proves(srs):
    vk, proof, publics = _prove_and_verify(srs, "acir_x_eq_y_pub.json", {1: 2, 2: 2})
    assert plonk_verify.verify(vk, proof, publics)


def test_priv_eq_proves_no_publics(srs):
    vk, proof, publics = _prove_and_verify(srs, "acir_priv_eq.json", {1: 3, 2: 3})
    assert publics == []
    assert plonk_verify.verify(vk, proof, [])


def test_tampered_proof_fails(srs):
    vk, proof, publics = _prove_and_verify(srs, "acir_x_neq_y.json", {1: 0, 2: 1})
    import dataclasses

    bad = dataclasses.replace(proof, evals=[(proof.evals[0] + 1) % R] + proof.evals[1:])
    assert not plonk_verify.verify(vk, bad, publics)
    bad2 = dataclasses.replace(proof, z_omega=(proof.z_omega + 1) % R)
    assert not plonk_verify.verify(vk, bad2, publics)


def test_deterministic_with_seed(srs):
    from noir_backend_using_gnark_tpu import artifacts

    vk1, proof1, _ = _prove_and_verify(srs, "acir_x_eq_y_pub.json", {1: 2, 2: 2})
    vk2, proof2, _ = _prove_and_verify(srs, "acir_x_eq_y_pub.json", {1: 2, 2: 2})
    assert artifacts.proof_to_bytes(proof1) == artifacts.proof_to_bytes(proof2)


def test_unsatisfied_witness_rejected(srs):
    # Proving with a witness that violates gates produces an invalid proof.
    circuit = parse.parse_circuit((FIX / "acir_x_eq_y_pub.json").read_text())
    pc = lowering.lower_to_plonk(circuit)
    bad_values = [2, 3, 0, 0, 0, 0]  # claims 2 == 3
    assignment = lowering.build_assignment(pc, bad_values)
    assert lowering.check_satisfied(pc, assignment, R) != []
    pk, vk = plonk_setup.setup(pc, kzg.generate_srs(32, SRS_ALPHA))
    proof = plonk_prove.prove(pk, assignment, rng_seed=b"\x02" * 32)
    publics = [bad_values[i - 1] for i in pc.public_witness_indices]
    assert not plonk_verify.verify(vk, proof, publics)


def test_pk_srs_fingerprint_mismatch_detected(srs):
    """VERDICT weak #8: proving with a different SRS than the pk was
    built against must fail loudly, not emit an unverifiable proof."""
    from noir_backend_using_gnark_tpu import artifacts
    from noir_backend_using_gnark_tpu.api import Backend
    from noir_backend_using_gnark_tpu.config import Config
    from noir_backend_using_gnark_tpu.errors import ProvingError

    circuit = parse.parse_circuit((FIX / "acir_x_neq_y.json").read_text())
    pc = lowering.lower_to_plonk(circuit)
    pk, vk = plonk_setup.setup(pc, srs)
    blob = artifacts.pk_to_bytes(pk)
    back = artifacts.pk_from_bytes(blob)
    assert back.srs_fingerprint == artifacts.srs_digest(srs)
    other = kzg.generate_srs(32, SRS_ALPHA + 1)
    assert artifacts.srs_digest(other) != artifacts.srs_digest(srs)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = d + "/srs.hex"
        artifacts.save_srs(other, path)
        backend = Backend(Config(srs_path=path, srs_size=32))
        witness = solver.solve(circuit, {1: 0, 2: 1})
        values = solver.dense_values(circuit, witness)
        with pytest.raises(ProvingError, match="different SRS"):
            backend.prove_with_pk(circuit, values, blob)


def test_bls12_381_proving_rejected():
    """Config(curve="bls12_381") must raise BackendError from every
    proving operation — the documented behavior (README; the
    reference's bls12_381 feature has no Go counterpart either,
    main.go:16-21)."""
    from noir_backend_using_gnark_tpu.api import Backend
    from noir_backend_using_gnark_tpu.acir import parse
    from noir_backend_using_gnark_tpu.config import Config
    from noir_backend_using_gnark_tpu.errors import BackendError

    circuit = parse.parse_circuit((FIX / "acir_x_eq_y_pub.json").read_text())
    b = Backend(Config(curve="bls12_381"))
    with pytest.raises(BackendError, match="bn254-only"):
        b.preprocess(circuit)
    with pytest.raises(BackendError, match="bn254-only"):
        b.prove_with_pk(circuit, [2, 2], b"")
    with pytest.raises(BackendError, match="bn254-only"):
        b.verify_with_vk(b"", [2], circuit, b"")
    # Introspection-only surfaces still work for either curve.
    assert b.np_language() == {"PLONKCSat": {"width": 3}}
