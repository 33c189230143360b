"""Drop-in gnark v0.8 conformance vectors (tests/fixtures/gnark/).

Each test consumes one vector file produced by a REAL gnark build via
``tools/gen_gnark_vectors.go`` (format spec: tests/fixtures/gnark/
README.md) and SKIPS with an explanatory message when the file is
absent — this environment cannot generate them (no Go toolchain, zero
egress; CONFORMANCE.md §4). Dropping the files in closes byte-level
conformance with no code changes.
"""

import json
import pathlib

import pytest

from noir_backend_using_gnark_tpu.formats import gnark as GF
from noir_backend_using_gnark_tpu.kzg import kzg
from noir_backend_using_gnark_tpu.utils import bigint

VEC = pathlib.Path(__file__).parent / "fixtures" / "gnark"
R = bigint.FR_MODULUS


def _load(name: str) -> dict:
    path = VEC / name
    if not path.exists():
        pytest.skip(
            f"gnark vector {name} not present — generate with "
            "tools/gen_gnark_vectors.go on a machine with Go "
            "(see tests/fixtures/gnark/README.md)"
        )
    data = json.loads(path.read_text())
    assert data.get("format") == 1, f"{name}: unknown vector format"
    return data


def test_felt_vectors():
    data = _load("felts.json")
    for vec in data["vectors"]:
        v = int(vec["value"])
        assert GF.fr_bytes(v).hex() == vec["be_hex"], f"felt {v}"
        got, _ = GF.fr_read(bytes.fromhex(vec["be_hex"]), 0)
        assert got == v % R


def test_srs_vector():
    data = _load("srs.json")
    srs = kzg.generate_srs(int(data["size"]), int(data["alpha"]))
    assert GF.srs_to_gnark_bytes(srs).hex() == data["srs_hex"]


def _setup_from_vector(data):
    from noir_backend_using_gnark_tpu.acir import lowering, parse
    from noir_backend_using_gnark_tpu.plonk import setup as ps

    circuit = parse.parse_circuit(json.dumps(data["acir"]))
    pc = lowering.lower_to_plonk(circuit)
    srs = kzg.generate_srs(int(data["srs"]["size"]), int(data["srs"]["alpha"]))
    return ps.setup(pc, srs), srs


@pytest.mark.parametrize("circuit", ["x_neq_y", "x_eq_y_pub", "priv_eq"])
def test_vk_vectors_byte_identical(circuit):
    data = _load(f"vk_{circuit}.json")
    (pk, vk), _srs = _setup_from_vector(data)
    assert GF.vk_to_gnark_bytes(vk).hex() == data["vk_hex"], (
        "vk bytes diverge from gnark Setup — expected while the "
        "permutation/domain construction is unvalidated (README)"
    )


@pytest.mark.parametrize("circuit", ["x_neq_y", "x_eq_y_pub", "priv_eq"])
def test_gnark_proofs_cross_verify(circuit):
    """A proof emitted by REAL gnark must verify under our verifier —
    BASELINE.md bit-exactness criterion (b)."""
    from noir_backend_using_gnark_tpu.plonk import gnark_protocol

    data = _load(f"proof_{circuit}.json")
    srs = kzg.generate_srs(int(data["srs"]["size"]), int(data["srs"]["alpha"]))
    vk = GF.vk_from_gnark_bytes(bytes.fromhex(data["vk_hex"]), srs=srs)
    proof = GF.proof_from_gnark_bytes(bytes.fromhex(data["proof_hex"]))
    publics = [int(p) for p in data["public_inputs"]]
    assert gnark_protocol.verify(vk, proof, publics)


@pytest.mark.parametrize("circuit", ["x_neq_y", "x_eq_y_pub", "priv_eq"])
def test_transcript_challenge_replay(circuit):
    """Optional: if the vector carries the prover's Fiat-Shamir
    challenges (patched gnark build), our transcript replay must
    reproduce them exactly."""
    from noir_backend_using_gnark_tpu.plonk import gnark_protocol

    data = _load(f"proof_{circuit}.json")
    challenges = data.get("challenges")
    if not challenges:
        pytest.skip("vector has no challenge trace (needs patched gnark)")
    srs = kzg.generate_srs(int(data["srs"]["size"]), int(data["srs"]["alpha"]))
    vk = GF.vk_from_gnark_bytes(bytes.fromhex(data["vk_hex"]), srs=srs)
    proof = GF.proof_from_gnark_bytes(bytes.fromhex(data["proof_hex"]))
    publics = [int(p) for p in data["public_inputs"]]
    gamma, beta, alpha, zeta = gnark_protocol.replay_challenges(
        vk, publics, proof
    )
    assert gamma == int(challenges["gamma"]) % R
    assert beta == int(challenges["beta"]) % R
    assert alpha == int(challenges["alpha"]) % R
    assert zeta == int(challenges["zeta"]) % R
