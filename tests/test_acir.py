"""ACIR parser / lowering / witness-solver tests against the reference's
inline fixtures (gnark_backend_ffi/main.go:223-248)."""

import json
import pathlib

import pytest

from noir_backend_using_gnark_tpu import errors
from noir_backend_using_gnark_tpu.acir import lowering, model, parse, solver
from noir_backend_using_gnark_tpu.utils import bigint

FIX = pathlib.Path(__file__).parent / "fixtures"
R = bigint.FR_MODULUS
MINUS_ONE = R - 1


def load(name):
    return parse.parse_circuit((FIX / name).read_text())


def test_parse_x_neq_y_fixture():
    c = load("acir_x_neq_y.json")
    assert c.current_witness_index == 6
    assert c.public_inputs == (2,)
    assert len(c.opcodes) == 5
    op0 = c.opcodes[0]
    assert isinstance(op0, model.ArithmeticOpcode)
    assert op0.mul_terms == ()
    assert [(t.coefficient, t.variable) for t in op0.linear_combinations] == [
        (1, 1),
        (MINUS_ONE, 2),
        (MINUS_ONE, 3),
    ]
    assert op0.q_c == 0
    assert isinstance(c.opcodes[1], model.Directive)
    assert c.opcodes[1].kind == "Invert"
    op2 = c.opcodes[2]
    assert op2.mul_terms[0] == model.MulTerm(1, 3, 4)


def test_roundtrip_codec():
    for name in ("acir_x_neq_y.json", "acir_x_eq_y_pub.json", "acir_priv_eq.json"):
        c = load(name)
        again = parse.parse_circuit(parse.circuit_to_json(c))
        assert again == c


def test_circuit_size_formula():
    # #opcodes + per-arith (num_mul_terms + 1)
    # (src/gnark_backend_wrapper/mod.rs:56-73)
    c = load("acir_x_neq_y.json")
    assert c.circuit_size() == 5 + (0 + 1) + (1 + 1) + (1 + 1) + (0 + 1)


def test_parse_errors():
    with pytest.raises(errors.CircuitParseError):
        parse.parse_circuit("not json")
    with pytest.raises(errors.CircuitParseError):
        parse.parse_circuit('{"opcodes": []}')
    with pytest.raises(errors.CircuitParseError):
        parse.parse_circuit(
            '{"current_witness_index":1,"opcodes":[{"Bogus":{}}],"public_inputs":[]}'
        )


def test_solver_x_neq_y():
    c = load("acir_x_neq_y.json")
    w = solver.solve(c, {1: 0, 2: 1})
    # Expected dense values from the reference fixture run:
    # {0, 1, -1, -1, 1, 0} (main.go:234)
    assert solver.dense_values(c, w) == [0, 1, MINUS_ONE, MINUS_ONE, 1, 0]


def test_solver_x_eq_y():
    c = load("acir_x_eq_y_pub.json")
    w = solver.solve(c, {1: 2, 2: 2})
    assert solver.dense_values(c, w) == [2, 2, 0, 0, 0, 0]  # main.go:240


def test_solver_priv_eq():
    c = load("acir_priv_eq.json")
    w = solver.solve(c, {1: 3, 2: 3})
    assert solver.dense_values(c, w) == [3, 3, 0, 0, 0, 0]  # main.go:246


def test_solver_detects_unsatisfied():
    c = load("acir_x_neq_y.json")
    # x == y makes the final assertion 1 != 0 fail.
    with pytest.raises(errors.OpcodeResolutionError):
        solver.solve(c, {1: 5, 2: 5})


def test_lowering_structure():
    c = load("acir_x_neq_y.json")
    pc = lowering.lower_to_plonk(c)
    # 4 arithmetic gates (directive skipped), 1 public var, 6 total vars.
    assert pc.n_gates == 4
    assert pc.nb_public == 1
    assert pc.nb_vars == 6
    # Witness 2 (public) is cs variable 0; others follow in order.
    assert pc.index_map[2] == 0
    assert pc.index_map[1] == 1
    assert pc.public_witness_indices == [2]


def test_lowering_satisfied():
    c = load("acir_x_neq_y.json")
    pc = lowering.lower_to_plonk(c)
    values = [0, 1, MINUS_ONE, MINUS_ONE, 1, 0]
    assignment = lowering.build_assignment(pc, values)
    assert lowering.check_satisfied(pc, assignment, R) == []
    # Tampered witness violates gates.
    bad = list(values)
    bad[4] = 0
    assert lowering.check_satisfied(pc, lowering.build_assignment(pc, bad), R) != []


def test_solver_blackbox_hashes():
    # Circuit: witness 1 (8 bits) -> SHA256 -> outputs 2..33.
    import hashlib

    call = model.BlackBoxFuncCall(
        model.BlackBoxFunc.SHA256,
        (model.FunctionInput(1, 8),),
        tuple(range(2, 34)),
    )
    c = model.Circuit(34, (call,), ())
    w = solver.solve(c, {1: 0xAB})
    want = hashlib.sha256(bytes([0xAB])).digest()
    assert [w[i] for i in range(2, 34)] == list(want)


def test_solver_range_and_logic():
    ops = (
        model.BlackBoxFuncCall(
            model.BlackBoxFunc.RANGE, (model.FunctionInput(1, 8),), ()
        ),
        model.BlackBoxFuncCall(
            model.BlackBoxFunc.AND,
            (model.FunctionInput(1, 8), model.FunctionInput(2, 8)),
            (3,),
        ),
        model.BlackBoxFuncCall(
            model.BlackBoxFunc.XOR,
            (model.FunctionInput(1, 8), model.FunctionInput(2, 8)),
            (4,),
        ),
    )
    c = model.Circuit(5, ops, ())
    w = solver.solve(c, {1: 0b1100, 2: 0b1010})
    assert w[3] == 0b1000
    assert w[4] == 0b0110
    with pytest.raises(errors.OpcodeResolutionError):
        solver.solve(c, {1: 300, 2: 0})  # 300 >= 2^8 fails RANGE


def test_ecdsa_blackbox():
    from noir_backend_using_gnark_tpu.acir import blackbox

    # Self-generated secp256k1 signature (deterministic values).
    d = 0x1234567890DEADBEEF
    k = 0xABCDEF0123456789
    z = int.from_bytes(b"\x11" * 32, "big")
    n = blackbox._SECP_N
    pub = blackbox._secp_mul(blackbox._SECP_G, d)
    r = blackbox._secp_mul(blackbox._SECP_G, k)[0] % n
    s = pow(k, -1, n) * (z + r * d) % n
    sig = r.to_bytes(32, "big") + s.to_bytes(32, "big")
    assert blackbox.ecdsa_secp256k1_verify(
        pub[0].to_bytes(32, "big"), pub[1].to_bytes(32, "big"), sig, b"\x11" * 32
    )
    assert not blackbox.ecdsa_secp256k1_verify(
        pub[0].to_bytes(32, "big"), pub[1].to_bytes(32, "big"), sig, b"\x22" * 32
    )
