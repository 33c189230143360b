"""Native C++ runtime: parity with the pure-Python twins.

The native library (native/src/noirtpu_native.cpp) re-implements the
reference's host-side Rust/Go layers — the acvm pwg arithmetic
fixpoint, BuildSparseR1CS lowering, gate checking and the BE felt
codec. Every function is tested against the Python implementation on
randomized inputs and on all 15 reference programs.
"""

import os
import random

import numpy as np
import pytest

from noir_backend_using_gnark_tpu import cli, native
from noir_backend_using_gnark_tpu.acir import builder, lowering, model, solver
from noir_backend_using_gnark_tpu.utils import bigint

R = bigint.FR_MODULUS

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native runtime unavailable: {native.load_error()}"
)

PROGRAMS_DIR = os.path.join(os.path.dirname(__file__), "programs")


def random_circuit(rng, n_gates=30):
    """A random solvable circuit: chains of add/mul/inv gadgets over a
    few inputs, exercising mul terms, multi-linear gates and directives."""
    b = builder.CircuitBuilder()
    inputs = b.witnesses(3)
    initial = {w: rng.randrange(1, R) for w in inputs}
    pool = list(inputs)
    for _ in range(n_gates):
        kind = rng.randrange(4)
        x = pool[rng.randrange(len(pool))]
        y = pool[rng.randrange(len(pool))]
        if kind == 0:
            pool.append(b.add(x, y))
        elif kind == 1:
            pool.append(b.mul(x, y))
        elif kind == 2:
            pool.append(b.sub(x, y))
        else:
            pool.append(b.is_nonzero(x))
    return b.build(), initial


def _rand_felts(rng, n):
    return [rng.randrange(R) for _ in range(n)]


def test_field_ops_match_python(rng):
    a = _rand_felts(rng, 64)
    b = _rand_felts(rng, 64)
    A, B = native.ints_to_u64x4(a), native.ints_to_u64x4(b)
    assert native.u64x4_to_ints(native.fr_batch_mul(A, B)) == [
        x * y % R for x, y in zip(a, b)
    ]
    assert native.u64x4_to_ints(native.fr_batch_add(A, B)) == [
        (x + y) % R for x, y in zip(a, b)
    ]
    assert native.u64x4_to_ints(native.fr_batch_inv(A)) == [
        pow(x, -1, R) for x in a
    ]


def test_inv_of_zero_is_zero():
    z = native.ints_to_u64x4([0, 1])
    assert native.u64x4_to_ints(native.fr_batch_inv(z)) == [0, 1]


def test_felt_codec_roundtrip(rng):
    vals = _rand_felts(rng, 32) + [0, 1, R - 1]
    arr = native.ints_to_u64x4(vals)
    be = native.felts_to_be(arr)
    assert be == b"".join(v.to_bytes(32, "big") for v in vals)
    assert native.u64x4_to_ints(native.felts_from_be(be)) == vals


def test_felt_codec_reduces_like_setbytes():
    # gnark Element.SetBytes reduces mod r (helpers.go:13-22).
    big = (1 << 256) - 12345
    out = native.u64x4_to_ints(native.felts_from_be(big.to_bytes(32, "big")))
    assert out == [big % R]


def _load_all_programs():
    out = []
    for name in sorted(os.listdir(PROGRAMS_DIR)):
        pkg = os.path.join(PROGRAMS_DIR, name)
        if not os.path.isdir(pkg):
            continue
        circuit, abi = cli._load_package(pkg)
        initial = cli._toml_witness(os.path.join(pkg, "Prover.toml"), abi)
        out.append((name, circuit, initial))
    return out


@pytest.mark.parametrize("name,circuit,initial", _load_all_programs(),
                         ids=lambda p: p if isinstance(p, str) else "")
def test_solver_parity_on_programs(name, circuit, initial, monkeypatch):
    monkeypatch.setattr(solver, "_FORCE_PYTHON", True)
    wit_py = solver.solve(circuit, dict(initial))
    monkeypatch.setattr(solver, "_FORCE_PYTHON", False)
    wit_nat = solver.solve(circuit, dict(initial))
    # The native map may contain extra solved-by-the-way entries with the
    # same values; every Python-solved witness must match.
    for k, v in wit_py.items():
        assert wit_nat[k] == v, (name, k)


@pytest.mark.parametrize("name,circuit,initial", _load_all_programs(),
                         ids=lambda p: p if isinstance(p, str) else "")
def test_lowering_parity_on_programs(name, circuit, initial, monkeypatch):
    monkeypatch.setattr(lowering, "_FORCE_PYTHON", True)
    pc_py = lowering.lower_to_plonk(circuit)
    monkeypatch.setattr(lowering, "_FORCE_PYTHON", False)
    pc_nat = lowering.lower_to_plonk(circuit)
    assert [v % R for v in pc_py.q_l] == list(pc_nat.q_l)
    assert [v % R for v in pc_py.q_r] == list(pc_nat.q_r)
    assert [v % R for v in pc_py.q_o] == list(pc_nat.q_o)
    assert [v % R for v in pc_py.q_m] == list(pc_nat.q_m)
    assert [v % R for v in pc_py.q_c] == list(pc_nat.q_c)
    assert list(pc_py.wire_a) == list(pc_nat.wire_a)
    assert list(pc_py.wire_b) == list(pc_nat.wire_b)
    assert list(pc_py.wire_c) == list(pc_nat.wire_c)


def test_check_satisfied_parity(rng, monkeypatch):
    # A random satisfiable circuit plus a perturbed assignment.
    circuit, initial = random_circuit(rng, n_gates=40)
    witness = solver.solve(circuit, initial)
    values = solver.dense_values(circuit, witness)
    pc = lowering.lower_to_plonk(circuit)
    assignment = lowering.build_assignment(pc, values)

    monkeypatch.setattr(lowering, "_FORCE_PYTHON", True)
    ok_py = lowering.check_satisfied(pc, assignment, R)
    monkeypatch.setattr(lowering, "_FORCE_PYTHON", False)
    ok_nat = lowering.check_satisfied(pc, assignment, R)
    assert ok_py == ok_nat == []

    bad = list(assignment)
    bad[-1] = (bad[-1] + 1) % R
    monkeypatch.setattr(lowering, "_FORCE_PYTHON", True)
    bad_py = lowering.check_satisfied(pc, bad, R)
    monkeypatch.setattr(lowering, "_FORCE_PYTHON", False)
    bad_nat = lowering.check_satisfied(pc, bad, R)
    assert bad_py == bad_nat


def test_solver_contradiction_raises():
    # 1*w1 + 1 == 0 with w1 fixed to 0: unsatisfiable.
    c = model.Circuit(
        current_witness_index=1,
        opcodes=(
            model.ArithmeticOpcode(
                mul_terms=(), linear_combinations=(model.SimpleTerm(1, 1),), q_c=1
            ),
        ),
        public_inputs=(),
    )
    from noir_backend_using_gnark_tpu.errors import OpcodeResolutionError

    with pytest.raises(OpcodeResolutionError):
        solver.solve(c, {1: 0})


def test_random_circuits_solve_and_check(rng, monkeypatch):
    for trial in range(5):
        circuit, initial = random_circuit(rng, n_gates=25)
        monkeypatch.setattr(solver, "_FORCE_PYTHON", True)
        wit_py = solver.solve(circuit, dict(initial))
        monkeypatch.setattr(solver, "_FORCE_PYTHON", False)
        wit_nat = solver.solve(circuit, dict(initial))
        for k, v in wit_py.items():
            assert wit_nat[k] == v
        pc = lowering.lower_to_plonk(circuit)
        assignment = lowering.build_assignment(
            pc, solver.dense_values(circuit, wit_nat)
        )
        assert lowering.check_satisfied(pc, assignment, R) == []
