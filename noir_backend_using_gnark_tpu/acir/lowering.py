"""ACIR lowering: to the PLONK gate table and to raw R1CS (Groth16 path).

PLONK lowering mirrors the reference's
``BuildSparseR1CS``/``handleArithmeticOpcode``
(gnark_backend_ffi/backend/plonk/sparse_r1cs.go:18-107) including its
deliberate quirks, so that circuits accepted there produce equivalent
constraint systems here:

  * only ``mul_terms[0]`` is used — the lowering assumes at most one mul
    term per gate (README.md:82 of the reference);
  * the gate's (xa, xb) wires come from the mul term, but are
    *overwritten* by the first two linear terms when 2 or 3 linear
    combinations are present (sparse_r1cs.go:63-90) — i.e. the mul term
    is assumed to multiply exactly those wires;
  * 1 linear term binds (qO, xc); 2 bind (qL,xa),(qR,xb); 3 bind all;
  * unset wire slots point at cs variable 0 with coefficient 0;
  * black-box function opcodes emit NO constraints (components.go:1-41
    stubs — support is witness-side only) and directives are skipped
    (sparse_r1cs.go:36-37).

Variable registration mirrors ``HandleValues``
(backend/common.go:45-76): walk the dense 1-based values vector, first
registering the public inputs (in values order), then the rest as
secrets. The reference's duplicate-secret bug for >1 public inputs
(common.go:59-74 appends a secret once per non-matching public input) is
FIXED here — for the <=1-public-input programs the suites exercise the
two are identical; for >1 publics the reference would build a
nonsensical witness.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import UnsupportedOpcodeError
from . import model

#: test hook: force the pure-Python lowering/check paths.
_FORCE_PYTHON = False


@dataclass
class PlonkCircuit:
    """A lowered PLONK constraint system over Fr.

    Selectors are host ints (converted to device arrays by
    plonk.setup/prove); wires are cs-variable indices. The gate equation
    is qL*a + qR*b + qO*c + qM*(a*b) + qC == 0 per gate.
    """

    nb_public: int
    nb_vars: int  # total cs variables (publics then secrets)
    q_l: list
    q_r: list
    q_o: list
    q_m: list
    q_c: list
    wire_a: np.ndarray  # int32 (n_gates,)
    wire_b: np.ndarray
    wire_c: np.ndarray
    index_map: dict  # ACIR witness index (1-based) -> cs variable index
    public_witness_indices: list  # ACIR witness index per public var, in order

    @property
    def n_gates(self) -> int:
        return len(self.q_l)


def register_variables(circuit: model.Circuit):
    """Mirror of HandleValues' registration order (common.go:45-76).

    Returns (index_map, public_witness_indices, nb_vars). Walks the
    1-based dense positions 1..=current_witness_index: publics first (in
    position order), then everything else as secrets.
    """
    n = circuit.dense_values_len
    publics = set(circuit.public_inputs)
    index_map: dict[int, int] = {}
    public_witness_indices: list[int] = []
    next_idx = 0
    for i in range(1, n + 1):
        if i in publics:
            index_map[i] = next_idx
            public_witness_indices.append(i)
            next_idx += 1
    for i in range(1, n + 1):
        if i not in publics:
            index_map[i] = next_idx
            next_idx += 1
    return index_map, public_witness_indices, next_idx


def lower_to_plonk(circuit: model.Circuit) -> PlonkCircuit:
    """ACIR -> PLONK gate table (BuildSparseR1CS equivalent).

    Dispatches the per-opcode walk to the native C++ runtime when
    available (native/src/noirtpu_native.cpp::noirtpu_lower_plonk, the
    same arity rules); the Python loop below is the reference twin.
    """
    from .. import native

    index_map, public_witness_indices, nb_vars = register_variables(circuit)

    if native.available() and not _FORCE_PYTHON:
        packed = native.PackedArithmetic(circuit)
        imap = np.zeros(packed.n_wit, np.int32)
        for w, v in index_map.items():
            imap[w] = v
        ql_n, qr_n, qo_n, qm_n, qc_n, xa_n, xb_n, xc_n = native.lower_plonk(
            packed, imap
        )
        return PlonkCircuit(
            nb_public=len(public_witness_indices),
            nb_vars=nb_vars,
            q_l=native.u64x4_to_ints(ql_n),
            q_r=native.u64x4_to_ints(qr_n),
            q_o=native.u64x4_to_ints(qo_n),
            q_m=native.u64x4_to_ints(qm_n),
            q_c=native.u64x4_to_ints(qc_n),
            wire_a=xa_n,
            wire_b=xb_n,
            wire_c=xc_n,
            index_map=index_map,
            public_witness_indices=public_witness_indices,
        )

    q_l, q_r, q_o, q_m, q_c = [], [], [], [], []
    wa, wb, wc = [], [], []

    for op in circuit.opcodes:
        if isinstance(op, model.ArithmeticOpcode):
            xa = xb = xc = 0
            ql = qr = qo = qm = 0

            if op.mul_terms:
                # Only mul_terms[0]; qM1=coeff, qM2=1 (sparse_r1cs.go:49-55).
                mt = op.mul_terms[0]
                qm = mt.coefficient
                xa = index_map.get(mt.multiplicand, 0)
                xb = index_map.get(mt.multiplier, 0)

            lin = op.linear_combinations
            if len(lin) == 1:
                qo = lin[0].coefficient
                xc = index_map.get(lin[0].variable, 0)
            elif len(lin) == 2:
                ql = lin[0].coefficient
                xa = index_map.get(lin[0].variable, 0)
                qr = lin[1].coefficient
                xb = index_map.get(lin[1].variable, 0)
            elif len(lin) == 3:
                ql = lin[0].coefficient
                xa = index_map.get(lin[0].variable, 0)
                qr = lin[1].coefficient
                xb = index_map.get(lin[1].variable, 0)
                qo = lin[2].coefficient
                xc = index_map.get(lin[2].variable, 0)
            elif len(lin) > 3:
                raise UnsupportedOpcodeError(
                    f"arithmetic opcode with {len(lin)} linear terms exceeds PLONK width 3"
                )

            q_l.append(ql)
            q_r.append(qr)
            q_o.append(qo)
            q_m.append(qm)
            q_c.append(op.q_c)
            wa.append(xa)
            wb.append(xb)
            wc.append(xc)
        elif isinstance(op, model.BlackBoxFuncCall):
            # No constraints emitted — witness-side only (components.go stubs).
            continue
        elif isinstance(op, model.Directive):
            continue
        else:
            raise UnsupportedOpcodeError(f"unknown opcode type {type(op).__name__}")

    return PlonkCircuit(
        nb_public=len(public_witness_indices),
        nb_vars=nb_vars,
        q_l=q_l,
        q_r=q_r,
        q_o=q_o,
        q_m=q_m,
        q_c=q_c,
        wire_a=np.asarray(wa, np.int32),
        wire_b=np.asarray(wb, np.int32),
        wire_c=np.asarray(wc, np.int32),
        index_map=index_map,
        public_witness_indices=public_witness_indices,
    )


def build_assignment(pc: PlonkCircuit, values: list) -> list:
    """Dense ACIR values (1-based, length current_witness_index) -> cs
    variable assignment [publics..., secrets...] (BuildWitnesses order,
    common.go:22-43)."""
    out = [0] * pc.nb_vars
    for wit_idx, var_idx in pc.index_map.items():
        if wit_idx - 1 < len(values):
            out[var_idx] = values[wit_idx - 1]
    return out


def check_satisfied(pc: PlonkCircuit, assignment: list, modulus: int):
    """Debug helper: verify every gate equation over the assignment.

    Returns the list of violated gate indices (empty == satisfied).
    Native fast path for the Fr modulus (noirtpu_check_satisfied).
    """
    from .. import native
    from ..utils import bigint

    if (
        native.available()
        and not _FORCE_PYTHON
        and modulus == bigint.FR_MODULUS
        and pc.n_gates > 0
    ):
        return native.check_satisfied(
            native.ints_to_u64x4([v % modulus for v in pc.q_l]),
            native.ints_to_u64x4([v % modulus for v in pc.q_r]),
            native.ints_to_u64x4([v % modulus for v in pc.q_o]),
            native.ints_to_u64x4([v % modulus for v in pc.q_m]),
            native.ints_to_u64x4([v % modulus for v in pc.q_c]),
            pc.wire_a, pc.wire_b, pc.wire_c,
            native.ints_to_u64x4([v % modulus for v in assignment]),
        )

    bad = []
    for g in range(pc.n_gates):
        a = assignment[pc.wire_a[g]]
        b = assignment[pc.wire_b[g]]
        c = assignment[pc.wire_c[g]]
        v = (
            pc.q_l[g] * a + pc.q_r[g] * b + pc.q_o[g] * c + pc.q_m[g] * a * b + pc.q_c[g]
        ) % modulus
        if v != 0:
            bad.append(g)
    return bad


# ---------------------------------------------------------------------------
# Groth16 raw R1CS (the reference's WIP path, §2.9)
# ---------------------------------------------------------------------------


@dataclass
class RawR1CS:
    """Mirror of the Rust RawR1CS (src/gnark_backend_wrapper/groth16/
    acir_to_r1cs.rs:18-28): gates + metadata, ready for Groth16 lowering."""

    gates: list  # list[model.ArithmeticOpcode]
    public_inputs: tuple
    values: list
    num_variables: int
    num_constraints: int


def lower_to_raw_r1cs(circuit: model.Circuit, values: list) -> RawR1CS:
    """ACIR -> RawR1CS (acir_to_r1cs.rs:62-93 semantics: one RawGate per
    arithmetic opcode; num_variables = current_witness_index + 1;
    num_constraints = the circuit-size formula)."""
    gates = [op for op in circuit.opcodes if isinstance(op, model.ArithmeticOpcode)]
    num_constraints = len(circuit.opcodes) + sum(len(g.mul_terms) + 1 for g in gates)
    return RawR1CS(
        gates=gates,
        public_inputs=circuit.public_inputs,
        values=list(values),
        num_variables=circuit.current_witness_index + 1,
        num_constraints=num_constraints,
    )
