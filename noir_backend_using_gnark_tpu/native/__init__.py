"""ctypes bindings for the native C++ runtime (src/noirtpu_native.cpp).

Native equivalents of the reference's Rust/Go host layers — witness
solving (acvm pwg over arithmetic opcodes, src/backend.rs:109-170 +
acvm's default loop), ACIR->PLONK lowering (sparse_r1cs.go:44-107),
gate checking, and the BE felt codec (serialize.rs:10-47,
helpers.go:13-33). Every entry point has a pure-Python twin in
``acir/`` / ``utils/bigint.py``; :func:`available` gates dispatch so
the framework works (slower) on boxes without a C++ toolchain.

Felts cross this ABI as numpy ``uint64`` arrays of shape (n, 4):
little-endian 64-bit limbs, canonical (non-Montgomery) values.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_load_error: str | None = None

_U64P = ctypes.POINTER(ctypes.c_uint64)
_U32P = ctypes.POINTER(ctypes.c_uint32)
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_longlong)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        if os.environ.get("NOIRTPU_DISABLE_NATIVE"):
            _load_error = "disabled by NOIRTPU_DISABLE_NATIVE"
            return None
        try:
            from . import build

            lib = ctypes.CDLL(build.build())
        except (RuntimeError, OSError) as e:
            _load_error = str(e)
            return None
        lib.noirtpu_abi_version.restype = ctypes.c_int
        if lib.noirtpu_abi_version() != 1:
            _load_error = "ABI version mismatch"
            return None
        lib.noirtpu_solve_arithmetic.restype = ctypes.c_longlong
        lib.noirtpu_solve_arithmetic.argtypes = [
            ctypes.c_longlong, _I64P, _U64P, _U32P, _U32P,
            _I64P, _U64P, _U32P, _U64P,
            ctypes.c_longlong, _U64P, _U8P, _U8P, _I64P,
        ]
        lib.noirtpu_check_satisfied.restype = ctypes.c_longlong
        lib.noirtpu_check_satisfied.argtypes = [
            ctypes.c_longlong, _U64P, _U64P, _U64P, _U64P, _U64P,
            _I32P, _I32P, _I32P, ctypes.c_longlong, _U64P, _I64P,
        ]
        lib.noirtpu_lower_plonk.restype = ctypes.c_longlong
        lib.noirtpu_lower_plonk.argtypes = [
            ctypes.c_longlong, _I64P, _U64P, _U32P, _U32P,
            _I64P, _U64P, _U32P, _U64P,
            ctypes.c_longlong, _I32P,
            _U64P, _U64P, _U64P, _U64P, _U64P, _I32P, _I32P, _I32P,
        ]
        lib.noirtpu_felts_to_be.restype = None
        lib.noirtpu_felts_to_be.argtypes = [ctypes.c_longlong, _U64P, _U8P]
        lib.noirtpu_felts_from_be.restype = None
        lib.noirtpu_felts_from_be.argtypes = [ctypes.c_longlong, _U8P, _U64P]
        for name in ("noirtpu_fr_batch_mul", "noirtpu_fr_batch_add"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_longlong, _U64P, _U64P, _U64P]
        for name in ("noirtpu_fr_batch_inv", "noirtpu_fr_batch_sub"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = (
                [ctypes.c_longlong, _U64P, _U64P]
                if name.endswith("inv")
                else [ctypes.c_longlong, _U64P, _U64P, _U64P]
            )
        lib.noirtpu_fr_powers.restype = None
        lib.noirtpu_fr_powers.argtypes = [ctypes.c_longlong, _U64P, _U64P, _U64P]
        lib.noirtpu_spmv_fr.restype = ctypes.c_longlong
        lib.noirtpu_spmv_fr.argtypes = [
            ctypes.c_longlong, _I64P, _U32P, _U64P,
            ctypes.c_longlong, _U64P, _U64P, ctypes.c_int,
        ]
        lib.noirtpu_spmv_t_fr.restype = ctypes.c_longlong
        lib.noirtpu_spmv_t_fr.argtypes = [
            ctypes.c_longlong, _I64P, _U32P, _U64P,
            _U64P, ctypes.c_longlong, _U64P,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _load_error


# ---------------------------------------------------------------------------
# felt packing helpers
# ---------------------------------------------------------------------------


def ints_to_u64x4(values) -> np.ndarray:
    """Python ints -> (n, 4) uint64 LE-limb array."""
    out = np.empty((len(values), 4), np.uint64)
    mask = (1 << 64) - 1
    for i, v in enumerate(values):
        v = int(v)
        out[i, 0] = v & mask
        out[i, 1] = (v >> 64) & mask
        out[i, 2] = (v >> 128) & mask
        out[i, 3] = (v >> 192) & mask
    return out


def u64x4_to_ints(arr: np.ndarray) -> list[int]:
    arr = np.ascontiguousarray(arr, np.uint64)
    return [
        int(row[0]) | (int(row[1]) << 64) | (int(row[2]) << 128) | (int(row[3]) << 192)
        for row in arr
    ]


def _p(a, typ):
    return a.ctypes.data_as(typ)


# ---------------------------------------------------------------------------
# Packed circuit (built once per Circuit, reused across solve calls)
# ---------------------------------------------------------------------------


class PackedArithmetic:
    """Arithmetic opcodes of a Circuit flattened into the native ABI
    layout. ``op_index[i]`` records each packed op's position in
    ``circuit.opcodes`` for error reporting."""

    def __init__(self, circuit):
        from ..acir import model

        ops = [
            (i, op)
            for i, op in enumerate(circuit.opcodes)
            if isinstance(op, model.ArithmeticOpcode)
        ]
        self.op_index = [i for i, _ in ops]
        n = len(ops)
        mt_coeffs, mt_a, mt_b, mt_off = [], [], [], [0]
        lt_coeffs, lt_var, lt_off = [], [], [0]
        qcs = []
        for _, op in ops:
            for mt in op.mul_terms:
                mt_coeffs.append(mt.coefficient)
                mt_a.append(mt.multiplicand)
                mt_b.append(mt.multiplier)
            mt_off.append(len(mt_a))
            for st in op.linear_combinations:
                lt_coeffs.append(st.coefficient)
                lt_var.append(st.variable)
            lt_off.append(len(lt_var))
            qcs.append(op.q_c)
        self.n_ops = n
        self.mt_off = np.asarray(mt_off, np.int64)
        self.mt_coeff = ints_to_u64x4(mt_coeffs)
        self.mt_a = np.asarray(mt_a, np.uint32)
        self.mt_b = np.asarray(mt_b, np.uint32)
        self.lt_off = np.asarray(lt_off, np.int64)
        self.lt_coeff = ints_to_u64x4(lt_coeffs)
        self.lt_var = np.asarray(lt_var, np.uint32)
        self.qc = ints_to_u64x4(qcs)
        # 1-based ACIR witness ids; slot 0 exists but is never used.
        self.n_wit = circuit.current_witness_index + 1


def solve_arithmetic(packed: PackedArithmetic, values: np.ndarray,
                     known: np.ndarray, op_done: np.ndarray) -> int:
    """One native fixpoint pass. values (n_wit,4) u64 / known (n_wit,) u8
    / op_done (n_ops,) u8 are updated in place. Returns the number of
    still-unsolved arithmetic opcodes; raises on contradiction."""
    from ..errors import OpcodeResolutionError

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_load_error}")
    err = np.zeros(1, np.int64)
    rc = lib.noirtpu_solve_arithmetic(
        packed.n_ops, _p(packed.mt_off, _I64P), _p(packed.mt_coeff, _U64P),
        _p(packed.mt_a, _U32P), _p(packed.mt_b, _U32P),
        _p(packed.lt_off, _I64P), _p(packed.lt_coeff, _U64P),
        _p(packed.lt_var, _U32P), _p(packed.qc, _U64P),
        packed.n_wit, _p(values, _U64P), _p(known, _U8P), _p(op_done, _U8P),
        _p(err, _I64P),
    )
    if rc == -1:
        raise OpcodeResolutionError(
            f"unsatisfied arithmetic constraint at opcode "
            f"{packed.op_index[int(err[0])]}"
        )
    if rc == -2:
        raise OpcodeResolutionError(
            f"witness index out of range in opcode {packed.op_index[int(err[0])]}"
        )
    return int(rc)


def lower_plonk(packed: PackedArithmetic, index_map: np.ndarray):
    """Native gate-table lowering. index_map: (n_wit,) int32, 1-based
    ACIR witness -> cs variable. Returns (ql,qr,qo,qm,qc (n,4) u64,
    xa,xb,xc (n,) int32)."""
    from ..errors import UnsupportedOpcodeError

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_load_error}")
    n = packed.n_ops
    ql, qr, qo, qm, qc = (np.zeros((n, 4), np.uint64) for _ in range(5))
    xa, xb, xc = (np.zeros(n, np.int32) for _ in range(3))
    rc = lib.noirtpu_lower_plonk(
        n, _p(packed.mt_off, _I64P), _p(packed.mt_coeff, _U64P),
        _p(packed.mt_a, _U32P), _p(packed.mt_b, _U32P),
        _p(packed.lt_off, _I64P), _p(packed.lt_coeff, _U64P),
        _p(packed.lt_var, _U32P), _p(packed.qc, _U64P),
        packed.n_wit, _p(index_map, _I32P),
        _p(ql, _U64P), _p(qr, _U64P), _p(qo, _U64P), _p(qm, _U64P),
        _p(qc, _U64P), _p(xa, _I32P), _p(xb, _I32P), _p(xc, _I32P),
    )
    if rc != 0:
        op = packed.op_index[int(-rc - 1)]
        raise UnsupportedOpcodeError(
            f"arithmetic opcode {op} exceeds PLONK width 3"
        )
    return ql, qr, qo, qm, qc, xa, xb, xc


def check_satisfied(ql, qr, qo, qm, qc, wa, wb, wc, assignment) -> list[int]:
    """Native gate checker: returns violated gate indices."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_load_error}")
    n = len(wa)
    bad = np.zeros(max(n, 1), np.int64)
    wa = np.ascontiguousarray(wa, np.int32)
    wb = np.ascontiguousarray(wb, np.int32)
    wc = np.ascontiguousarray(wc, np.int32)
    n_bad = lib.noirtpu_check_satisfied(
        n, _p(ql, _U64P), _p(qr, _U64P), _p(qo, _U64P), _p(qm, _U64P),
        _p(qc, _U64P), _p(wa, _I32P), _p(wb, _I32P), _p(wc, _I32P),
        len(assignment), _p(assignment, _U64P), _p(bad, _I64P),
    )
    return [int(b) for b in bad[: int(n_bad)]]


def felts_to_be(limbs: np.ndarray) -> bytes:
    lib = _load()
    n = limbs.shape[0]
    out = np.zeros(32 * n, np.uint8)
    limbs = np.ascontiguousarray(limbs, np.uint64)
    lib.noirtpu_felts_to_be(n, _p(limbs, _U64P), _p(out, _U8P))
    return out.tobytes()


def felts_from_be(data: bytes) -> np.ndarray:
    lib = _load()
    n = len(data) // 32
    arr = np.frombuffer(bytearray(data), np.uint8)
    out = np.zeros((n, 4), np.uint64)
    lib.noirtpu_felts_from_be(n, _p(arr, _U8P), _p(out, _U64P))
    return out


def fr_batch_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.zeros_like(a)
    lib.noirtpu_fr_batch_mul(a.shape[0], _p(a, _U64P), _p(b, _U64P), _p(out, _U64P))
    return out


def fr_batch_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.zeros_like(a)
    lib.noirtpu_fr_batch_add(a.shape[0], _p(a, _U64P), _p(b, _U64P), _p(out, _U64P))
    return out


def fr_batch_inv(a: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.zeros_like(a)
    lib.noirtpu_fr_batch_inv(a.shape[0], _p(a, _U64P), _p(out, _U64P))
    return out


def fr_batch_sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.zeros_like(a)
    lib.noirtpu_fr_batch_sub(a.shape[0], _p(a, _U64P), _p(b, _U64P), _p(out, _U64P))
    return out


def fr_powers(n: int, base: int, scale: int = 1) -> np.ndarray:
    """[scale * base^i for i < n] as (n, 4) canonical u64 limbs."""
    lib = _load()
    base_a = ints_to_u64x4([base])
    scale_a = ints_to_u64x4([scale])
    out = np.zeros((n, 4), np.uint64)
    lib.noirtpu_fr_powers(n, _p(base_a, _U64P), _p(scale_a, _U64P), _p(out, _U64P))
    return out


class PackedRows:
    """CSR packing of sparse Fr rows [(coeff_int, var_idx), ...] for the
    spmv kernels (Groth16 R1CS host side)."""

    def __init__(self, rows, modulus):
        indptr = np.zeros(len(rows) + 1, np.int64)
        coeffs, idxs = [], []
        for i, row in enumerate(rows):
            for c, v in row:
                coeffs.append(c % modulus)
                idxs.append(v)
            indptr[i + 1] = len(idxs)
        self.n_rows = len(rows)
        self.indptr = indptr
        self.idx = np.asarray(idxs, np.uint32)
        self.coeff = ints_to_u64x4(coeffs)


def spmv(packed: PackedRows, w: np.ndarray, out_mont: bool = False) -> np.ndarray:
    """out[r] = sum coeff*w[idx] per CSR row; w canonical (n,4) u64.
    out_mont=True returns Montgomery-form limbs (device form)."""
    lib = _load()
    out = np.zeros((packed.n_rows, 4), np.uint64)
    rc = lib.noirtpu_spmv_fr(
        packed.n_rows, _p(packed.indptr, _I64P), _p(packed.idx, _U32P),
        _p(packed.coeff, _U64P), w.shape[0], _p(w, _U64P), _p(out, _U64P),
        1 if out_mont else 0,
    )
    if rc != 0:
        raise ValueError("spmv: variable index out of range")
    return out


def spmv_t(packed: PackedRows, x: np.ndarray, n_out: int) -> np.ndarray:
    """out[idx] += coeff * x[row] (transpose walk; QAP accumulation)."""
    lib = _load()
    out = np.zeros((n_out, 4), np.uint64)
    rc = lib.noirtpu_spmv_t_fr(
        packed.n_rows, _p(packed.indptr, _I64P), _p(packed.idx, _U32P),
        _p(packed.coeff, _U64P), _p(x, _U64P), n_out, _p(out, _U64P),
    )
    if rc != 0:
        raise ValueError("spmv_t: variable index out of range")
    return out
