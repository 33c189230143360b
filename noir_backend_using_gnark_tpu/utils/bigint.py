"""Host-side big-integer utilities for the TPU prover.

Curve/field constants for BN254 and conversions between Python ints,
byte strings (the backend wire format) and 16x16-bit limb vectors (the
on-device representation used by :mod:`..ops.field`).

Wire-format notes (kept byte-compatible with the reference backend):
  * A field element ("felt") crosses the reference's FFI as a 32-byte
    big-endian blob, hex-encoded (reference: src/gnark_backend_wrapper/
    serialize.rs:10-17 reverses arkworks' LE serialization into BE, and
    gnark decodes it with ``Element.SetBytes`` which is BE —
    gnark_backend_ffi/internal/backend/helpers.go:13-22).
  * A felt *vector* is ``u32 BE count || 32B-BE felts``, hex-encoded
    (serialize.rs:33-47 / ``Vector.UnmarshalBinary`` helpers.go:24-33).

On-device representation: little-endian limbs, 16 limbs x 16 bits held in
uint32 lanes, so every partial product of two limbs fits exactly in a
uint32 (max (2^16-1)^2 < 2^32) and carry chains stay in-lane on the VPU.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# BN254 constants
# ---------------------------------------------------------------------------

# Scalar field modulus r (the "Fr" the prover works over; coefficients of
# ACIR gates are elements of this field — see the p-1 coefficient
# 0x30644e72...f0000000 in the reference's inline ACIR fixtures,
# gnark_backend_ffi/main.go:233-246).
FR_MODULUS = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# Base field modulus q (coordinates of BN254 points).
FQ_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# BN254 curve: y^2 = x^3 + 3 over Fq; generator of G1.
G1_GENERATOR = (1, 2)

# Fr multiplicative-subgroup facts used by the NTT: r - 1 = 2^28 * odd.
FR_TWO_ADICITY = 28
# 5 generates (a superset of) the 2^28-torsion: ROOT_OF_UNITY has exact
# order 2^28 (verified in tests/test_field.py).
FR_MULTIPLICATIVE_GENERATOR = 5
FR_ROOT_OF_UNITY = pow(5, (FR_MODULUS - 1) >> FR_TWO_ADICITY, FR_MODULUS)

# G2 over Fq2 = Fq[u]/(u^2+1): y^2 = x^3 + 3/(9+u). Generator (c0, c1) pairs.
G2_GENERATOR_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GENERATOR_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# ---------------------------------------------------------------------------
# BLS12-381 scalar-field constants (reference cargo feature `bls12_381`,
# Cargo.toml:33-36 / src/gnark_backend_wrapper/mod.rs:13-33). The
# feature's WORKING surface in the reference is exactly the Fr felt
# layer: mod.rs selects ark-bls12-381 Fr for `from_felt`/serialization,
# while the Go backend it calls is hard-wired to bn254
# (gnark_backend_ffi/main.go:16-21 imports only bn254 packages), so no
# curve/pairing path exists for it upstream either. We mirror that:
# BLS12-381 Fr arithmetic + codecs + NTT domains are supported;
# proving over BLS12-381 raises (see config.Config.validate).
# ---------------------------------------------------------------------------

BLS_FR_MODULUS = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS_FR_TWO_ADICITY = 32
BLS_FR_MULTIPLICATIVE_GENERATOR = 7
BLS_FR_ROOT_OF_UNITY = pow(
    7, (BLS_FR_MODULUS - 1) >> BLS_FR_TWO_ADICITY, BLS_FR_MODULUS
)

# Limb scheme: 16 limbs x 16 bits (little-endian), totaling 256 bits.
LIMB_BITS = 16
NUM_LIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


# ---------------------------------------------------------------------------
# int <-> limb conversions (host side)
# ---------------------------------------------------------------------------

def int_to_limbs(x: int) -> tuple[int, ...]:
    """Split a <2^256 integer into 16 little-endian 16-bit limbs."""
    if not 0 <= x < (1 << 256):
        raise ValueError("value out of range for 16x16-bit limbs")
    return tuple((x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NUM_LIMBS))


def limbs_to_int(limbs) -> int:
    """Inverse of :func:`int_to_limbs`."""
    acc = 0
    for i, limb in enumerate(limbs):
        acc |= int(limb) << (LIMB_BITS * i)
    return acc


def ints_to_limb_array(values, dtype=np.uint32) -> np.ndarray:
    """Pack an iterable of ints into a limb-major uint32 array (16, N).

    Limb-major so that a single limb of the whole batch is contiguous and
    lands on TPU vector lanes.
    """
    values = list(values)
    out = np.empty((NUM_LIMBS, len(values)), dtype=dtype)
    for j, v in enumerate(values):
        v = int(v)
        for i in range(NUM_LIMBS):
            out[i, j] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limb_array_to_ints(arr: np.ndarray) -> list[int]:
    """Inverse of :func:`ints_to_limb_array` for a (16, N) array."""
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[1]
    return [limbs_to_int(arr[:, j]) for j in range(n)]


def u64x4_to_limbs16(arr: np.ndarray) -> np.ndarray:
    """(n, 4) uint64 LE-limb felts (the native C ABI layout) ->
    (16, n) uint32 device limb array — a pure numpy view/transpose, no
    per-element Python. The value is preserved bit-for-bit, so a
    Montgomery-form u64x4 array becomes a Montgomery-form device array
    (both use R = 2^256)."""
    arr = np.ascontiguousarray(arr, np.uint64)
    u16 = arr.view("<u2").reshape(arr.shape[0], 16)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def limbs16_to_u64x4(arr: np.ndarray) -> np.ndarray:
    """(16, n) uint32 device limbs -> (n, 4) uint64 LE limbs (inverse
    of :func:`u64x4_to_limbs16`; limbs must be fully carried, < 2^16)."""
    u16 = np.ascontiguousarray(np.asarray(arr).T).astype(np.uint16)
    return np.ascontiguousarray(u16).view("<u8").reshape(-1, 4).copy()


def ints_to_limb_array_fast(values) -> np.ndarray:
    """Vectorized :func:`ints_to_limb_array`: ints -> (16, N) uint32.

    Goes through a packed little-endian byte buffer so the per-limb
    split is pure numpy — ~20x faster than the scalar loop for the
    2^20-element power tables the NTT domains need.
    """
    buf = b"".join(int(v).to_bytes(32, "little") for v in values)
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 32)
    limbs = raw[:, 0::2].astype(np.uint32) | (raw[:, 1::2].astype(np.uint32) << 8)
    return np.ascontiguousarray(limbs.T)


def power_table(base: int, n: int, modulus: int, to_mont: bool = True) -> np.ndarray:
    """[base^0, .., base^{n-1}] mod p as a (16, n) limb array (host).

    Host Python-int multiplication chain: ~0.5 us/element — always
    cheaper than compiling a device scan kernel on this relay host
    (one `powers_of` XLA compile measured 9-31 s). Montgomery form by
    default (multiply through by R = 2^256).
    """
    base %= modulus
    r_mont = (1 << 256) % modulus if to_mont else 1
    vals = []
    acc = r_mont
    for _ in range(n):
        vals.append(acc)
        acc = acc * base % modulus
    return ints_to_limb_array_fast(vals)


# ---------------------------------------------------------------------------
# Wire-format codecs (reference-compatible)
# ---------------------------------------------------------------------------

def felt_to_bytes_be(x: int) -> bytes:
    """Serialize a felt as the reference does: 32 bytes big-endian.

    Mirrors serialize.rs:10-17 (ark LE reversed to BE) == gnark
    ``Element.Bytes()``.
    """
    return int(x).to_bytes(32, "big")


def felt_from_bytes_be(b: bytes, modulus: int = FR_MODULUS) -> int:
    """Deserialize like gnark ``Element.SetBytes`` (helpers.go:13-22):
    interpret big-endian and reduce mod the field."""
    return int.from_bytes(b, "big") % modulus


def encode_felts(felts) -> str:
    """``u32 BE count || 32B-BE felts``, hex-encoded (serialize.rs:33-47)."""
    felts = list(felts)
    buf = len(felts).to_bytes(4, "big")
    for f in felts:
        buf += felt_to_bytes_be(f)
    return buf.hex()


def decode_felts(encoded: str, modulus: int = FR_MODULUS) -> list[int]:
    """Inverse of :func:`encode_felts` (helpers.go:24-33 /
    ``Vector.UnmarshalBinary``)."""
    raw = bytes.fromhex(encoded)
    if len(raw) < 4:
        raise ValueError("encoded felts shorter than the u32 count prefix")
    n = int.from_bytes(raw[:4], "big")
    body = raw[4:]
    if len(body) != 32 * n:
        raise ValueError(f"encoded felts: expected {32*n} body bytes, got {len(body)}")
    return [felt_from_bytes_be(body[32 * i : 32 * i + 32], modulus) for i in range(n)]


def decode_felt_hex(encoded: str, modulus: int = FR_MODULUS) -> int:
    """Hex string -> felt, the coefficient format inside ACIR JSON
    (helpers.go:13-22; fixtures main.go:233-246)."""
    return felt_from_bytes_be(bytes.fromhex(encoded), modulus)


def encode_felt_hex(x: int) -> str:
    return felt_to_bytes_be(x).hex()
