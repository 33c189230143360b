"""Artifact store: serialization of felts, points, SRS, keys and proofs.

Mirrors the reference's three persistent artifact kinds (SURVEY.md §5
checkpoint/resume): (a) the SRS cache (``srs.hex`` —
backend/common.go:78-125), (b) proving/verifying keys, (c) proofs — all
hex-encoded binary blobs (helpers.go:49-94).

Formats:
  * felts: 32-byte big-endian (byte-identical with the reference,
    serialize.rs:10-17 / helpers.go:13-22);
  * felt vectors: ``u32 BE count || felts`` (serialize.rs:33-47);
  * G1 points: gnark-crypto bn254 flag scheme — top two bits of byte 0:
    00 uncompressed (64B X||Y BE), 10/11 compressed-smallest/largest-y
    (32B), 01 infinity. Round-trips through our own codec; byte
    equality with gnark cannot be validated in this environment
    (no Go toolchain) and is tracked as a conformance TODO;
  * SRS / keys / proofs: versioned length-prefixed containers defined
    here (the reference's blobs are gnark-internal formats produced by
    ``WriteTo``; ours are specified below so any implementation can
    parse them).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from .errors import (
    DeserializeKeyError,
    DeserializeProofError,
    SerializeKeysError,
)
from .utils import bigint

Q = bigint.FQ_MODULUS
R = bigint.FR_MODULUS

_FLAG_MASK = 0b11 << 6
_FLAG_UNCOMPRESSED = 0b00 << 6
_FLAG_COMPRESSED_SMALLEST = 0b10 << 6
_FLAG_COMPRESSED_LARGEST = 0b11 << 6
_FLAG_INFINITY = 0b01 << 6


# ---------------------------------------------------------------------------
# G1 point codec (gnark-crypto bn254 flag scheme)
# ---------------------------------------------------------------------------


def g1_compress(point) -> bytes:
    """Affine int point / None -> 32 bytes."""
    if point is None:
        out = bytearray(32)
        out[0] |= _FLAG_INFINITY
        return bytes(out)
    x, y = point
    out = bytearray(x.to_bytes(32, "big"))
    neg_y = (Q - y) % Q
    flag = _FLAG_COMPRESSED_LARGEST if y > neg_y else _FLAG_COMPRESSED_SMALLEST
    out[0] |= flag
    return bytes(out)


def g1_decompress(data: bytes):
    if len(data) != 32:
        raise ValueError("compressed G1 point must be 32 bytes")
    flag = data[0] & _FLAG_MASK
    if flag == _FLAG_INFINITY:
        return None
    x = int.from_bytes(bytes([data[0] & ~_FLAG_MASK]) + data[1:], "big")
    if x >= Q:
        raise ValueError("G1 x-coordinate out of range")
    y2 = (x * x * x + 3) % Q
    # q == 3 mod 4 -> sqrt by exponentiation.
    y = pow(y2, (Q + 1) // 4, Q)
    if y * y % Q != y2:
        raise ValueError("point not on curve")
    neg_y = (Q - y) % Q
    larger, smaller = (y, neg_y) if y > neg_y else (neg_y, y)
    if flag == _FLAG_COMPRESSED_LARGEST:
        return (x, larger)
    if flag == _FLAG_COMPRESSED_SMALLEST:
        return (x, smaller)
    raise ValueError(f"bad G1 compression flag {flag:#x}")


def g1_uncompressed(point) -> bytes:
    if point is None:
        return bytes(64)  # gnark writes all-zero with infinity flag unset? keep 0s
    x, y = point
    return x.to_bytes(32, "big") + y.to_bytes(32, "big")


def g2_bytes(point) -> bytes:
    """G2 affine (FQ2 pair) -> 128 bytes uncompressed (x.c1||x.c0||y.c1||y.c0,
    matching gnark's big-endian component order)."""
    if point is None:
        return bytes(128)
    x, y = point
    return (
        x.coeffs[1].to_bytes(32, "big")
        + x.coeffs[0].to_bytes(32, "big")
        + y.coeffs[1].to_bytes(32, "big")
        + y.coeffs[0].to_bytes(32, "big")
    )


def g2_from_bytes(data: bytes, check: bool = True):
    """Decode an uncompressed G2 point, validating curve + subgroup
    membership by default.

    gnark's ReadFrom validates deserialized points; skipping the check
    here would let an untrusted proof.b enter the pairing (invalid-
    curve / small-subgroup attack surface — round-1 advisor finding).
    BN254's G2 cofactor is > 1, so the r-torsion check is required, not
    just on-curve.
    """
    from .utils import hostcurve

    if len(data) != 128:
        raise ValueError("uncompressed G2 point must be 128 bytes")
    if data == bytes(128):
        return None
    c = [int.from_bytes(data[i * 32 : (i + 1) * 32], "big") for i in range(4)]
    if check and any(v >= Q for v in c):
        raise ValueError("G2 coordinate out of range")
    pt = (hostcurve.FQ2([c[1], c[0]]), hostcurve.FQ2([c[3], c[2]]))
    if check:
        if not hostcurve.g2_is_on_curve(pt):
            raise ValueError("G2 point not on curve")
        if hostcurve.g2_mul(pt, R) is not None:
            raise ValueError("G2 point not in the r-torsion subgroup")
    return pt


# ---------------------------------------------------------------------------
# SRS cache (reference: $XDG_CONFIG/noir-lang/srs.hex, common.go:78-144)
# ---------------------------------------------------------------------------

SRS_MAGIC = b"NTPUSRS1"


def srs_to_bytes(srs) -> bytes:
    pts = srs.g1_ints()
    out = [SRS_MAGIC, struct.pack(">I", len(pts))]
    out.extend(g1_compress(p) for p in pts)
    out.append(g2_bytes(srs.g2_gen))
    out.append(g2_bytes(srs.g2_alpha))
    return b"".join(out)


def srs_from_bytes(data: bytes):
    from .kzg.kzg import SRS
    from .ops import msm as M

    if data[:8] != SRS_MAGIC:
        raise DeserializeKeyError("bad SRS magic")
    (count,) = struct.unpack(">I", data[8:12])
    off = 12
    pts = []
    for _ in range(count):
        pts.append(g1_decompress(data[off : off + 32]))
        off += 32
    g2_gen = g2_from_bytes(data[off : off + 128])
    off += 128
    g2_alpha = g2_from_bytes(data[off : off + 128])
    return SRS(
        g1_powers=M.affine_from_ints(pts), g2_gen=g2_gen, g2_alpha=g2_alpha
    )


def default_srs_path() -> str:
    cfg = os.environ.get("XDG_CONFIG_HOME", os.path.expanduser("~/.config"))
    return os.path.join(cfg, "noir-lang-tpu", "srs.hex")


def save_srs(srs, path: str | None = None) -> str:
    path = path or default_srs_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(srs_to_bytes(srs).hex())
    return path


def load_srs(path: str | None = None):
    path = path or default_srs_path()
    with open(path) as f:
        return srs_from_bytes(bytes.fromhex(f.read().strip()))


def _limbs_to_be_bytes(limbs) -> "np.ndarray":
    """(16, n) uint32 canonical LE-limb array -> (n, 32) big-endian bytes
    (vectorized — the per-point Python loop of formats.gnark.g1_bytes is
    unusable at the reference's 2^20-point SRS scale)."""
    import numpy as np

    limbs = np.asarray(limbs)
    n = limbs.shape[1]
    out = np.zeros((n, 32), np.uint8)
    for i in range(16):  # limb i covers BE bytes [30-2i, 31-2i]
        out[:, 30 - 2 * i] = (limbs[i] >> 8).astype(np.uint8)
        out[:, 31 - 2 * i] = (limbs[i] & 0xFF).astype(np.uint8)
    return out


def _be_bytes_to_limbs(raw) -> "np.ndarray":
    """(n, 32) big-endian byte matrix -> (16, n) uint32 limb array."""
    import numpy as np

    raw = np.asarray(raw, np.uint8)
    out = np.zeros((16, raw.shape[0]), np.uint32)
    for i in range(16):
        out[i] = (raw[:, 30 - 2 * i].astype(np.uint32) << 8) | raw[:, 31 - 2 * i]
    return out


def _limbs_lex_ge(limbs, const_int: int) -> "np.ndarray":
    """Vectorized per-element ``value >= const`` on (16, n) limb arrays."""
    import numpy as np

    cl = bigint.int_to_limbs(const_int)
    n = limbs.shape[1]
    result = np.zeros(n, bool)
    decided = np.zeros(n, bool)
    for i in range(15, -1, -1):
        li = limbs[i]
        result |= ~decided & (li > cl[i])
        decided |= li != cl[i]
    return result | ~decided  # equal -> >= holds


def save_srs_gnark(srs, path: str) -> str:
    """Write the SRS in the gnark-crypto ``kzg.SRS.WriteTo`` layout,
    hex-encoded like the reference cache (backend/common.go:86-125):
    G2 gen ‖ G2 alpha (compressed, 64 B) ‖ u32 BE count ‖ 32 B
    compressed G1 points. Vectorized (numpy byte packing + one device
    from_mont) so a 2^20-point SRS serializes in seconds.
    """
    import numpy as np

    from .formats import gnark as GK
    from .ops import field as F

    xs = np.asarray(F.from_mont(srs.g1_powers.x, F.FQ))
    ys = np.asarray(F.from_mont(srs.g1_powers.y, F.FQ))
    inf = np.asarray(srs.g1_powers.inf)
    pts = _limbs_to_be_bytes(xs)
    largest = _limbs_lex_ge(ys, (Q + 1) // 2)
    flags = np.where(largest, _FLAG_COMPRESSED_LARGEST, _FLAG_COMPRESSED_SMALLEST)
    pts[:, 0] |= flags.astype(np.uint8)
    pts[inf] = 0
    pts[inf, 0] = _FLAG_INFINITY
    header = (
        GK.g2_bytes_compressed(srs.g2_gen)
        + GK.g2_bytes_compressed(srs.g2_alpha)
        + struct.pack(">I", pts.shape[0])
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(header.hex())
        f.write(pts.tobytes().hex())
    return path


def load_srs_gnark(path: str):
    """Read a gnark-layout ``srs.hex`` (see :func:`save_srs_gnark`).

    G1 decompression is TPU-native: the x coordinates upload as one
    limb batch and the y square roots come from a single batched
    ``(x^3+3)^((q+1)/4)`` device exponentiation (BN254 q = 3 mod 4) —
    ~500 batched field muls total instead of 2^20 sequential host
    Tonelli steps. The smallest/largest flag picks the sign.
    """
    import jax.numpy as jnp
    import numpy as np

    from .formats import gnark as GK
    from .kzg.kzg import SRS
    from .ops import field as F
    from .ops import msm as M

    with open(path) as f:
        data = bytes.fromhex(f.read().strip())
    off = 0
    g2_gen, off = GK.g2_read_compressed(data, off)
    g2_alpha, off = GK.g2_read_compressed(data, off)
    (count,) = struct.unpack(">I", data[off : off + 4])
    off += 4
    if len(data) < off + 32 * count:
        raise DeserializeKeyError("gnark SRS: truncated point section")
    raw = (
        np.frombuffer(data, np.uint8, count=32 * count, offset=off)
        .reshape(count, 32)
        .copy()
    )
    flags = raw[:, 0] & _FLAG_MASK
    if (flags == _FLAG_UNCOMPRESSED).any():
        raise DeserializeKeyError("gnark SRS: uncompressed points unsupported")
    raw[:, 0] &= ~_FLAG_MASK & 0xFF
    inf = flags == _FLAG_INFINITY
    x_limbs = _be_bytes_to_limbs(raw)

    x_m = F.to_mont(jnp.asarray(x_limbs), F.FQ)
    three = F.from_ints([3], F.FQ)
    rhs = F.add(
        F.mont_mul(F.mont_mul(x_m, x_m, F.FQ), x_m, F.FQ),
        jnp.broadcast_to(three, x_m.shape),
        F.FQ,
    )
    y_m = F.mont_pow_const(rhs, (Q + 1) // 4, F.FQ)
    if not bool(
        jnp.all(F.eq(F.mont_mul(y_m, y_m, F.FQ), rhs) | jnp.asarray(inf))
    ):
        raise DeserializeKeyError("gnark SRS: point x with no square root")
    y_can = np.asarray(F.from_mont(y_m, F.FQ))
    y_is_largest = _limbs_lex_ge(y_can, (Q + 1) // 2)
    want_largest = flags == _FLAG_COMPRESSED_LARGEST
    # Negate where the stored sign disagrees: q - y, vectorized borrow.
    neg = np.empty_like(y_can)
    q_limbs = bigint.int_to_limbs(Q)
    borrow = np.zeros(count, np.uint32)
    for i in range(16):
        d = q_limbs[i] + (1 << 16) - y_can[i] - borrow
        neg[i] = d & 0xFFFF
        borrow = 1 - (d >> 16)
    flip = (want_largest != y_is_largest) & ~inf
    y_sel = np.where(flip[None, :], neg, y_can).astype(np.uint32)
    y_final = F.to_mont(jnp.asarray(y_sel), F.FQ)
    batch = M.AffineBatch(x_m, y_final, jnp.asarray(inf))
    return SRS(g1_powers=batch, g2_gen=g2_gen, g2_alpha=g2_alpha)


def try_load_srs(size: int, path: str | None = None, alpha: int | None = None):
    """Load-else-generate-and-save (TryLoadSRS, common.go:127-144).

    The generation alpha is random per machine, exactly like the
    reference — proofs only verify against keys from the same SRS.
    """
    from .kzg import kzg as kzg_mod

    try:
        srs = load_srs(path)
        if srs.size >= size:
            return srs
    except (FileNotFoundError, ValueError, DeserializeKeyError):
        pass
    if alpha is None:
        alpha = int.from_bytes(os.urandom(32), "big") % R
    srs = kzg_mod.generate_srs(size, alpha)
    save_srs(srs, path)
    return srs


# ---------------------------------------------------------------------------
# Proof / key containers
# ---------------------------------------------------------------------------

PROOF_MAGIC = b"NTPUPRF1"
VK_MAGIC = b"NTPUVK_1"
PK_MAGIC = b"NTPUPK_1"  # legacy (no SRS fingerprint), still readable
PK_MAGIC_V2 = b"NTPUPK_2"


def srs_digest(srs) -> bytes:
    """8-byte fingerprint of an SRS: hash of ([alpha]G1, size).

    Proof keys embed this so proving with a *different* cached SRS
    fails loudly instead of emitting proofs that just never verify
    (the reference shares this foot-gun — its SRS cache is trusted by
    path alone, common.go:127-144)."""
    import hashlib

    pts = srs.g1_ints(2)
    alpha_g = pts[1] if len(pts) > 1 else pts[0]
    h = hashlib.sha256()
    h.update(g1_compress(alpha_g))
    h.update(struct.pack(">Q", srs.size))
    return h.digest()[:8]


def _pack_felt(v: int) -> bytes:
    return bigint.felt_to_bytes_be(v % R)


def proof_to_bytes(proof) -> bytes:
    """Serialize either proof layout.

    gnark-protocol proofs (formats.gnark.GnarkProof) serialize as RAW
    gnark v0.8 ``WriteTo`` blobs — no NTPU magic — exactly the bytes
    the reference moves across its FFI (helpers.go:75-80). Expanded
    proofs use the magic-tagged NTPU container.
    """
    from .formats import gnark as gnark_fmt

    if isinstance(proof, gnark_fmt.GnarkProof):
        return gnark_fmt.proof_to_gnark_bytes(proof)
    out = [PROOF_MAGIC]
    for pt in (proof.a, proof.b, proof.c, proof.z, proof.t0, proof.t1, proof.t2):
        out.append(g1_compress(pt))
    out.append(struct.pack(">I", len(proof.evals)))
    out.extend(_pack_felt(v) for v in proof.evals)
    out.append(_pack_felt(proof.z_omega))
    out.append(g1_compress(proof.w_zeta))
    out.append(g1_compress(proof.w_zeta_omega))
    return b"".join(out)


def proof_from_bytes(data: bytes):
    from .plonk.keys import Proof

    if data[:8] != PROOF_MAGIC:
        # No NTPU magic: parse as a raw gnark v0.8 proof blob (the
        # gnark container has no magic of its own; its fixed-layout
        # point/count structure is validated by the codec).
        from .formats import gnark as gnark_fmt

        return gnark_fmt.proof_from_gnark_bytes(data)
    try:
        off = 8
        pts = []
        for _ in range(7):
            pts.append(g1_decompress(data[off : off + 32]))
            off += 32
        (ne,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        evals = []
        for _ in range(ne):
            evals.append(int.from_bytes(data[off : off + 32], "big") % R)
            off += 32
        z_omega = int.from_bytes(data[off : off + 32], "big") % R
        off += 32
        w_zeta = g1_decompress(data[off : off + 32])
        off += 32
        w_zeta_omega = g1_decompress(data[off : off + 32])
        return Proof(
            a=pts[0], b=pts[1], c=pts[2], z=pts[3], t0=pts[4], t1=pts[5], t2=pts[6],
            evals=evals, z_omega=z_omega, w_zeta=w_zeta, w_zeta_omega=w_zeta_omega,
        )
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeProofError(str(e)) from e


def vk_to_bytes(vk) -> bytes:
    out = [VK_MAGIC, struct.pack(">QII", vk.n, vk.nb_public, 0)]
    out.append(_pack_felt(vk.generator))
    out.append(_pack_felt(vk.k1))
    out.append(_pack_felt(vk.k2))
    for pt in vk.commitment_list():
        out.append(g1_compress(pt))
    out.append(g2_bytes(vk.g2_gen))
    out.append(g2_bytes(vk.g2_alpha))
    return b"".join(out)


def vk_from_bytes(data: bytes):
    from .plonk.keys import VerifyingKey

    try:
        if data[:8] != VK_MAGIC:
            raise ValueError("bad vk magic")
        n, nb_public, _ = struct.unpack(">QII", data[8:24])
        off = 24
        felts = []
        for _ in range(3):
            felts.append(int.from_bytes(data[off : off + 32], "big") % R)
            off += 32
        pts = []
        for _ in range(8):
            pts.append(g1_decompress(data[off : off + 32]))
            off += 32
        g2_gen = g2_from_bytes(data[off : off + 128])
        off += 128
        g2_alpha = g2_from_bytes(data[off : off + 128])
        return VerifyingKey(
            n=n, nb_public=nb_public, generator=felts[0], k1=felts[1], k2=felts[2],
            q_l=pts[0], q_r=pts[1], q_o=pts[2], q_m=pts[3], q_c=pts[4],
            s1=pts[5], s2=pts[6], s3=pts[7], g2_gen=g2_gen, g2_alpha=g2_alpha,
        )
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeKeyError(str(e)) from e


def pk_to_bytes(pk) -> bytes:
    """Proving key blob: metadata + wire indices + coeff/eval polys.

    The SRS is NOT embedded (matching the reference: the Go side
    re-attaches the cached SRS via pk.InitKZG at prove time,
    backend/plonk/plonk.go:58-63).
    """
    import numpy as np

    from .ops import field as F

    try:
        fp = srs_digest(pk.srs) if pk.srs is not None else bytes(8)
        out = [
            PK_MAGIC_V2,
            fp,
            struct.pack(">QIIII", pk.n, pk.nb_public, pk.nb_vars, pk.k1, pk.k2),
        ]
        for w in (pk.wire_a, pk.wire_b, pk.wire_c):
            out.append(np.asarray(w, np.int32).tobytes())
        for poly in (pk.ql, pk.qr, pk.qo, pk.qm, pk.qc, pk.s1, pk.s2, pk.s3,
                     pk.s1_evals, pk.s2_evals, pk.s3_evals):
            arr = np.asarray(poly, np.uint32)
            out.append(struct.pack(">I", arr.shape[1]))
            out.append(arr.tobytes())
        out.append(vk_to_bytes(pk.vk))
        return b"".join(out)
    except Exception as e:  # noqa: BLE001 — mapped to the reference's error class
        raise SerializeKeysError(str(e)) from e


def pk_from_bytes(data: bytes, srs=None):
    import jax.numpy as jnp
    import numpy as np

    from .ops import field as F
    from .plonk.keys import ProvingKey

    try:
        if data[:8] == PK_MAGIC_V2:
            fp = data[8:16]
            off = 16
        elif data[:8] == PK_MAGIC:
            fp = None
            off = 8
        else:
            raise ValueError("bad pk magic")
        n, nb_public, nb_vars, k1, k2 = struct.unpack(
            ">QIIII", data[off : off + 24]
        )
        off += 24
        wires = []
        for _ in range(3):
            wires.append(np.frombuffer(data[off : off + 4 * n], np.int32).copy())
            off += 4 * n
        polys = []
        for _ in range(11):
            (cols,) = struct.unpack(">I", data[off : off + 4])
            off += 4
            nbytes = 4 * F.NUM_LIMBS * cols
            arr = np.frombuffer(data[off : off + nbytes], np.uint32).reshape(
                F.NUM_LIMBS, cols
            )
            off += nbytes
            polys.append(jnp.asarray(arr))
        vk = vk_from_bytes(data[off:])
        pk = ProvingKey(
            n=n, nb_public=nb_public, nb_vars=nb_vars, k1=k1, k2=k2,
            wire_a=wires[0], wire_b=wires[1], wire_c=wires[2],
            ql=polys[0], qr=polys[1], qo=polys[2], qm=polys[3], qc=polys[4],
            s1=polys[5], s2=polys[6], s3=polys[7],
            s1_evals=polys[8], s2_evals=polys[9], s3_evals=polys[10],
            vk=vk, srs=srs,
        )
        pk.srs_fingerprint = fp
        return pk
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeKeyError(str(e)) from e


# ---------------------------------------------------------------------------
# Groth16 containers (the reference's WIP scheme, SURVEY.md §2.9 — its
# Go externs Groth16ProveWithPK/... were never linkable; these formats
# make the path real end-to-end)
# ---------------------------------------------------------------------------

G16_PROOF_MAGIC = b"NTG16PR1"
G16_VK_MAGIC = b"NTG16VK1"
G16_PK_MAGIC = b"NTG16PK1"


def _g1_batch_points(batch) -> list:
    """Device AffineBatch -> host affine int tuples / None."""
    import numpy as np

    from .ops import field as F

    xs = F.to_ints(batch.x, F.FQ)
    ys = F.to_ints(batch.y, F.FQ)
    infs = np.asarray(batch.inf)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


def _pack_g1_list(points) -> bytes:
    return struct.pack(">I", len(points)) + b"".join(g1_compress(p) for p in points)


def _unpack_g1_list(data: bytes, off: int):
    (count,) = struct.unpack(">I", data[off : off + 4])
    off += 4
    pts = []
    for _ in range(count):
        pts.append(g1_decompress(data[off : off + 32]))
        off += 32
    return pts, off


def _pack_rows(rows) -> bytes:
    out = [struct.pack(">I", len(rows))]
    for row in rows:
        out.append(struct.pack(">I", len(row)))
        for coeff, var in row:
            out.append(_pack_felt(coeff))
            out.append(struct.pack(">I", var))
    return b"".join(out)


def _unpack_rows(data: bytes, off: int):
    (nrows,) = struct.unpack(">I", data[off : off + 4])
    off += 4
    rows = []
    for _ in range(nrows):
        (nterms,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        row = []
        for _ in range(nterms):
            coeff = int.from_bytes(data[off : off + 32], "big") % R
            (var,) = struct.unpack(">I", data[off + 32 : off + 36])
            off += 36
            row.append((coeff, var))
        rows.append(row)
    return rows, off


def groth16_proof_to_bytes(proof) -> bytes:
    return b"".join(
        [G16_PROOF_MAGIC, g1_compress(proof.a), g2_bytes(proof.b), g1_compress(proof.c)]
    )


def groth16_proof_from_bytes(data: bytes):
    from .groth16.groth16 import Groth16Proof

    try:
        if data[:8] != G16_PROOF_MAGIC:
            raise ValueError("bad groth16 proof magic")
        a = g1_decompress(data[8:40])
        b = g2_from_bytes(data[40:168])
        c = g1_decompress(data[168:200])
        return Groth16Proof(a=a, b=b, c=c)
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeProofError(str(e)) from e


def groth16_vk_to_bytes(vk) -> bytes:
    out = [G16_VK_MAGIC, struct.pack(">I", vk.nb_public)]
    out.append(g1_compress(vk.alpha1))
    out.append(g2_bytes(vk.beta2))
    out.append(g2_bytes(vk.gamma2))
    out.append(g2_bytes(vk.delta2))
    out.append(_pack_g1_list(vk.ic))
    return b"".join(out)


def groth16_vk_from_bytes(data: bytes):
    from .groth16.groth16 import Groth16VerifyingKey

    try:
        if data[:8] != G16_VK_MAGIC:
            raise ValueError("bad groth16 vk magic")
        (nb_public,) = struct.unpack(">I", data[8:12])
        off = 12
        alpha1 = g1_decompress(data[off : off + 32])
        off += 32
        beta2 = g2_from_bytes(data[off : off + 128])
        off += 128
        gamma2 = g2_from_bytes(data[off : off + 128])
        off += 128
        delta2 = g2_from_bytes(data[off : off + 128])
        off += 128
        ic, off = _unpack_g1_list(data, off)
        return Groth16VerifyingKey(
            alpha1=alpha1, beta2=beta2, gamma2=gamma2, delta2=delta2,
            ic=ic, nb_public=nb_public,
        )
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeKeyError(str(e)) from e


def groth16_pk_to_bytes(pk) -> bytes:
    try:
        r1cs = pk.r1cs
        out = [
            G16_PK_MAGIC,
            struct.pack(">QII", pk.n, r1cs.num_vars, r1cs.nb_public),
        ]
        out.append(_pack_rows(r1cs.a_rows))
        out.append(_pack_rows(r1cs.b_rows))
        out.append(_pack_rows(r1cs.c_rows))
        items = sorted(r1cs.index_map.items())
        out.append(struct.pack(">I", len(items)))
        out.extend(struct.pack(">II", w, i) for w, i in items)
        out.append(struct.pack(">I", len(r1cs.public_witness_indices)))
        out.extend(struct.pack(">I", w) for w in r1cs.public_witness_indices)
        for q in (pk.a_query, pk.b1_query, pk.l_query, pk.h_query):
            out.append(_pack_g1_list(_g1_batch_points(q)))
        out.append(struct.pack(">I", len(pk.b2_query)))
        out.extend(g2_bytes(q) for q in pk.b2_query)
        out.append(g1_compress(pk.alpha1))
        out.append(g1_compress(pk.beta1))
        out.append(g1_compress(pk.delta1))
        out.append(g2_bytes(pk.beta2))
        out.append(g2_bytes(pk.delta2))
        out.append(groth16_vk_to_bytes(pk.vk))
        return b"".join(out)
    except Exception as e:  # noqa: BLE001 — mapped to the reference's error class
        raise SerializeKeysError(str(e)) from e


def groth16_pk_from_bytes(data: bytes):
    from .groth16.groth16 import Groth16ProvingKey, R1CS
    from .ops import msm as M

    try:
        if data[:8] != G16_PK_MAGIC:
            raise ValueError("bad groth16 pk magic")
        n, num_vars, nb_public = struct.unpack(">QII", data[8:24])
        off = 24
        a_rows, off = _unpack_rows(data, off)
        b_rows, off = _unpack_rows(data, off)
        c_rows, off = _unpack_rows(data, off)
        (nmap,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        index_map = {}
        for _ in range(nmap):
            w, i = struct.unpack(">II", data[off : off + 8])
            off += 8
            index_map[w] = i
        (npub_w,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        pub_wits = []
        for _ in range(npub_w):
            (w,) = struct.unpack(">I", data[off : off + 4])
            off += 4
            pub_wits.append(w)
        queries = []
        for _ in range(4):
            pts, off = _unpack_g1_list(data, off)
            queries.append(M.affine_from_ints(pts))
        (nb2,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        b2_query = []
        for _ in range(nb2):
            b2_query.append(g2_from_bytes(data[off : off + 128]))
            off += 128
        alpha1 = g1_decompress(data[off : off + 32]); off += 32
        beta1 = g1_decompress(data[off : off + 32]); off += 32
        delta1 = g1_decompress(data[off : off + 32]); off += 32
        beta2 = g2_from_bytes(data[off : off + 128]); off += 128
        delta2 = g2_from_bytes(data[off : off + 128]); off += 128
        vk = groth16_vk_from_bytes(data[off:])
        r1cs = R1CS(
            num_vars=num_vars, nb_public=nb_public,
            a_rows=a_rows, b_rows=b_rows, c_rows=c_rows,
            index_map=index_map, public_witness_indices=pub_wits,
        )
        return Groth16ProvingKey(
            r1cs=r1cs, n=n,
            a_query=queries[0], b1_query=queries[1],
            l_query=queries[2], h_query=queries[3],
            b2_query=b2_query,
            alpha1=alpha1, beta1=beta1, delta1=delta1,
            beta2=beta2, delta2=delta2, vk=vk,
        )
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeKeyError(str(e)) from e
