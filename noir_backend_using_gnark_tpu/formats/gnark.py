"""gnark v0.8 / gnark-crypto v0.9 artifact byte layouts (BN254).

The reference persists proofs/keys/SRS as hex-encoded gnark ``WriteTo``
blobs (gnark_backend_ffi/internal/backend/helpers.go:35-94 for
proof/pk/vk, backend/common.go:86-125 for the SRS cache). This module
reimplements those deterministic layouts so artifacts can be exchanged
with a gnark-based verifier/prover:

  * **points** — gnark-crypto's flag scheme (top two bits of the first
    byte): ``00`` uncompressed, ``10``/``11`` compressed with
    smallest/largest y, ``01`` compressed infinity. G1 compressed = 32
    bytes; G2 compressed = 64 bytes (x.A1 ‖ x.A0, big-endian), with the
    y sign chosen by lexicographic order on (A1, A0)
    (gnark-crypto ecc/bn254/marshal.go);
  * **kzg.SRS** (gnark-crypto kzg/marshal.go WriteTo): encoder stream
    of G2[0], G2[1] (compressed, 64 B each) then the G1 slice
    (``u32 BE count`` then 32 B compressed points);
  * **plonk.VerifyingKey** (gnark backend/plonk/bn254/marshal.go
    WriteTo): Size u64 ‖ SizeInv fr ‖ Generator fr ‖
    NbPublicVariables u64 ‖ CosetShift fr ‖ S[3] ‖ Ql ‖ Qr ‖ Qm ‖
    Qo ‖ Qk (digests, 32 B compressed each);
  * **plonk.Proof** (same file): LRO[3] ‖ Z ‖ H[3] ‖ BatchedProof.H ‖
    ClaimedValues (u32-count fr slice) ‖ ZShiftedOpening.H ‖
    ClaimedValue fr.

Layouts were derived from the gnark/gnark-crypto sources named above
(not vendored in this environment — byte-for-byte golden vectors
against a live gnark build are tracked in CONFORMANCE.md). fr elements
are 32-byte big-endian (same codec the reference uses for felts,
serialize.rs:10-17 — already fixture-tested in utils/bigint.py).

Interop status: the SRS and VerifyingKey map 1:1 onto our artifacts
(our k1/k2 = CosetShift/CosetShift^2, our qc = Qk). The gnark Proof
container carries gnark's *linearized* opening set (6 claimed values);
our prover currently emits the expanded 15-opening layout
(plonk/keys.py), so Proof export is only available for proofs in
gnark's shape — the protocol-level switch is tracked in
CONFORMANCE.md.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from ..errors import DeserializeKeyError, DeserializeProofError
from ..utils import bigint

Q = bigint.FQ_MODULUS
R = bigint.FR_MODULUS

_MASK = 0b11 << 6
_UNCOMPRESSED = 0b00 << 6
_COMPRESSED_SMALLEST = 0b10 << 6
_COMPRESSED_LARGEST = 0b11 << 6
_COMPRESSED_INFINITY = 0b01 << 6


# ---------------------------------------------------------------------------
# fr / fp scalars
# ---------------------------------------------------------------------------


def fr_bytes(v: int) -> bytes:
    return (v % R).to_bytes(32, "big")


def fr_read(data: bytes, off: int) -> tuple[int, int]:
    v = int.from_bytes(data[off : off + 32], "big")
    if v >= R:
        raise ValueError("fr element out of range")
    return v, off + 32


# ---------------------------------------------------------------------------
# G1 (32-byte compressed — same flag scheme as artifacts.py, re-exported
# here so the gnark layouts are self-contained)
# ---------------------------------------------------------------------------


def g1_bytes(point) -> bytes:
    if point is None:
        out = bytearray(32)
        out[0] = _COMPRESSED_INFINITY
        return bytes(out)
    x, y = point
    out = bytearray(x.to_bytes(32, "big"))
    neg_y = (Q - y) % Q
    out[0] |= _COMPRESSED_LARGEST if y > neg_y else _COMPRESSED_SMALLEST
    return bytes(out)


def g1_read(data: bytes, off: int):
    from ..artifacts import g1_decompress

    return g1_decompress(data[off : off + 32]), off + 32


# ---------------------------------------------------------------------------
# G2 (64-byte compressed)
# ---------------------------------------------------------------------------


def _fq2_lex_larger(a: tuple[int, int], b: tuple[int, int]) -> bool:
    """gnark's lexicographic order on FQ2 (A1 first, then A0)."""
    if a[1] != b[1]:
        return a[1] > b[1]
    return a[0] > b[0]


def g2_bytes_compressed(point) -> bytes:
    """G2 affine (pair of hostcurve.FQ2) -> 64 bytes."""
    if point is None:
        out = bytearray(64)
        out[0] = _COMPRESSED_INFINITY
        return bytes(out)
    x, y = point
    xa0, xa1 = int(x.coeffs[0]), int(x.coeffs[1])
    ya0, ya1 = int(y.coeffs[0]), int(y.coeffs[1])
    na0, na1 = (Q - ya0) % Q, (Q - ya1) % Q
    out = bytearray(xa1.to_bytes(32, "big") + xa0.to_bytes(32, "big"))
    flag = (
        _COMPRESSED_LARGEST
        if _fq2_lex_larger((ya0, ya1), (na0, na1))
        else _COMPRESSED_SMALLEST
    )
    out[0] |= flag
    return bytes(out)


def _fq2_sqrt(a):
    """Square root in FQ2 via the complex method (p = 3 mod 4)."""
    from ..utils import hostcurve as H

    # a = a0 + a1*u with u^2 = -1.  sqrt via norm: n = a0^2 + a1^2,
    # s = sqrt(n) in Fq; x0 = sqrt((a0 + s)/2) (try both signs).
    a0, a1 = int(a.coeffs[0]), int(a.coeffs[1])
    if a1 == 0:
        s = pow(a0, (Q + 1) // 4, Q)
        if s * s % Q == a0:
            return H.FQ2([s, 0])
        # a0 is a non-residue: sqrt = u * sqrt(-a0)
        s = pow((Q - a0) % Q, (Q + 1) // 4, Q)
        if s * s % Q != (Q - a0) % Q:
            return None
        return H.FQ2([0, s])
    n = (a0 * a0 + a1 * a1) % Q
    s = pow(n, (Q + 1) // 4, Q)
    if s * s % Q != n:
        return None
    for sign in (1, Q - 1):
        ss = s * sign % Q
        half = pow(2, -1, Q)
        x0sq = (a0 + ss) * half % Q
        x0 = pow(x0sq, (Q + 1) // 4, Q)
        if x0 * x0 % Q != x0sq:
            continue
        if x0 == 0:
            continue
        x1 = a1 * pow(2 * x0 % Q, -1, Q) % Q
        cand = H.FQ2([x0, x1])
        if cand * cand == a:
            return cand
    return None


def g2_read_compressed(data: bytes, off: int):
    from ..utils import hostcurve as H

    raw = data[off : off + 64]
    if len(raw) != 64:
        raise ValueError("truncated G2 point")
    flag = raw[0] & _MASK
    if flag == _COMPRESSED_INFINITY:
        if any(raw[1:]) or (raw[0] & ~_MASK):
            raise ValueError("nonzero payload on G2 infinity")
        return None, off + 64
    if flag not in (_COMPRESSED_SMALLEST, _COMPRESSED_LARGEST):
        raise ValueError(f"bad G2 compression flag {flag:#x}")
    xa1 = int.from_bytes(bytes([raw[0] & ~_MASK]) + raw[1:32], "big")
    xa0 = int.from_bytes(raw[32:64], "big")
    if xa0 >= Q or xa1 >= Q:
        raise ValueError("G2 x-coordinate out of range")
    x = H.FQ2([xa0, xa1])
    # y^2 = x^3 + b' on the twist.
    y2 = x * x * x + H.G2_B
    y = _fq2_sqrt(y2)
    if y is None:
        raise ValueError("G2 x not on the twist")
    ya0, ya1 = int(y.coeffs[0]), int(y.coeffs[1])
    na0, na1 = (Q - ya0) % Q, (Q - ya1) % Q
    is_larger = _fq2_lex_larger((ya0, ya1), (na0, na1))
    want_larger = flag == _COMPRESSED_LARGEST
    if is_larger != want_larger:
        y = H.FQ2([na0, na1])
    pt = (x, y)
    if H.g2_mul(pt, R) is not None:
        raise ValueError("G2 point not in the r-torsion subgroup")
    return pt, off + 64


# ---------------------------------------------------------------------------
# kzg.SRS (gnark-crypto kzg/marshal.go)
# ---------------------------------------------------------------------------


def srs_to_gnark_bytes(srs) -> bytes:
    """Our kzg.SRS -> gnark-crypto kzg.SRS WriteTo stream."""
    out = [g2_bytes_compressed(srs.g2_gen), g2_bytes_compressed(srs.g2_alpha)]
    pts = srs.g1_ints()
    out.append(struct.pack(">I", len(pts)))
    out.extend(g1_bytes(p) for p in pts)
    return b"".join(out)


def srs_from_gnark_bytes(data: bytes):
    from ..kzg.kzg import SRS
    from ..ops import msm as M

    try:
        off = 0
        g2_gen, off = g2_read_compressed(data, off)
        g2_alpha, off = g2_read_compressed(data, off)
        (count,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        pts = []
        for _ in range(count):
            p, off = g1_read(data, off)
            pts.append(p)
        return SRS(g1_powers=M.affine_from_ints(pts), g2_gen=g2_gen, g2_alpha=g2_alpha)
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeKeyError(f"gnark SRS: {e}") from e


# ---------------------------------------------------------------------------
# plonk.VerifyingKey (gnark backend/plonk/bn254/marshal.go)
# ---------------------------------------------------------------------------


def vk_to_gnark_bytes(vk) -> bytes:
    """Our plonk VerifyingKey -> gnark VerifyingKey WriteTo stream.

    Field mapping: Size=n, SizeInv=1/n mod r, Generator=omega,
    NbPublicVariables, CosetShift=k1 (gnark derives the second coset as
    CosetShift^2; our K2 == K1^2 == 25 keeps this exact), S[0..2],
    Ql Qr Qm Qo Qk with Qk = our q_c.
    """
    size_inv = pow(vk.n, -1, R)
    out = [
        struct.pack(">Q", vk.n),
        fr_bytes(size_inv),
        fr_bytes(vk.generator),
        struct.pack(">Q", vk.nb_public),
        fr_bytes(vk.k1),
        g1_bytes(vk.s1),
        g1_bytes(vk.s2),
        g1_bytes(vk.s3),
        g1_bytes(vk.q_l),
        g1_bytes(vk.q_r),
        g1_bytes(vk.q_m),
        g1_bytes(vk.q_o),
        g1_bytes(vk.q_c),
    ]
    return b"".join(out)


def vk_init_kzg(vk, srs):
    """Attach an SRS's G2 pair to a rehydrated vk — our `vk.InitKZG`
    (gnark re-attaches the cached SRS the same way before verifying,
    backend/plonk/plonk.go:34-40). Returns vk for chaining."""
    vk.g2_gen = srs.g2_gen
    vk.g2_alpha = srs.g2_alpha
    return vk


def vk_from_gnark_bytes(data: bytes, g2_gen=None, g2_alpha=None, srs=None):
    """gnark VerifyingKey stream -> our VerifyingKey.

    gnark's vk does not embed the KZG G2 points (it re-attaches the SRS
    via vk.InitKZG, backend/plonk/plonk.go:34-40); pass them in the
    same way — directly, via ``srs``, or later with
    :func:`vk_init_kzg`. Without them the pairing checks in verify
    cannot run.
    """
    from ..plonk.keys import VerifyingKey

    if srs is not None:
        g2_gen, g2_alpha = srs.g2_gen, srs.g2_alpha

    try:
        (n,) = struct.unpack(">Q", data[0:8])
        off = 8
        size_inv, off = fr_read(data, off)
        generator, off = fr_read(data, off)
        (nb_public,) = struct.unpack(">Q", data[off : off + 8])
        off += 8
        k1, off = fr_read(data, off)
        if n and size_inv != pow(n, -1, R):
            raise ValueError("SizeInv inconsistent with Size")
        pts = []
        for _ in range(8):
            p, off = g1_read(data, off)
            pts.append(p)
        return VerifyingKey(
            n=n,
            nb_public=nb_public,
            generator=generator,
            k1=k1,
            k2=k1 * k1 % R,
            s1=pts[0],
            s2=pts[1],
            s3=pts[2],
            q_l=pts[3],
            q_r=pts[4],
            q_m=pts[5],
            q_o=pts[6],
            q_c=pts[7],
            g2_gen=g2_gen,
            g2_alpha=g2_alpha,
        )
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeKeyError(f"gnark vk: {e}") from e


# ---------------------------------------------------------------------------
# plonk.Proof (gnark backend/plonk/bn254/marshal.go)
# ---------------------------------------------------------------------------


@dataclass
class GnarkProof:
    """gnark v0.8's proof shape: 7 commitments + batched opening at
    zeta (H + claimed values: linearized poly, l, r, o, s1, s2) +
    the shifted opening of Z at omega*zeta."""

    lro: tuple  # 3 G1 points
    z: object
    h: tuple  # 3 G1 points
    batched_h: object
    claimed_values: list = field(default_factory=list)
    shifted_h: object = None
    z_shifted_value: int = 0


def proof_to_gnark_bytes(p: GnarkProof) -> bytes:
    out = [g1_bytes(pt) for pt in (*p.lro, p.z, *p.h, p.batched_h)]
    out.append(struct.pack(">I", len(p.claimed_values)))
    out.extend(fr_bytes(v) for v in p.claimed_values)
    out.append(g1_bytes(p.shifted_h))
    out.append(fr_bytes(p.z_shifted_value))
    return b"".join(out)


def proof_from_gnark_bytes(data: bytes) -> GnarkProof:
    try:
        off = 0
        pts = []
        for _ in range(8):
            p, off = g1_read(data, off)
            pts.append(p)
        (count,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        vals = []
        for _ in range(count):
            v, off = fr_read(data, off)
            vals.append(v)
        shifted_h, off = g1_read(data, off)
        zval, off = fr_read(data, off)
        if off != len(data):
            raise ValueError("trailing bytes after gnark proof")
        return GnarkProof(
            lro=(pts[0], pts[1], pts[2]),
            z=pts[3],
            h=(pts[4], pts[5], pts[6]),
            batched_h=pts[7],
            claimed_values=vals,
            shifted_h=shifted_h,
            z_shifted_value=zval,
        )
    except (ValueError, struct.error, IndexError) as e:
        raise DeserializeProofError(f"gnark proof: {e}") from e
