"""Four-step NTT on the MXU: DFT-as-matmul over int8 limb planes.

The scan/gather NTT (ops/ntt.py) is compile-friendly but runs on the
VPU with per-stage index gathers, which XLA serializes on TPU —
measured ~100x off HBM speed-of-light at 2^20. The FLOP-dense way to
do an NTT on a TPU is the classic four-step decomposition with both
small transforms executed as *matrix multiplications on the MXU*:

  n = n1*n2, x viewed as an (n1, n2) row-major matrix:
    1. Y = W1 @ X        -- size-n1 DFTs of all n2 columns (ONE matmul)
    2. Z = Y * T         -- twiddle w^(k1*i2), elementwise (VPU)
    3. X' = Z @ W2       -- size-n2 DFTs of all n1 rows (ONE matmul)
    4. out[k1 + n1*k2] = X'[k1, k2]  (transpose + reshape)

Modular matmul over Fr rides the int8 MXU by limb decomposition:
field elements split into 37 base-2^7 limbs (0..127 fits *signed*
int8); the product-sum's limb convolution is accumulated in int32 —
bounds: 127^2 * n1 * 37 < 2^31 for n1 <= 2048, so every partial stays
exact. The 73-digit base-2^7 accumulator is carry-normalized on the
VPU and reduced mod p with two precomputed-constant Montgomery muls
(x = x0 + x1*2^252 + x2*2^504 -> x0 + x1*c1 + x2*c2 mod p).

Montgomery bookkeeping: inputs are Montgomery-form (x*R); the DFT
matrices and twiddles are *canonical*, so W @ x_mont == (DFT x)*R —
the result is already Montgomery-form after plain mod-p reduction.

Sizes: the flat kernel supports n with both four-step factors <=
MAX_FACTOR (2048), i.e. n <= 2^22 — but transforms over 2^20 TOTAL
elements (batch included) are routed to the two-level path anyway
because the flat scan's (73, total) int32 accumulator double-buffers
past v5e HBM (measured RESOURCE_EXHAUSTED at 2^22). Larger n
(2^21-2^26, BASELINE.md table row 6) goes through a SECOND four-step
level (ntt_mxu_big):
n = n1*n2 with each factor's DFT computed by this kernel as the inner
transform — valid because the domain roots form a consistent tower
(w_n = ROOT^(2^(28-k)), so w_{2^24}^{n2} == w_{n1}). The level-2
twiddle w^(k1*i2) is applied FACTORED (k1 = b*s1 + a =>
T1[i2,a]*T2[i2,b], two mont_muls) so its tables are ~32 MB instead of
the 1 GB dense table, and the inner batch runs in lax.map chunks to
bound the int32 limb-accumulator footprint.

Cites: replaces gnark-crypto's fft.Domain work inside plonk.Prove
(reference backend/plonk/plonk.go:53-73, SURVEY.md §3.1 hot loop (b)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import bigint
from . import field as F

FR = F.FR
R_MOD = bigint.FR_MODULUS

#: int8 limb radix: 7 bits so every limb value fits signed int8.
LIMB_B = 7
#: ceil(256 / 7) planes cover the 16x16-bit Montgomery representation.
NPLANES = 37
#: Largest DFT factor whose int32 accumulation stays exact:
#: 127^2 * 2048 * 37 = 1.22e9 < 2^31.
MAX_FACTOR = 2048


def _split_factors(n: int) -> tuple[int, int]:
    k = n.bit_length() - 1
    n1 = 1 << ((k + 1) // 2)
    n2 = n // n1
    if n1 > MAX_FACTOR or n2 > MAX_FACTOR:
        raise ValueError(f"mxu_ntt supports n <= 2^22, got 2^{k}")
    return n1, n2


# ---------------------------------------------------------------------------
# Host-side tables (no device compiles — bigint.power_table lesson)
# ---------------------------------------------------------------------------


def _dft_matrix_planes(omega: int, m: int) -> np.ndarray:
    """(NPLANES, m, m) int8: canonical w^(i*j) split into 7-bit limbs.

    Row i is the geometric series of w^i — m^2 host mults total.
    """
    w_pows = [pow(omega, i, R_MOD) for i in range(m)]
    vals = np.empty((m * m,), object)
    idx = 0
    for i in range(m):
        acc = 1
        wi = w_pows[i]
        for j in range(m):
            vals[idx] = acc
            idx += 1
            acc = acc * wi % R_MOD
    # big-int -> byte matrix -> 7-bit planes (vectorized)
    buf = b"".join(int(v).to_bytes(33, "little") for v in vals)
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 33).astype(np.uint32)
    # value = sum raw[:, b] << (8b); plane l = (value >> (7l)) & 127
    planes = np.empty((NPLANES, m * m), np.int8)
    for l in range(NPLANES):
        bit0 = 7 * l
        byte0 = bit0 // 8
        off = bit0 % 8
        v = raw[:, byte0] >> off
        if byte0 + 1 < 33:
            v |= raw[:, byte0 + 1] << (8 - off)
        planes[l] = (v & 127).astype(np.int8)
    return planes.reshape(NPLANES, m, m)


def _twiddle_table(omega: int, n1: int, n2: int, spec=FR) -> np.ndarray:
    """(16, n1, n2) Montgomery-form w^(k1*i2) limb table (host)."""
    r_mont = (1 << 256) % R_MOD
    vals = []
    for k1 in range(n1):
        ratio = pow(omega, k1, R_MOD)
        acc = r_mont
        for _ in range(n2):
            vals.append(acc)
            acc = acc * ratio % R_MOD
    return bigint.ints_to_limb_array_fast(vals).reshape(16, n1, n2)


class MxuDomain:
    """Cached MXU-NTT tables for one size (fwd + inv)."""

    _cache: dict = {}

    def __init__(self, n: int):
        from .ntt import Domain

        dom = Domain.get(n)
        self.n = n
        self.n1, self.n2 = _split_factors(n)
        w = dom.w_int
        w_inv = dom.w_inv_int
        w1 = pow(w, self.n2, R_MOD)  # order n1
        w2 = pow(w, self.n1, R_MOD)  # order n2
        self.fwd = (
            jnp.asarray(_dft_matrix_planes(w1, self.n1)),
            jnp.asarray(_twiddle_table(w, self.n1, self.n2)),
            jnp.asarray(_dft_matrix_planes(w2, self.n2)),
        )
        w1i = pow(w_inv, self.n2, R_MOD)
        w2i = pow(w_inv, self.n1, R_MOD)
        self.inv = (
            jnp.asarray(_dft_matrix_planes(w1i, self.n1)),
            jnp.asarray(_twiddle_table(w_inv, self.n1, self.n2)),
            jnp.asarray(_dft_matrix_planes(w2i, self.n2)),
        )
        self.n_inv = F.from_ints([dom.n_inv_int], FR)

    @classmethod
    def get(cls, n: int) -> "MxuDomain":
        if n not in cls._cache:
            inst = cls(n)
            if isinstance(inst.fwd[0], jax.core.Tracer):
                return inst  # built inside a trace: do not cache tracers
            cls._cache[n] = inst
        return cls._cache[n]


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------

#: Reduction constants: x0 + x1*2^252 + x2*2^504 mod p, with the c_i
#: pre-multiplied by R so mont_mul(x_i, c_i) = x_i * 2^{252 i} mod p...
#: — see _reduce_acc for the exact bookkeeping.
_SPLIT_BITS = 252  # multiple of LIMB_B * 4? no: chosen multiple of 7*36/..., see below


def _to_planes(a: jax.Array) -> jax.Array:
    """(16, X) uint32 16-bit limbs -> (NPLANES, X) int8 7-bit limbs."""
    outs = []
    for l in range(NPLANES):
        bit0 = 7 * l
        limb = bit0 // 16
        off = bit0 % 16
        v = a[limb] >> np.uint32(off)
        if limb + 1 < 16:
            v = v | (a[limb + 1] << np.uint32(16 - off))
        outs.append((v & np.uint32(127)).astype(jnp.int8))
    return jnp.stack(outs, axis=0)


def _carry_to_16bit(acc: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(73, X) int32 base-2^7 digits -> three (16, X) uint32 numbers
    x0, x1, x2 with value = x0 + x1*2^252 + x2*2^504.

    Digit l sits at bit 7l; 252 = 7*36 and 504 = 7*72, so digits
    0..35 -> x0, 36..71 -> x1, 72 -> x2 (plus carries rippled within
    each 252-bit group; each group's overflow carries into the next).
    """
    acc = acc.astype(jnp.uint32)
    groups = []
    carry = jnp.zeros_like(acc[0])
    for g in range(2):
        lo = g * 36
        # ripple base-2^7 carries through the group (values < 2^31).
        normd = []
        c = carry
        for l in range(lo, lo + 36):
            s = acc[l] + c
            normd.append(s & np.uint32(127))
            c = s >> np.uint32(7)
        carry = c  # overflow of this 252-bit group -> next group
        # pack 7-bit digits into 16x16-bit limbs
        limbs = []
        for limb in range(16):
            bit0 = limb * 16
            v = jnp.zeros_like(acc[0])
            for li, d in enumerate(normd):
                dbit = 7 * li
                if dbit + 7 <= bit0 or dbit >= bit0 + 16:
                    continue
                shift = dbit - bit0
                if shift >= 0:
                    v = v | ((d << np.uint32(shift)) & np.uint32(0xFFFF))
                else:
                    v = v | ((d >> np.uint32(-shift)) & np.uint32(0xFFFF))
            limbs.append(v)
        groups.append(jnp.stack(limbs, axis=0))
    # Group 2 = digit 72 plus the incoming carry: a single < 2^32
    # value occupying limbs 0-1 of x2.
    v2 = acc[72] + carry
    zero = jnp.zeros_like(v2)
    x2 = jnp.stack(
        [v2 & np.uint32(0xFFFF), v2 >> np.uint32(16)] + [zero] * 14, axis=0
    )
    return groups[0], groups[1], x2


@functools.lru_cache(maxsize=None)
def _reduce_consts():
    c1 = pow(2, _SPLIT_BITS, R_MOD)
    c2 = pow(2, 2 * _SPLIT_BITS, R_MOD)
    r = 1 << 256
    # mont_mul(a, b) = a*b*R^{-1}; to get x_i * c_i mod p pass
    # b = c_i * R mod p. Host numpy (NOT device arrays): this cache is
    # reached inside jit traces, and caching a tracer-created array
    # would leak it into later traces.
    return (
        bigint.ints_to_limb_array_fast([c1 * r % R_MOD]),
        bigint.ints_to_limb_array_fast([c2 * r % R_MOD]),
    )


def _reduce_acc(acc: jax.Array) -> jax.Array:
    """(73, X) int32 digit accumulator -> (16, X) reduced mod p.

    Note x1, x2 < 2^256 but may exceed p; mont_mul reduces products
    fully, and the final add chain uses F.add (strict reduction), with
    x0 folded in via a mont-mul by R^2... x0 itself may exceed p, so
    it is reduced by multiplying with Montgomery 1 trick: x0 mod p =
    mont_mul(x0, R mod p ... ). Simpler: fold x0 through the same
    mont_mul path with constant 2^0: mont_mul(x0, R^2 mod p * R^{-1}?)
    — we use mont_mul(x0, r2) * ... See code: mont_mul(x0, R2) gives
    x0*R mod p (Montgomery form of x0); likewise the c_i constants
    were pre-scaled so each term lands in Montgomery form... but the
    input was ALREADY Montgomery-form math (W canonical x Montgomery),
    so the true result IS the reduced integer value of acc. Therefore
    every term must be reduced *as a plain integer*: term_i = x_i *
    c_i mod p computed as mont_mul(x_i, c_i*R mod p). x0's term uses
    c0 = 1 -> mont_mul(x0, R mod p) = x0 mod p.
    """
    x0, x1, x2 = _carry_to_16bit(acc)
    c1, c2 = _reduce_consts()
    one_r = F.const_limbs(FR.r_mod_p)  # R mod p = Montgomery 1
    bshape = x0.shape[1:]

    def bcast(c):
        return jnp.broadcast_to(c.reshape((16,) + (1,) * len(bshape)), x0.shape)

    t0 = F.mont_mul(x0, bcast(one_r), FR)  # x0 mod p
    t1 = F.mont_mul(x1, bcast(c1), FR)  # x1 * 2^252 mod p
    t2 = F.mont_mul(x2, bcast(c2), FR)  # x2 * 2^504 mod p
    return F.add(F.add(t0, t1, FR), t2, FR)


def _limb_matmul(w_planes: jax.Array, x_planes: jax.Array) -> jax.Array:
    """(NPLANES, m, m) int8 @ (NPLANES, m, b) int8 -> (73, m, b) int32
    limb-convolution accumulator: acc[k] = sum_{l1+l2=k} W_l1 @ X_l2.

    One lax.scan over l1 (37 steps), each step ONE int8 MXU matmul of
    (m, m) @ (m, NPLANES*b) and a dynamic-slice diagonal accumulate.
    """
    m = w_planes.shape[1]
    b = x_planes.shape[2]
    xflat = jnp.moveaxis(x_planes, 0, 1).reshape(m, NPLANES * b)  # (m, 37*b)
    acc = jnp.zeros((2 * NPLANES - 1, m, b), jnp.int32)

    def step(acc, args):
        l1, w_l1 = args
        p = jax.lax.dot_general(
            w_l1,
            xflat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (m, 37*b)
        p = jnp.moveaxis(p.reshape(m, NPLANES, b), 1, 0)  # (37, m, b)
        cur = jax.lax.dynamic_slice(acc, (l1, 0, 0), (NPLANES, m, b))
        return jax.lax.dynamic_update_slice(acc, cur + p, (l1, 0, 0)), None

    acc, _ = jax.lax.scan(
        step, acc, (jnp.arange(NPLANES, dtype=jnp.int32), w_planes)
    )
    return acc


def _mxu_dft(w_planes: jax.Array, x_mont: jax.Array) -> jax.Array:
    """DFT along axis -2: (16, m, b) Montgomery -> (16, m, b)."""
    m = x_mont.shape[1]
    b = x_mont.shape[2]
    planes = _to_planes(x_mont.reshape(16, m * b)).reshape(NPLANES, m, b)
    acc = _limb_matmul(w_planes, planes)  # (73, m, b)
    return _reduce_acc(acc.reshape(73, m * b)).reshape(16, m, b)


def _transform(x: jax.Array, tables, n1: int, n2: int) -> jax.Array:
    """Full four-step NTT of a (16, ..., n) Montgomery array along the
    last axis; middle axes are an independent batch transformed in the
    same pair of MXU matmuls (the batch just widens the rhs)."""
    w1, tw, w2 = tables
    batch = x.shape[1:-1]
    nb = 1
    for d in batch:
        nb *= d
    m = x.reshape(16, nb, n1, n2)
    # columns: DFT over n1 for all nb*n2 vectors — ONE matmul.
    y = jnp.moveaxis(m, 2, 1).reshape(16, n1, nb * n2)
    y = _mxu_dft(w1, y).reshape(16, n1, nb, n2)
    y = jnp.moveaxis(y, 1, 2)  # (16, nb, n1, n2)
    z = F.mont_mul(y, tw[:, None], FR)  # twiddles broadcast over batch
    # rows: DFT over n2 == DFT over axis -2 of the transpose.
    zt = jnp.swapaxes(z, 2, 3)  # (16, nb, n2, n1)
    zt = jnp.moveaxis(zt, 2, 1).reshape(16, n2, nb * n1)
    xt = _mxu_dft(w2, zt).reshape(16, n2, nb, n1)
    xt = jnp.moveaxis(xt, 1, 2)  # (16, nb, n2, n1) — [k2, k1]
    return xt.reshape((16,) + batch + (n1 * n2,))  # out[k1 + n1*k2] ✓


@functools.partial(jax.jit, static_argnames=("n1", "n2", "scale"))
def _ntt_mxu_jit(x, w1, tw, w2, n_inv, n1: int, n2: int, scale: bool):
    out = _transform(x, (w1, tw, w2), n1, n2)
    if scale:
        out = F.mont_mul(
            out,
            jnp.broadcast_to(
                n_inv.reshape((16,) + (1,) * (out.ndim - 1)), out.shape
            ),
            FR,
        )
    return out


def ntt_mxu(x: jax.Array, inverse: bool = False) -> jax.Array:
    """MXU four-step (I)NTT of a (16, ..., n) Montgomery-form array
    along the last axis (middle axes batch), natural order in/out.
    ONE dispatch; compiles as 2x37 int8 matmuls plus elementwise
    reduction. Tables are runtime arguments (not trace-time constants)
    so the compiled graph stays small. Transforms with more than 2^20
    total elements (batch included) route through the two-level
    decomposition (ntt_mxu_big): the flat kernel's scan carries a
    (73, batch*n) int32 limb accumulator whose double-buffering
    exhausted v5e HBM at 2^22 (measured RESOURCE_EXHAUSTED); the
    two-level path chunks that accumulator to ~150 MB."""
    total = 1
    for d in x.shape[1:]:
        total *= d
    if total > (1 << 20):
        return ntt_mxu_big(x, inverse)
    dom = MxuDomain.get(x.shape[-1])
    w1, tw, w2 = dom.inv if inverse else dom.fwd
    # NOTE: deliberately NOT routed through utils/aot.py — this graph
    # traces in seconds (tables are runtime args, the compiled module
    # stays small) and the exported-call wrapper measurably slowed the
    # steady-state dispatch (0.8 s -> 3.4 s per 2^20 transform under
    # bench conditions). AOT is for kernels whose TRACING dominates
    # cold start (the Pallas MSM: ~9 MB StableHLO, 60-130 s).
    return _ntt_mxu_jit(x, w1, tw, w2, dom.n_inv, dom.n1, dom.n2, inverse)


# ---------------------------------------------------------------------------
# Two-level four-step for n > 2^22 (single-chip 2^23..2^26)
# ---------------------------------------------------------------------------


class MxuBigDomain:
    """Cached level-2 tables: factored twiddles for n = n1 * n2 where
    each factor's DFT runs as an inner ntt_mxu call."""

    _cache: dict = {}

    def __init__(self, n: int):
        from .ntt import Domain

        k = n.bit_length() - 1
        self.n = n
        self.n1 = 1 << ((k + 1) // 2)
        self.n2 = n // self.n1
        if self.n1 > (1 << 22) or self.n2 > (1 << 22):
            raise ValueError(f"ntt_mxu_big: factors of 2^{k} exceed the inner cap")
        # Factor k1 = b*s1 + a: T1[i2, a] = w^(a*i2), T2[i2, b] =
        # (w^s1)^(b*i2) — tables (16, n2, s1) + (16, n2, n1/s1).
        self.s1 = 1 << (self.n1.bit_length() // 2)
        dom = Domain.get(n)
        self.fwd = self._twiddle_pair(dom.w_int)
        self.inv = self._twiddle_pair(dom.w_inv_int)

    def _twiddle_pair(self, omega: int):
        r_mont = (1 << 256) % R_MOD
        n2, s1, t1_w = self.n2, self.s1, self.n1 // self.s1
        omega_s1 = pow(omega, s1, R_MOD)

        def table(base_root: int, width: int) -> jax.Array:
            # Row i2 is geometric in the second index with ratio
            # base_root^i2 — n2*width host modmuls, Montgomery form.
            vals = []
            ratio = 1
            for _i2 in range(n2):
                acc = r_mont
                for _a in range(width):
                    vals.append(acc)
                    acc = acc * ratio % R_MOD
                ratio = ratio * base_root % R_MOD
            return jnp.asarray(
                bigint.ints_to_limb_array_fast(vals).reshape(16, n2, width)
            )

        return table(omega, s1), table(omega_s1, t1_w)

    @classmethod
    def get(cls, n: int) -> "MxuBigDomain":
        if n not in cls._cache:
            inst = cls(n)
            if isinstance(inst.fwd[0], jax.core.Tracer):
                return inst
            cls._cache[n] = inst
        return cls._cache[n]


def _inner_batched(x: jax.Array, inverse: bool, chunk: int) -> jax.Array:
    """Inner (<=2^22) transform of (16, B, m) along the last axis,
    lax.map-chunked over B to bound the (73, ...) int32 accumulator
    (~292 * chunk * m bytes live per step)."""
    b_tot, m = x.shape[1], x.shape[2]
    dom = MxuDomain.get(m)
    w1, tw, w2 = dom.inv if inverse else dom.fwd
    if b_tot <= chunk or b_tot % chunk:
        return _ntt_mxu_jit(x, w1, tw, w2, dom.n_inv, dom.n1, dom.n2, inverse)
    g = b_tot // chunk
    xg = jnp.moveaxis(x.reshape(16, g, chunk, m), 1, 0)  # (g, 16, chunk, m)
    yg = jax.lax.map(
        lambda s: _transform_scaled(s, (w1, tw, w2), dom, inverse), xg
    )
    return jnp.moveaxis(yg, 0, 1).reshape(16, b_tot, m)


def _transform_scaled(x, tables, dom, inverse: bool):
    out = _transform(x, tables, dom.n1, dom.n2)
    if inverse:
        out = F.mont_mul(
            out,
            jnp.broadcast_to(
                dom.n_inv.reshape((16,) + (1,) * (out.ndim - 1)), out.shape
            ),
            FR,
        )
    return out


#: Target live elements per inner-transform chunk (acc bytes ~ 292x).
_CHUNK_TARGET = 1 << 19


@functools.partial(
    jax.jit, static_argnames=("n1", "n2", "s1", "inverse", "chunk")
)
def _ntt_mxu_big_jit(x, t1, t2, n1: int, n2: int, s1: int, inverse: bool, chunk: int):
    batch = x.shape[1:-1]
    nb = 1
    for d in batch:
        nb *= d
    m = x.reshape(16, nb, n1, n2)
    # Steps 1+2 fused and CHUNKED over i2: DFT_{n1} of every column
    # (root w^n2 == w_{n1} by the tower identity) then the factored
    # twiddle w^{+-k1*i2} (k1 = b*s1 + a). The twiddle mont_muls must
    # live INSIDE the chunk map: XLA cannot fuse the 16-limb CIOS
    # chain, so a full-width (16, 2^24) mont_mul materializes ~35 GB
    # of temps (measured OOM); per-chunk the temps are ~tens of MB.
    y = jnp.swapaxes(m, 2, 3).reshape(16, nb * n2, n1)
    t1b = jnp.broadcast_to(t1[:, None], (16, nb) + t1.shape[1:]).reshape(
        16, nb * n2, s1
    )
    t2b = jnp.broadcast_to(t2[:, None], (16, nb) + t2.shape[1:]).reshape(
        16, nb * n2, n1 // s1
    )
    dom1 = MxuDomain.get(n1)
    w1a, tw1, w1b = dom1.inv if inverse else dom1.fwd

    def ab_body(args):
        xc, t1c, t2c = args  # (16, C, n1), (16, C, s1), (16, C, n1//s1)
        yc = _transform_scaled(xc, (w1a, tw1, w1b), dom1, inverse)
        y4 = yc.reshape(16, xc.shape[1], n1 // s1, s1)
        z = F.mont_mul(y4, t1c[:, :, None, :], FR)
        z = F.mont_mul(z, t2c[:, :, :, None], FR)
        return z.reshape(16, xc.shape[1], n1)

    b_tot = nb * n2
    if b_tot <= chunk or b_tot % chunk:
        y = ab_body((y, t1b, t2b))
    else:
        g = b_tot // chunk

        def to_chunks(a, w):
            return jnp.moveaxis(a.reshape(16, g, chunk, w), 1, 0)

        yg = jax.lax.map(
            ab_body,
            (to_chunks(y, n1), to_chunks(t1b, s1), to_chunks(t2b, n1 // s1)),
        )
        y = jnp.moveaxis(yg, 0, 1).reshape(16, b_tot, n1)
    y = y.reshape(16, nb, n2, n1)
    # Step 3: DFT_{n2} along i2 for each k1 (root w^n1), chunked.
    zt = jnp.swapaxes(y, 2, 3).reshape(16, nb * n1, n2)
    xp = _inner_batched(zt, inverse, chunk).reshape(16, nb, n1, n2)
    # Step 4: out[b*s1+a + n1*k2] = X'[k1, k2].
    out = jnp.swapaxes(xp, 2, 3)  # (16, nb, k2, k1)
    return out.reshape((16,) + batch + (n1 * n2,))


def ntt_mxu_big(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Two-level four-step (I)NTT for n in 2^23..2^26 (see module
    docstring). The inverse needs no extra 1/n scale: the two inner
    inverse transforms contribute 1/n1 * 1/n2 = 1/n."""
    dom = MxuBigDomain.get(x.shape[-1])
    t1, t2 = dom.inv if inverse else dom.fwd
    chunk = max(1, _CHUNK_TARGET // max(dom.n1, dom.n2))
    return _ntt_mxu_big_jit(
        x, t1, t2, dom.n1, dom.n2, dom.s1, inverse, chunk
    )
