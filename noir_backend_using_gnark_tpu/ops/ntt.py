"""Radix-2 NTT / INTT over BN254 Fr for TPU (JAX/XLA).

Replaces gnark-crypto's ``fft.Domain`` (the FFTs inside gnark's
``plonk.Prove`` — SURVEY.md §3.1 hot path (b)) with a vectorized
iterative Cooley-Tukey transform over the limb field layer.

Design (TPU-first):

  * The WHOLE transform is one jitted kernel per size: all log2(n)
    butterfly stages unroll at trace time into a single fused XLA
    computation. Round 1 drove the stages from Python — through the
    TPU relay that cost one host round-trip + twiddle re-gather per
    stage (measured 129 ms for a 2^18 transform whose math is ~2 ms);
    the fused kernel is one dispatch.
  * Twiddles come from ONE device-resident power table per domain;
    each stage takes a *static strided slice* of it (no gathers, no
    host index transfers).
  * Transforms are batched: input (16, ..., n) transforms along the
    last axis, so the prover can run many same-size NTTs in one call.
  * Coset transforms scale by powers of the coset shift on the way
    in/out.

All domain metadata is host-side and static; nothing data-dependent is
traced. The multi-chip (sharded) variant lives in
``parallel/dist_ntt.py`` and reuses :func:`ntt_stages`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import bigint
from . import field as F

FR = F.FR


# ---------------------------------------------------------------------------
# Power tables / domains
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n", "spec"))
def powers_of(base: jax.Array, n: int, spec: F.FieldSpec) -> jax.Array:
    """[1, b, b^2, ..., b^{n-1}] (Montgomery), shape (16, n).

    Device-side geometric series via an associative scan — avoids n host
    bigint pows, which would dominate setup for 2^20+ domains.
    """
    one = F.one_mont(spec, (1,))
    if n == 1:
        return one
    seq = jnp.concatenate([one, jnp.broadcast_to(base.reshape(16, 1), (16, n - 1))], axis=1)
    return jax.lax.associative_scan(functools.partial(F.mont_mul, spec=spec), seq, axis=1)


def _cache_dev(obj, attr: str, build):
    """Populate ``obj.attr`` with a device array, tracer-safe.

    Domain tables are built lazily, and the first touch can happen
    *inside* a jit/shard_map trace (e.g. parallel/dist_ntt.four_step
    calling ``Domain.fwd_table`` while tracing). ``jnp.asarray`` then
    yields a trace-local tracer; caching it leaks it into every later
    trace (UnexpectedTracerError in the round-3 multichip dryrun). So:
    return the value either way, but only cache concrete arrays.
    """
    cur = getattr(obj, attr)
    if cur is not None:
        return cur
    val = jnp.asarray(build())
    if not isinstance(val, jax.core.Tracer):
        setattr(obj, attr, val)
    return val


def bit_reverse_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation indices for size n = 2^k (host, static)."""
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros_like(idx)
    for i in range(k):
        rev |= ((idx >> i) & 1) << (k - 1 - i)
    return rev.astype(np.int32)


class Domain:
    """Radix-2 evaluation domain of size n = 2^k over Fr.

    Caches the root-of-unity power table (device) and bit-reversal
    permutation (host + device). Mirrors the role of gnark's
    ``fft.NewDomain`` used by plonk.Setup / Prove (reference L0).
    """

    _cache: dict = {}

    def __init__(self, n: int, spec: F.FieldSpec = FR):
        if n & (n - 1) or n == 0:
            raise ValueError("domain size must be a power of two")
        k = n.bit_length() - 1
        if k > bigint.FR_TWO_ADICITY:
            raise ValueError(f"domain 2^{k} exceeds BN254 Fr 2-adicity 28")
        self.n = n
        self.k = k
        self.spec = spec
        self.w_int = pow(bigint.FR_ROOT_OF_UNITY, 1 << (bigint.FR_TWO_ADICITY - k), spec.modulus)
        self.w_inv_int = pow(self.w_int, -1, spec.modulus)
        self.n_inv_int = pow(n, -1, spec.modulus)
        self.rev = bit_reverse_perm(n)
        self._rev_dev = None
        self._fwd_table = None
        self._inv_table = None
        self._n_inv_dev = None
        self._x_powers = None

    @classmethod
    def get(cls, n: int) -> "Domain":
        if n not in cls._cache:
            cls._cache[n] = cls(n)
        return cls._cache[n]

    def rev_dev(self) -> jax.Array:
        return _cache_dev(self, "_rev_dev", lambda: self.rev)

    def fwd_table(self) -> jax.Array:
        # Host-side power chain (bigint.power_table): one device compile
        # of the scan kernel costs 10-60 s on this relay host; the host
        # chain is ~0.5 us/element and needs no compile at all.
        return _cache_dev(
            self,
            "_fwd_table",
            lambda: bigint.power_table(
                self.w_int, max(self.n // 2, 1), self.spec.modulus
            ),
        )

    def inv_table(self) -> jax.Array:
        return _cache_dev(
            self,
            "_inv_table",
            lambda: bigint.power_table(
                self.w_inv_int, max(self.n // 2, 1), self.spec.modulus
            ),
        )

    def x_powers(self) -> jax.Array:
        """[w^0 .. w^{n-1}] (16, n) Montgomery — the domain points
        themselves (host-generated, cached)."""
        return _cache_dev(
            self,
            "_x_powers",
            lambda: bigint.power_table(self.w_int, self.n, self.spec.modulus),
        )

    def n_inv_dev(self) -> jax.Array:
        p = self.spec.modulus
        return _cache_dev(
            self,
            "_n_inv_dev",
            lambda: bigint.ints_to_limb_array(
                [self.n_inv_int * ((1 << 256) % p) % p]
            ),
        )


# ---------------------------------------------------------------------------
# Core transform
# ---------------------------------------------------------------------------


def ntt_stages(a: jax.Array, table: jax.Array, rev) -> jax.Array:
    """All DIT butterfly stages, traced inline (call under jit).

    ``a``: (16, ..., n) working array, transform along the last axis;
    ``table``: (16, n/2) twiddle power table ([w^0 .. w^{n/2-1}]);
    ``rev``: (n,) bit-reversal indices (host np or device array).

    The log2(n) stages run under ONE ``lax.scan`` whose body has a
    *constant shape*: butterfly indices and twiddle positions are
    derived in-body from the traced stage number with shifts/masks, so
    the compiled graph holds a single stage (gather + mont_mul +
    add/sub + two unique-index scatters) regardless of n. The earlier
    unrolled form embedded all log2(n) stages in the graph — on this
    relay host its XLA compile went superlinear (2^18: >9 min; the scan
    form compiles like a single mont_mul kernel).

    Shared by the single-chip fused kernel and the shard_map bodies in
    parallel/dist_ntt.py (where it must be part of one traced
    computation crossing collective boundaries).
    """
    n = a.shape[-1]
    k = n.bit_length() - 1
    a = jnp.take(a, rev, axis=-1)
    if k == 0:
        return a
    half_n = n // 2
    p = jnp.arange(half_n, dtype=jnp.int32)
    q = jnp.arange(n, dtype=jnp.int32)
    logn = jnp.int32(k)

    def stage(carry, s):
        # s in 1..k (traced). m = 2^s, half = 2^{s-1}. Gather-only: the
        # butterfly results land as concat([u+v, u-v]) in pair order and
        # a final arithmetic-index gather restores natural order (TPU
        # scatters serialize; gathers vectorize).
        half = jnp.left_shift(jnp.int32(1), s - 1)
        j = p & (half - 1)
        block = p >> (s - 1)
        i0 = (block << s) + j
        u = jnp.take(carry, i0, axis=-1)
        v = jnp.take(carry, i0 + half, axis=-1)
        tw = jnp.take(table, j << (logn - s), axis=-1)
        tw_b = tw.reshape((16,) + (1,) * (carry.ndim - 2) + (half_n,))
        v = F.mont_mul(v, tw_b, FR)
        cat = jnp.concatenate([F.add(u, v, FR), F.sub(u, v, FR)], axis=-1)
        # Output position q holds plus[...] if (q mod m) < half else
        # minus[...], both at pair index (q >> s)*half + (q mod half).
        within = q & ((half << 1) - 1)
        src = (q >> s) * half + (within & (half - 1))
        src = src + jnp.where(within < half, 0, half_n)
        return jnp.take(cat, src, axis=-1), None

    a, _ = jax.lax.scan(stage, a, jnp.arange(1, k + 1, dtype=jnp.int32))
    return a


@jax.jit
def _fused_transform(a: jax.Array, table: jax.Array, rev: jax.Array) -> jax.Array:
    return ntt_stages(a, table, rev)


@jax.jit
def _fused_transform_scaled(
    a: jax.Array, table: jax.Array, rev: jax.Array, scale: jax.Array
) -> jax.Array:
    """Transform followed by a broadcast scalar multiply (INTT 1/n)."""
    out = ntt_stages(a, table, rev)
    return F.mont_mul(out, jnp.broadcast_to(scale.reshape((16,) + (1,) * (out.ndim - 1)), out.shape), FR)


@jax.jit
def _scale(a: jax.Array, s: jax.Array) -> jax.Array:
    """Elementwise multiply by a broadcast scalar of Fr."""
    return F.mont_mul(a, jnp.broadcast_to(s.reshape((16,) + (1,) * (a.ndim - 1)), a.shape), FR)


def ntt(a: jax.Array, domain: Domain | None = None) -> jax.Array:
    """Forward NTT: coefficients -> evaluations on the subgroup.

    ``a``: (16, ..., n) Montgomery-form Fr, transform along the last
    axis (extra axes are a batch of independent polynomials). Natural
    order in, natural order out. ONE device dispatch.
    """
    domain = domain or Domain.get(a.shape[-1])
    return _fused_transform(a, domain.fwd_table(), domain.rev_dev())


def intt(a: jax.Array, domain: Domain | None = None) -> jax.Array:
    """Inverse NTT: evaluations -> coefficients. ONE device dispatch."""
    domain = domain or Domain.get(a.shape[-1])
    return _fused_transform_scaled(
        a, domain.inv_table(), domain.rev_dev(), domain.n_inv_dev()
    )


# ---------------------------------------------------------------------------
# Coset transforms (for quotient-domain evaluation in PLONK)
# ---------------------------------------------------------------------------


class _CosetScale:
    """Cache of [g^0..g^{n-1}] coset scale vectors per (shift, n, inverse)."""

    _cache: dict = {}

    @classmethod
    def get(cls, shift_int: int, n: int, inverse: bool) -> jax.Array:
        key = (shift_int, n, inverse)
        if key not in cls._cache:
            base_int = pow(shift_int, -1, FR.modulus) if inverse else shift_int
            val = jnp.asarray(bigint.power_table(base_int, n, FR.modulus))
            if isinstance(val, jax.core.Tracer):
                return val  # trace-local: do not cache (see _cache_dev)
            cls._cache[key] = val
        return cls._cache[key]


def coset_ntt(a: jax.Array, shift_int: int, domain: Domain | None = None) -> jax.Array:
    """Evaluate the polynomial on the coset g*H: scale coeff i by g^i, NTT."""
    n = a.shape[-1]
    domain = domain or Domain.get(n)
    scale = _CosetScale.get(shift_int, n, False)
    return ntt(_scale_vec(a, scale), domain)


def coset_intt(a: jax.Array, shift_int: int, domain: Domain | None = None) -> jax.Array:
    """Inverse of :func:`coset_ntt`."""
    n = a.shape[-1]
    domain = domain or Domain.get(n)
    scale = _CosetScale.get(shift_int, n, True)
    return _scale_vec(intt(a, domain), scale)


@jax.jit
def _scale_vec(a: jax.Array, scale: jax.Array) -> jax.Array:
    """Multiply along the last axis by a (16, n) vector (broadcast over
    any batch axes)."""
    return F.mont_mul(a, scale.reshape((16,) + (1,) * (a.ndim - 2) + (scale.shape[-1],)), FR)
