"""Radix-2 NTT / INTT over BN254 Fr for TPU (JAX/XLA).

Replaces gnark-crypto's ``fft.Domain`` (the FFTs inside gnark's
``plonk.Prove`` — SURVEY.md §3.1 hot path (b)) with a vectorized
iterative Cooley-Tukey transform over the limb field layer:

  * decimation-in-time with a host-precomputed bit-reversal permutation,
  * per-stage butterflies are whole-array ops: one batched ``mont_mul``
    (n/2 lanes) + one ``add`` + one ``sub`` per stage — k stages total,
  * twiddle factors come from a device-computed geometric power table
    (associative scan — O(n) multiplies at O(log n) depth), sliced per
    stage with static gather indices,
  * coset transforms scale by powers of the coset shift on the way in/out.

All domain metadata is host-side and static; nothing data-dependent is
traced. The multi-chip (sharded) variant lives in
``parallel/dist_ntt.py`` and reuses these local stages.
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
    seq = jnp.concatenate([one, jnp.broadcast_to(base.reshape(16, 1), (16, n - 1))], axis=1)
    return jax.lax.associative_scan(functools.partial(F.mont_mul, spec=spec), seq, axis=1)


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

    Caches the root-of-unity power table and bit-reversal permutation.
    Mirrors the role of gnark's ``fft.NewDomain`` used by plonk.Setup /
    Prove (reference L0).
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
        self._fwd_table = None
        self._inv_table = None

    @classmethod
    def get(cls, n: int) -> "Domain":
        if n not in cls._cache:
            cls._cache[n] = cls(n)
        return cls._cache[n]

    def fwd_table(self) -> jax.Array:
        # ensure_compile_time_eval: the lazy fill may first be hit inside
        # a jit trace; without it a tracer would leak into the cache and
        # poison every later transform (UnexpectedTracerError).
        if self._fwd_table is None:
            with jax.ensure_compile_time_eval():
                base = F.from_ints([self.w_int], self.spec)
                self._fwd_table = powers_of(base, max(self.n // 2, 1), self.spec)
        return self._fwd_table

    def inv_table(self) -> jax.Array:
        if self._inv_table is None:
            with jax.ensure_compile_time_eval():
                base = F.from_ints([self.w_inv_int], self.spec)
                self._inv_table = powers_of(base, max(self.n // 2, 1), self.spec)
        return self._inv_table


# ---------------------------------------------------------------------------
# Core transform
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("half",))
def _ntt_stage(a: jax.Array, tw: jax.Array, half: int) -> jax.Array:
    """One DIT butterfly stage. a: (16, n) working array; tw: (16, half).

    One compiled kernel per (n, half) pair — the transform is driven
    stage-by-stage from Python so each XLA graph holds a single
    ``mont_mul`` (see ops/scan_utils.py for why).
    """
    n = a.shape[1]
    m = 2 * half
    a = a.reshape(16, n // m, m)
    u = a[:, :, :half]
    v = F.mont_mul(a[:, :, half:], tw[:, None, :], FR)
    out = jnp.concatenate([F.add(u, v, FR), F.sub(u, v, FR)], axis=2)
    return out.reshape(16, n)


@jax.jit
def _scale(a: jax.Array, s: jax.Array) -> jax.Array:
    """Elementwise multiply by a broadcast scalar or vector of Fr."""
    return F.mont_mul(a, jnp.broadcast_to(s.reshape(16, -1), a.shape), FR)


def _transform(a: jax.Array, domain: Domain, table: jax.Array) -> jax.Array:
    a = jnp.take(a, jnp.asarray(domain.rev), axis=1)
    n = domain.n
    for s in range(1, domain.k + 1):
        half = 1 << (s - 1)
        stride = n // (2 * half)
        idx = (np.arange(half) * stride).astype(np.int32)
        tw = jnp.take(table, jnp.asarray(idx), axis=1)  # (16, half)
        a = _ntt_stage(a, tw, half)
    return a


def ntt(a: jax.Array, domain: Domain | None = None) -> jax.Array:
    """Forward NTT: coefficients -> evaluations on the subgroup.

    ``a``: (16, n) Montgomery-form Fr. Natural order in, natural order out.
    """
    domain = domain or Domain.get(a.shape[1])
    return _transform(a, domain, domain.fwd_table())


def intt(a: jax.Array, domain: Domain | None = None) -> jax.Array:
    """Inverse NTT: evaluations -> coefficients."""
    domain = domain or Domain.get(a.shape[1])
    out = _transform(a, domain, domain.inv_table())
    n_inv = F.from_ints([domain.n_inv_int], FR)
    return _scale(out, n_inv)


# ---------------------------------------------------------------------------
# Coset transforms (for quotient-domain evaluation in PLONK)
# ---------------------------------------------------------------------------


def coset_ntt(a: jax.Array, shift_int: int, domain: Domain | None = None) -> jax.Array:
    """Evaluate the polynomial on the coset g*H: scale coeff i by g^i, NTT."""
    n = a.shape[1]
    domain = domain or Domain.get(n)
    g = F.from_ints([shift_int], FR)
    scale = powers_of(g, n, FR)
    return ntt(_scale_vec(a, scale), domain)


def coset_intt(a: jax.Array, shift_int: int, domain: Domain | None = None) -> jax.Array:
    """Inverse of :func:`coset_ntt`."""
    n = a.shape[1]
    domain = domain or Domain.get(n)
    ginv = F.from_ints([pow(shift_int, -1, FR.modulus)], FR)
    scale = powers_of(ginv, n, FR)
    return _scale_vec(intt(a, domain), scale)


@jax.jit
def _scale_vec(a: jax.Array, scale: jax.Array) -> jax.Array:
    return F.mont_mul(a, scale, FR)
