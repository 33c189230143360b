"""Batched BN254 prime-field arithmetic for TPU (JAX/XLA).

This layer replaces gnark-crypto's ``fr.Element``/``fq.Element`` scalar
arithmetic (the engine under gnark's ``plonk.Prove`` — the L0 layer of
SURVEY.md) with *vectorized* arithmetic designed for the TPU VPU:

  * A batch of field elements is a ``uint32`` array of shape
    ``(16, *batch)`` — 16 little-endian limbs of 16 bits, limb-major so
    one limb of the whole batch is contiguous on vector lanes.
  * Every partial product of two 16-bit limbs fits exactly in a uint32
    (``(2^16-1)^2 < 2^32``), so the schoolbook/CIOS inner loop needs no
    widening type: multiply in uint32, split with ``& 0xFFFF`` / ``>> 16``.
  * All loops over limbs are static Python loops — they unroll at trace
    time into a single fused elementwise XLA computation; there is no
    data-dependent control flow anywhere.
  * Elements are kept in Montgomery form (R = 2^256) end-to-end; only the
    codec boundary (utils/bigint.py) converts to canonical integers.

The same code serves Fr (scalars/polynomials) and Fq (point coordinates)
via a static :class:`FieldSpec`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import bigint

LIMB_BITS = bigint.LIMB_BITS  # 16
NUM_LIMBS = bigint.NUM_LIMBS  # 16
MASK = bigint.LIMB_MASK  # 0xFFFF

_U32 = jnp.uint32


class FieldSpec(NamedTuple):
    """Static description of a prime field in the 16x16-bit limb scheme.

    Hashable and compared by value, so it can be a static argument of
    jitted functions.
    """

    name: str
    modulus: int
    p_limbs: Tuple[int, ...]  # modulus, 16 LE limbs
    n0: int  # -p^{-1} mod 2^16 (Montgomery constant)
    r_mod_p: Tuple[int, ...]  # R mod p == one in Montgomery form
    r2_mod_p: Tuple[int, ...]  # R^2 mod p (for to-Montgomery conversion)


def make_field_spec(name: str, modulus: int) -> FieldSpec:
    r = 1 << (LIMB_BITS * NUM_LIMBS)
    return FieldSpec(
        name=name,
        modulus=modulus,
        p_limbs=bigint.int_to_limbs(modulus),
        n0=(-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS),
        r_mod_p=bigint.int_to_limbs(r % modulus),
        r2_mod_p=bigint.int_to_limbs(r * r % modulus),
    )


FR = make_field_spec("bn254_fr", bigint.FR_MODULUS)
FQ = make_field_spec("bn254_fq", bigint.FQ_MODULUS)
# BLS12-381 scalar field (255-bit, fits the 16x16 limb scheme) — the
# reference's bls12_381 cargo feature surface; see utils/bigint.py.
BLS_FR = make_field_spec("bls12_381_fr", bigint.BLS_FR_MODULUS)


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------


def zeros(batch_shape=(), dtype=_U32) -> jax.Array:
    return jnp.zeros((NUM_LIMBS, *batch_shape), dtype)


def const_limbs(limbs: Tuple[int, ...], batch_shape=()) -> jax.Array:
    """Broadcast a static limb tuple over a batch shape."""
    arr = np.array(limbs, dtype=np.uint32).reshape((NUM_LIMBS,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(arr, (NUM_LIMBS, *batch_shape))


def one_mont(spec: FieldSpec, batch_shape=()) -> jax.Array:
    """Montgomery-form 1 (= R mod p)."""
    return const_limbs(spec.r_mod_p, batch_shape)


def from_ints(values, spec: FieldSpec, to_mont: bool = True) -> jax.Array:
    """Host ints -> device limb array (16, N), optionally in Montgomery form.

    The Montgomery conversion is done host-side (cheap, exact) so the
    result is ready for device arithmetic with no extra kernel.
    """
    p = spec.modulus
    r = 1 << (LIMB_BITS * NUM_LIMBS)
    vals = [int(v) % p for v in values]
    if to_mont:
        vals = [v * r % p for v in vals]
    return jnp.asarray(bigint.ints_to_limb_array(vals))


def to_ints(x, spec: FieldSpec, from_mont: bool = True) -> list:
    """Device limb array -> host ints (undoing Montgomery form)."""
    p = spec.modulus
    r_inv = pow(1 << (LIMB_BITS * NUM_LIMBS), -1, p)
    vals = bigint.limb_array_to_ints(np.asarray(x))
    if from_mont:
        vals = [v * r_inv % p for v in vals]
    return vals


# ---------------------------------------------------------------------------
# Add / sub / neg  (strictly reduced representatives in [0, p))
# ---------------------------------------------------------------------------


def _carry_chain(limbs):
    """Propagate 16-bit carries through a list of uint32 lane arrays.

    Input limbs may hold values up to ~2^31; output limbs are < 2^16 and
    the final carry is returned.
    """
    out = []
    carry = jnp.zeros_like(limbs[0])
    for limb in limbs:
        s = limb + carry
        out.append(s & MASK)
        carry = s >> LIMB_BITS
    return out, carry


def _sub_limbs(a_limbs, b_limbs):
    """a - b with borrow chain; returns (diff limbs, borrow flag 0/1)."""
    out = []
    borrow = jnp.zeros_like(a_limbs[0])
    for ai, bi in zip(a_limbs, b_limbs):
        # Work in uint32: ai + 2^16 - bi - borrow keeps everything positive.
        s = ai + jnp.uint32(1 << LIMB_BITS) - bi - borrow
        out.append(s & MASK)
        borrow = jnp.uint32(1) - (s >> LIMB_BITS)
    return out, borrow


def _select(cond, a_limbs, b_limbs):
    """Per-lane select between two limb lists (cond broadcast over limbs)."""
    return [jnp.where(cond, ai, bi) for ai, bi in zip(a_limbs, b_limbs)]


def _unstack(x):
    return [x[i] for i in range(NUM_LIMBS)]


def _stack(limbs):
    return jnp.stack(limbs, axis=0)


@functools.partial(jax.jit, static_argnames=("spec",))
def add(a: jax.Array, b: jax.Array, spec: FieldSpec) -> jax.Array:
    """(a + b) mod p, inputs/outputs strictly reduced."""
    p = [jnp.uint32(l) for l in spec.p_limbs]
    s, carry = _carry_chain([ai + bi for ai, bi in zip(_unstack(a), _unstack(b))])
    d, borrow = _sub_limbs(s, p)
    # Subtract p when the raw sum overflowed 2^256 or is >= p.
    need_sub = (carry > 0) | (borrow == 0)
    return _stack(_select(need_sub, d, s))


@functools.partial(jax.jit, static_argnames=("spec",))
def sub(a: jax.Array, b: jax.Array, spec: FieldSpec) -> jax.Array:
    """(a - b) mod p."""
    p = [jnp.uint32(l) for l in spec.p_limbs]
    d, borrow = _sub_limbs(_unstack(a), _unstack(b))
    dp, _ = _carry_chain([di + pi for di, pi in zip(d, p)])
    return _stack(_select(borrow > 0, dp, d))


@functools.partial(jax.jit, static_argnames=("spec",))
def neg(a: jax.Array, spec: FieldSpec) -> jax.Array:
    """(-a) mod p (maps 0 to 0)."""
    p = [jnp.uint32(l) for l in spec.p_limbs]
    d, _ = _sub_limbs(p, _unstack(a))
    nz = is_zero(a)
    return _stack(_select(nz, [jnp.zeros_like(x) for x in d], d))


def is_zero(a: jax.Array) -> jax.Array:
    """Boolean lane array: a == 0 (canonical representatives assumed)."""
    acc = a[0] == 0
    for i in range(1, NUM_LIMBS):
        acc = acc & (a[i] == 0)
    return acc


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    acc = a[0] == b[0]
    for i in range(1, NUM_LIMBS):
        acc = acc & (a[i] == b[i])
    return acc


def select(cond: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Lanewise a if cond else b (cond has the batch shape)."""
    return jnp.where(cond[None, ...], a, b)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS over 16-bit words)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_mul(a: jax.Array, b: jax.Array, spec: FieldSpec) -> jax.Array:
    """Montgomery product a*b*R^{-1} mod p: CIOS with *lazy carries*.

    The accumulator ``t`` is a (17, batch) uint32 array whose limbs hold
    unreduced sums of 16-bit pieces. Each of the 16 outer iterations does
    whole-limb-axis vector ops only (one multiply of ``a_i * b``, one of
    ``m * p``, shifted adds of their lo/hi halves) — no per-limb scalar
    carry chain, no while loop. Bound: each iteration adds at most four
    <2^16 pieces per limb, so t stays < 64*2^16 = 2^22 << 2^32.

    Montgomery invariant: t[0] always carries its *full* lazy value, so
    ``m = (t[0] * n0) mod 2^16`` is exact, and the shift-down step
    forwards ``t[0] >> 16`` into the next limb.

    Final carry normalization is 3 vector rounds (values < 2^22 need at
    most ceil(22-16)=6 bits of ripple, and each round strictly reduces
    the carry mass) followed by the conditional subtract of p.
    """
    p_vec = jnp.asarray(np.array(spec.p_limbs, np.uint32))
    n0 = jnp.uint32(spec.n0)
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    p_col = p_vec.reshape((NUM_LIMBS,) + (1,) * len(bshape))
    bb = jnp.broadcast_to(b, (NUM_LIMBS,) + bshape)
    t = jnp.zeros((NUM_LIMBS + 1,) + bshape, _U32)
    zero_row = jnp.zeros((1,) + bshape, _U32)

    for i in range(NUM_LIMBS):
        prod = a[i] * bb  # (16, B), exact in uint32
        t = t + jnp.concatenate([prod & MASK, zero_row], axis=0)
        t = t + jnp.concatenate([zero_row, prod >> LIMB_BITS], axis=0)
        m = (t[0] * n0) & MASK
        q = m * p_col
        t = t + jnp.concatenate([q & MASK, zero_row], axis=0)
        t = t + jnp.concatenate([zero_row, q >> LIMB_BITS], axis=0)
        # Low limb is now 0 mod 2^16; shift down, forwarding its carry.
        carry0 = t[0] >> LIMB_BITS
        t = jnp.concatenate([t[1:], zero_row], axis=0)
        t = t.at[0].add(carry0)

    # Two vector rounds shrink limbs to < 2^16 + 1; the exact sequential
    # chain then resolves the (rare) remaining ripple.
    for _ in range(2):
        t = (t & MASK) + jnp.concatenate([zero_row, (t >> LIMB_BITS)[:-1]], axis=0)
    normalized, _ = _carry_chain([t[i] for i in range(NUM_LIMBS + 1)])

    res = normalized[:NUM_LIMBS]
    top = normalized[NUM_LIMBS]
    d, borrow = _sub_limbs(res, [jnp.uint32(l) for l in spec.p_limbs])
    need_sub = (top > 0) | (borrow == 0)
    return _stack(_select(need_sub, d, res))


def mont_sqr(a: jax.Array, spec: FieldSpec) -> jax.Array:
    return mont_mul(a, a, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def to_mont(a: jax.Array, spec: FieldSpec) -> jax.Array:
    """Canonical -> Montgomery form (multiply by R^2)."""
    r2 = const_limbs(spec.r2_mod_p)
    return mont_mul(a, jnp.broadcast_to(r2.reshape((NUM_LIMBS,) + (1,) * (a.ndim - 1)), a.shape), spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def from_mont(a: jax.Array, spec: FieldSpec) -> jax.Array:
    """Montgomery -> canonical form (multiply by 1)."""
    one = np.zeros((NUM_LIMBS,) + (1,) * (a.ndim - 1), np.uint32)
    one[0] = 1
    return mont_mul(a, jnp.broadcast_to(jnp.asarray(one), a.shape), spec)


# ---------------------------------------------------------------------------
# Exponentiation / inversion
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("exponent", "spec"))
def mont_pow_const(a: jax.Array, exponent: int, spec: FieldSpec) -> jax.Array:
    """a^exponent with a *static* exponent, batched.

    Square-and-multiply driven by a ``lax.scan`` over the (static) bit
    vector — keeps the traced graph at one multiply + one square instead
    of unrolling ~254 of them, which matters for XLA compile time.
    """
    e = int(exponent)
    if e == 0:
        return jnp.broadcast_to(
            const_limbs(spec.r_mod_p).reshape((NUM_LIMBS,) + (1,) * (a.ndim - 1)), a.shape
        )
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], dtype=jnp.uint32)
    one = jnp.broadcast_to(
        const_limbs(spec.r_mod_p).reshape((NUM_LIMBS,) + (1,) * (a.ndim - 1)), a.shape
    )

    def body(carry, bit):
        result, base = carry
        result = jnp.where(bit == 1, mont_mul(result, base, spec), result)
        base = mont_sqr(base, spec)
        return (result, base), None

    (result, _), _ = jax.lax.scan(body, (one, a), bits)
    return result


@functools.partial(jax.jit, static_argnames=("spec",))
def inv(a: jax.Array, spec: FieldSpec) -> jax.Array:
    """a^{-1} mod p via Fermat (a=0 maps to 0), batched."""
    return mont_pow_const(a, spec.modulus - 2, spec)


@functools.partial(jax.jit, static_argnames=("spec", "axis"))
def batch_inv(a: jax.Array, spec: FieldSpec, axis: int = -1) -> jax.Array:
    """Montgomery-trick batch inversion along ``axis``.

    Cost: ~3 muls/element (two associative scans) plus ONE field
    inversion, vs ~380 muls/element for Fermat on every element. Zero
    entries are passed through as zero (matching ``inv``).
    """
    if axis != -1 and axis != a.ndim - 1:
        a = jnp.moveaxis(a, axis, -1)

    one = jnp.broadcast_to(
        const_limbs(spec.r_mod_p).reshape((NUM_LIMBS,) + (1,) * (a.ndim - 1)), a.shape
    )
    zmask = is_zero(a)
    safe = select(zmask, one, a)

    # prefix[i] = safe[0] * ... * safe[i]
    prefix = jax.lax.associative_scan(
        functools.partial(mont_mul, spec=spec), safe, axis=-1
    )
    total_inv = inv(prefix[..., -1:], spec)
    # suffix-exclusive product of inverses: inv(safe[i]) =
    #   prefix[i-1] * inv(prefix[n-1]) * suffix_prod(safe[i+1:])
    rev = jnp.flip(safe, axis=-1)
    suffix = jnp.flip(
        jax.lax.associative_scan(functools.partial(mont_mul, spec=spec), rev, axis=-1),
        axis=-1,
    )
    # exclusive versions
    n = a.shape[-1]
    prefix_excl = jnp.concatenate(
        [jnp.broadcast_to(one[..., :1], one[..., :1].shape), prefix[..., :-1]], axis=-1
    )
    suffix_excl = jnp.concatenate(
        [suffix[..., 1:], jnp.broadcast_to(one[..., :1], one[..., :1].shape)], axis=-1
    ) if n > 1 else one
    out = mont_mul(mont_mul(prefix_excl, suffix_excl, spec), jnp.broadcast_to(total_inv, a.shape), spec)
    out = select(zmask, zeros(a.shape[1:]), out)
    if axis != -1 and axis != a.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out
