"""Batched BN254 G1 arithmetic in Jacobian coordinates (JAX/XLA).

Replaces gnark-crypto's ``bn254.G1Affine/G1Jac`` point arithmetic (the
engine under MSMs/KZG in the reference's L0 layer) with lane-parallel
kernels over the limb field layer (:mod:`.field`).

Conventions:
  * A batch of points is a :class:`JacobianPoint` of three limb arrays
    ``(16, *batch)`` over Fq, coordinates in Montgomery form.
  * The point at infinity is encoded as Z == 0 (X/Y arbitrary non-zero).
  * The group law is *complete by construction*: :func:`add` evaluates
    both the addition and doubling formulas and lane-selects, so any
    combination of identity/equal/negated inputs is handled without
    data-dependent branching (XLA-friendly).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import bigint
from . import field as F

FQ = F.FQ
FR = F.FR


class JacobianPoint(NamedTuple):
    """Batch of G1 points; each coord is uint32[16, *batch] (Fq, Montgomery)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def infinity(batch_shape=()) -> JacobianPoint:
    one = F.one_mont(FQ, batch_shape)
    return JacobianPoint(one, one, F.zeros(batch_shape))


def generator(batch_shape=()) -> JacobianPoint:
    gx, gy = bigint.G1_GENERATOR
    r = 1 << 256
    x = F.const_limbs(bigint.int_to_limbs(gx * r % FQ.modulus), batch_shape)
    y = F.const_limbs(bigint.int_to_limbs(gy * r % FQ.modulus), batch_shape)
    return JacobianPoint(x, y, F.one_mont(FQ, batch_shape))


def is_infinity(p: JacobianPoint) -> jax.Array:
    return F.is_zero(p.z)


def select_point(cond, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
    return JacobianPoint(
        F.select(cond, p.x, q.x), F.select(cond, p.y, q.y), F.select(cond, p.z, q.z)
    )


def neg(p: JacobianPoint) -> JacobianPoint:
    return JacobianPoint(p.x, F.neg(p.y, FQ), p.z)


def _mul_group(pairs):
    """Evaluate many independent field products with ONE mont_mul
    instantiation: operands are concatenated along a flattened batch
    axis, multiplied, and split back.

    XLA compile time scales with instruction count, and a mont_mul
    traces to ~300 ops — the group-law formulas below need ~20 products,
    so grouping independent products per dependency level keeps a
    complete point addition at ~6 mont_mul instantiations instead of ~28
    (≈4x smaller graphs, bigger lane batches at runtime).
    """
    shape = (F.NUM_LIMBS,) + jnp.broadcast_shapes(
        *[jnp.broadcast_shapes(a.shape[1:], b.shape[1:]) for a, b in pairs]
    )
    flat = 1
    for d in shape[1:]:
        flat *= d
    xs = jnp.concatenate(
        [jnp.broadcast_to(a, shape).reshape(F.NUM_LIMBS, flat) for a, _ in pairs], axis=1
    )
    ys = jnp.concatenate(
        [jnp.broadcast_to(b, shape).reshape(F.NUM_LIMBS, flat) for _, b in pairs], axis=1
    )
    out = F.mont_mul(xs, ys, FQ)
    return [
        out[:, i * flat : (i + 1) * flat].reshape(shape) for i in range(len(pairs))
    ]


@jax.jit
def double(p: JacobianPoint) -> JacobianPoint:
    """2P for a=0 short Weierstrass in Jacobian coords (dbl-2009-l),
    with products grouped into 3 mont_mul rounds."""
    x, y, z = p.x, p.y, p.z
    xx, yy, yz = _mul_group([(x, x), (y, y), (y, z)])
    x_yy = F.add(x, yy, FQ)
    e = F.add(F.add(xx, xx, FQ), xx, FQ)  # 3*X^2
    t, c, f = _mul_group([(x_yy, x_yy), (yy, yy), (e, e)])
    d = F.sub(F.sub(t, xx, FQ), c, FQ)
    d = F.add(d, d, FQ)  # 2((X+YY)^2 - XX - YY^2)
    x3 = F.sub(f, F.add(d, d, FQ), FQ)
    c8 = F.add(c, c, FQ)
    c8 = F.add(c8, c8, FQ)
    c8 = F.add(c8, c8, FQ)
    (ed,) = _mul_group([(e, F.sub(d, x3, FQ))])
    y3 = F.sub(ed, c8, FQ)
    z3 = F.add(yz, yz, FQ)
    # 2*infinity = infinity (z=0 propagates through z3=2YZ automatically).
    return JacobianPoint(x3, y3, z3)


@jax.jit
def add(p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
    """Complete P+Q: add and double formulas evaluated with grouped
    products (6 mont_mul rounds total), then lane selects for the
    identity / equal / inverse cases."""
    x1, y1, z1 = p.x, p.y, p.z
    x2, y2, z2 = q.x, q.y, q.z

    # R1: squares (+ the doubling path's X^2, Y^2 and Y*Z).
    z1z1, z2z2, xx, yy, yz = _mul_group(
        [(z1, z1), (z2, z2), (x1, x1), (y1, y1), (y1, z1)]
    )
    # R2: cubes of Z, Z1*Z2, and doubling-path squares.
    x_yy = F.add(x1, yy, FQ)
    e_dbl = F.add(F.add(xx, xx, FQ), xx, FQ)
    z1c, z2c, z1z2, t_dbl, c_dbl, f_dbl = _mul_group(
        [(z1, z1z1), (z2, z2z2), (z1, z2), (x_yy, x_yy), (yy, yy), (e_dbl, e_dbl)]
    )
    # R3: the U/S cross terms.
    u1, u2, s1, s2 = _mul_group([(x1, z2z2), (x2, z1z1), (y1, z2c), (y2, z1c)])
    h = F.sub(u2, u1, FQ)
    r = F.sub(s2, s1, FQ)
    # R4: squares of H and R.
    hh, rr = _mul_group([(h, h), (r, r)])
    # R5: H^3, V.
    hhh, v = _mul_group([(h, hh), (u1, hh)])
    x3 = F.sub(F.sub(rr, hhh, FQ), F.add(v, v, FQ), FQ)

    d_dbl = F.sub(F.sub(t_dbl, xx, FQ), c_dbl, FQ)
    d_dbl = F.add(d_dbl, d_dbl, FQ)
    x3d = F.sub(f_dbl, F.add(d_dbl, d_dbl, FQ), FQ)
    c8 = F.add(c_dbl, c_dbl, FQ)
    c8 = F.add(c8, c8, FQ)
    c8 = F.add(c8, c8, FQ)

    # R6: the Y3/Z3 products of both paths.
    rvx, s1h, z3, ed = _mul_group(
        [(r, F.sub(v, x3, FQ)), (s1, hhh), (z1z2, h), (e_dbl, F.sub(d_dbl, x3d, FQ))]
    )
    y3 = F.sub(rvx, s1h, FQ)
    added = JacobianPoint(x3, y3, z3)
    y3d = F.sub(ed, c8, FQ)
    z3d = F.add(yz, yz, FQ)
    dbl = JacobianPoint(x3d, y3d, z3d)

    h_zero = F.is_zero(h)
    r_zero = F.is_zero(r)
    p_inf = is_infinity(p)
    q_inf = is_infinity(q)

    # Same x: either doubling (same y) or P + (-P) = infinity.
    out = select_point(h_zero & r_zero, dbl, added)
    out = select_point(h_zero & ~r_zero & ~p_inf & ~q_inf, infinity(out.batch_shape), out)
    out = select_point(q_inf, p, out)
    out = select_point(p_inf, q, out)
    return out


@jax.jit
def add_mixed(p: JacobianPoint, qx: jax.Array, qy: jax.Array, q_inf: jax.Array) -> JacobianPoint:
    """P + Q with Q affine (Z=1): saves ~4 field muls vs :func:`add`.

    ``q_inf`` is a boolean lane mask marking affine slots that hold the
    identity (affine coords can't encode it).
    """
    x1, y1, z1 = p.x, p.y, p.z

    z1z1, xx, yy, yz = _mul_group([(z1, z1), (x1, x1), (y1, y1), (y1, z1)])
    x_yy = F.add(x1, yy, FQ)
    e_dbl = F.add(F.add(xx, xx, FQ), xx, FQ)
    z1c, t_dbl, c_dbl, f_dbl = _mul_group(
        [(z1, z1z1), (x_yy, x_yy), (yy, yy), (e_dbl, e_dbl)]
    )
    u2, s2 = _mul_group([(qx, z1z1), (qy, z1c)])
    h = F.sub(u2, x1, FQ)
    r = F.sub(s2, y1, FQ)
    hh, rr = _mul_group([(h, h), (r, r)])
    hhh, v = _mul_group([(h, hh), (x1, hh)])
    x3 = F.sub(F.sub(rr, hhh, FQ), F.add(v, v, FQ), FQ)

    d_dbl = F.sub(F.sub(t_dbl, xx, FQ), c_dbl, FQ)
    d_dbl = F.add(d_dbl, d_dbl, FQ)
    x3d = F.sub(f_dbl, F.add(d_dbl, d_dbl, FQ), FQ)
    c8 = F.add(c_dbl, c_dbl, FQ)
    c8 = F.add(c8, c8, FQ)
    c8 = F.add(c8, c8, FQ)

    rvx, s1h, z3, ed = _mul_group(
        [(r, F.sub(v, x3, FQ)), (y1, hhh), (z1, h), (e_dbl, F.sub(d_dbl, x3d, FQ))]
    )
    y3 = F.sub(rvx, s1h, FQ)
    added = JacobianPoint(x3, y3, z3)
    y3d = F.sub(ed, c8, FQ)
    dbl = JacobianPoint(x3d, y3d, F.add(yz, yz, FQ))

    h_zero = F.is_zero(h)
    r_zero = F.is_zero(r)
    p_inf = is_infinity(p)

    out = select_point(h_zero & r_zero, dbl, added)
    out = select_point(h_zero & ~r_zero & ~p_inf, infinity(out.batch_shape), out)
    q_jac = JacobianPoint(
        jnp.broadcast_to(qx, p.x.shape),
        jnp.broadcast_to(qy, p.y.shape),
        F.one_mont(FQ, p.z.shape[1:]),
    )
    out = select_point(q_inf, p, out)
    out = select_point(p_inf & ~q_inf, q_jac, out)
    return out


# ---------------------------------------------------------------------------
# Affine conversion / host IO
# ---------------------------------------------------------------------------


@jax.jit
def to_affine(p: JacobianPoint):
    """Batch-normalize to affine; returns (x, y, inf_mask)."""
    zinv = F.batch_inv(p.z.reshape(16, -1), FQ).reshape(p.z.shape)
    zinv2 = F.mont_sqr(zinv, FQ)
    zinv3 = F.mont_mul(zinv, zinv2, FQ)
    ax = F.mont_mul(p.x, zinv2, FQ)
    ay = F.mont_mul(p.y, zinv3, FQ)
    return ax, ay, is_infinity(p)


def from_affine_ints(points) -> JacobianPoint:
    """Host list of affine (x, y) tuples / None (infinity) -> device batch."""
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(1)
            ys.append(1)
            infs.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            infs.append(False)
    x = F.from_ints(xs, FQ)
    y = F.from_ints(ys, FQ)
    z = F.from_ints([0 if i else 1 for i in infs], FQ)
    return JacobianPoint(x, y, z)


@jax.jit
def _to_affine_packed(p: JacobianPoint) -> jax.Array:
    """Affine-normalize and pack (x limbs ‖ y limbs ‖ inf) into ONE
    (33, n) uint32 array: a single device dispatch and a single host
    readback. The unpacked to_affine path cost 3 separate blocking
    readbacks (x, y, inf) — at ~56 ms relay round-trip each, that was
    the dominant fixed cost of every commitment conversion."""
    ax, ay, inf = to_affine(p)
    ax = F.from_mont(ax.reshape(16, -1), FQ)
    ay = F.from_mont(ay.reshape(16, -1), FQ)
    return jnp.concatenate(
        [ax, ay, inf.reshape(1, -1).astype(jnp.uint32)], axis=0
    )


def to_affine_ints(p: JacobianPoint):
    """Device batch -> host list of affine tuples / None."""
    packed = np.asarray(_to_affine_packed(p))
    xs = bigint.limb_array_to_ints(packed[:16])
    ys = bigint.limb_array_to_ints(packed[16:32])
    infs = packed[32].astype(bool)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


# ---------------------------------------------------------------------------
# Scalar multiplication
# ---------------------------------------------------------------------------


def scalar_bits(scalars: jax.Array, nbits: int = 256) -> jax.Array:
    """Canonical (non-Montgomery) limb scalars (16, *b) -> bits (nbits, *b)."""
    limb = scalars[jnp.arange(nbits) // F.LIMB_BITS]  # (nbits, *b)
    shift = (jnp.arange(nbits) % F.LIMB_BITS).astype(jnp.uint32)
    shift = shift.reshape((nbits,) + (1,) * (scalars.ndim - 1))
    return (limb >> shift) & 1


@jax.jit
def scalar_mul(p: JacobianPoint, scalars: jax.Array) -> JacobianPoint:
    """Batched double-and-add: out[i] = scalars[i] * p[i].

    ``scalars``: canonical-form limbs (16, *batch). 256 sequential
    steps, each fully lane-parallel over the batch.
    """
    bits = scalar_bits(scalars)  # (256, *batch)

    def body(acc, bit):
        acc_pt, base = acc
        new_acc = select_point(bit == 1, add(acc_pt, base), acc_pt)
        return (new_acc, double(base)), None

    (out, _), _ = jax.lax.scan(body, (infinity(p.batch_shape), p), bits)
    return out


def generator_powers_table(nbits: int = 256):
    """Host-computed [2^i]G affine table, as device arrays (x, y): (16, nbits).

    Used for batched fixed-base scalar mults (SRS generation).
    """
    from ..utils import hostcurve

    pts = []
    g = hostcurve.g1_generator()
    for _ in range(nbits):
        pts.append(g)
        g = hostcurve.g1_add(g, g)
    xs = F.from_ints([p[0] for p in pts], FQ)
    ys = F.from_ints([p[1] for p in pts], FQ)
    return xs, ys


@functools.partial(jax.jit, static_argnames=())
def fixed_base_mul(table_x: jax.Array, table_y: jax.Array, scalars: jax.Array) -> JacobianPoint:
    """out[i] = scalars[i] * G using a [2^j]G table: 256 mixed adds.

    All adds are lane-parallel across the batch; the sequential dimension
    is only the 256 scalar bits.
    """
    nbits = table_x.shape[-1]
    bits = scalar_bits(scalars, nbits)  # (nbits, *batch)

    def body(acc, inputs):
        bit, tx, ty = inputs
        stepped = add_mixed(acc, tx[..., None], ty[..., None], jnp.zeros(bit.shape, bool))
        return select_point(bit == 1, stepped, acc), None

    # Move table to scan-major layout: (nbits, 16)
    txs = jnp.moveaxis(table_x, -1, 0)
    tys = jnp.moveaxis(table_y, -1, 0)
    init = infinity(scalars.shape[1:])
    out, _ = jax.lax.scan(body, init, (bits, txs, tys))
    return out
