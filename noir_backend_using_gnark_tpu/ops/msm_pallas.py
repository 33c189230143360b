"""Pallas TPU kernel for Pippenger bucket accumulation.

Round-3 measurements located the MSM bottleneck: the XLA scan path runs
each mixed add as ~6 grouped mont_mul instantiations whose ~160
intermediate vectors spill to HBM (measured 4.3 ms per 16k-lane add
step — HBM-bound at ~30x off VPU peak), and every scan step rewrites
the whole bucket table through HBM. This kernel fixes both:

  * the bucket table lives in VMEM for the WHOLE accumulation (a
    Pallas grid whose output block index is constant along the step
    dimension, so Mosaic keeps it resident and writes it back once);
  * the field arithmetic is expressed limb-by-limb as Python lists of
    (Wc, L) uint32 tiles — every op is a single dense (8, 128)-aligned
    VPU op, intermediates stay in registers/VMEM, and there are no
    concatenates to break fusion.

Layout:
  * L = 128 points are consumed per grid step (the lane axis);
  * windows are processed in groups of Wc = 8 (the sublane axis), so
    every field op runs on a full (8, 128) uint32 tile;
  * the bucket table is one output of shape (Wg, 48, B, Wc, L) —
    48 = 3 Jacobian coords x 16 limbs, B = 2^{c-1}+1 signed-digit
    buckets. Grid = (Wg, T) with T inner: each window group streams
    all T point slices while its table slab stays in VMEM.
    VMEM budget (c=6): 48*33*8*128*4 B = 6.5 MB.

The scalar recoding (signed c-bit digits), the lane/bucket folds and
the window join stay in XLA (ops/msm.py) — they are a tiny fraction of
the work.

Replaces the accumulation phase of gnark-crypto's ``MultiExp``
(the engine under the reference's ``plonk.Prove``,
gnark_backend_ffi/backend/plonk/plonk.go:53-73; SURVEY §3.1 (b)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import bigint
from . import curve as C
from . import field as F

FQ = F.FQ
MASK = np.uint32(0xFFFF)
LIMB_BITS = np.uint32(16)
NL = 16  # limbs per field element

#: Points per grid step == the lane (minor) axis of every tile.
LANES = 128
#: Windows per group == the sublane axis of every tile.
WC = 8

_P_LIMBS = tuple(np.uint32(l) for l in FQ.p_limbs)
_N0 = np.uint32(FQ.n0)
_ONE_MONT = tuple(np.uint32(l) for l in FQ.r_mod_p)


# ---------------------------------------------------------------------------
# Limb-list field ops (each limb is a (Wc, L) uint32 tile)
# ---------------------------------------------------------------------------


def _zeros_like(a):
    return [jnp.zeros_like(a[0]) for _ in range(NL)]


def _const_ll(limbs, ref):
    return [jnp.full_like(ref, np.uint32(l)) for l in limbs]


def _select_ll(cond, a, b):
    return [jnp.where(cond, ai, bi) for ai, bi in zip(a, b)]


def _is_zero_ll(a):
    acc = a[0] == 0
    for i in range(1, NL):
        acc = acc & (a[i] == 0)
    return acc


def _sub_chain(a, b):
    """a - b limbwise with borrow; returns (limbs, borrow)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for ai, bi in zip(a, b):
        s = ai + jnp.uint32(1 << 16) - bi - borrow
        out.append(s & MASK)
        borrow = jnp.uint32(1) - (s >> LIMB_BITS)
    return out, borrow


def _add_mod(a, b):
    """(a + b) mod p on strictly-reduced inputs."""
    s, carry = [], jnp.zeros_like(a[0])
    for ai, bi in zip(a, b):
        t = ai + bi + carry
        s.append(t & MASK)
        carry = t >> LIMB_BITS
    p = [jnp.full_like(a[0], l) for l in _P_LIMBS]
    d, borrow = _sub_chain(s, p)
    need_sub = (carry > 0) | (borrow == 0)
    return _select_ll(need_sub, d, s)


def _sub_mod(a, b):
    d, borrow = _sub_chain(a, b)
    dp, carry = [], jnp.zeros_like(a[0])
    for di, pi in zip(d, _P_LIMBS):
        t = di + pi + carry
        dp.append(t & MASK)
        carry = t >> LIMB_BITS
    return _select_ll(borrow > 0, dp, d)


def _neg_mod(a):
    p = [jnp.full_like(a[0], l) for l in _P_LIMBS]
    d, _ = _sub_chain(p, a)
    z = _is_zero_ll(a)
    return [jnp.where(z, jnp.zeros_like(x), x) for x in d]


def _mont_mul(a, b):
    """CIOS Montgomery product, limb-list form (same lazy-carry scheme
    and bounds as ops/field.mont_mul — see its docstring)."""
    t = [jnp.zeros_like(a[0]) for _ in range(NL + 1)]
    for i in range(NL):
        ai = a[i]
        for j in range(NL):
            prod = ai * b[j]
            t[j] = t[j] + (prod & MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m = (t[0] * _N0) & MASK
        for j in range(NL):
            q = m * _P_LIMBS[j]
            t[j] = t[j] + (q & MASK)
            t[j + 1] = t[j + 1] + (q >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(a[0])]
        t[0] = t[0] + carry0
    # Lazy-carry normalization: 2 vector rounds then the exact chain.
    for _ in range(2):
        nt = [t[0] & MASK]
        for j in range(1, NL + 1):
            nt.append((t[j] & MASK) + (t[j - 1] >> LIMB_BITS))
        t = nt
    out, carry = [], jnp.zeros_like(a[0])
    for j in range(NL + 1):
        s = t[j] + carry
        out.append(s & MASK)
        carry = s >> LIMB_BITS
    res, top = out[:NL], out[NL]
    p = [jnp.full_like(a[0], l) for l in _P_LIMBS]
    d, borrow = _sub_chain(res, p)
    need_sub = (top > 0) | (borrow == 0)
    return _select_ll(need_sub, d, res)


def _dbl_mod(a):
    return _add_mod(a, a)


def _mont_sqr(a):
    """CIOS Montgomery squaring: the upper-triangle product identity
    a_i*a_j (+ doubling for i != j) cuts the raw-product multiplies
    256 -> 136; the interleaved m*p reduction half is unchanged.
    Valid because at outer iteration i, t[0] (the 2^{16i} limb after i
    shift-downs) has already received every a_k*a_{i-k} pair (k <=
    i/2 <= i), so m = t[0]*n0 is exact as in the general CIOS.
    ~17% fewer vector ops than _mont_mul(a, a) — but measured 8%
    SLOWER end-to-end on a v5e when wired into the fast add path (the
    doubled accumulates serialize; see _add_mixed_fast_ll note), so it
    is kept only as a tested reference implementation."""
    t = [jnp.zeros_like(a[0]) for _ in range(NL + 1)]
    for i in range(NL):
        ai = a[i]
        # After i shift-downs t[k] carries weight 2^{16(i+k)}, so the
        # product a_i*a_j (weight 2^{16(i+j)}) lands at index j — the
        # same indexing as the general CIOS. Diagonal term once (at
        # j = i), off-diagonal terms doubled.
        prod = ai * ai
        t[i] = t[i] + (prod & MASK)
        t[i + 1] = t[i + 1] + (prod >> LIMB_BITS)
        for j in range(i + 1, NL):
            prod = ai * a[j]
            lo2 = (prod & MASK) + (prod & MASK)
            hi2 = (prod >> LIMB_BITS) + (prod >> LIMB_BITS)
            # lo2/hi2 < 2^17: t[j] gains at most 2*2^17 + 2*2^16 per
            # iteration, so t < 96*2^16 < 2^23 — still far under the
            # uint32 lazy-carry budget (cf. ops/field.mont_mul).
            t[j] = t[j] + lo2
            t[j + 1] = t[j + 1] + hi2
        m = (t[0] * _N0) & MASK
        for j in range(NL):
            q = m * _P_LIMBS[j]
            t[j] = t[j] + (q & MASK)
            t[j + 1] = t[j + 1] + (q >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(a[0])]
        t[0] = t[0] + carry0
    for _ in range(2):
        nt = [t[0] & MASK]
        for j in range(1, NL + 1):
            nt.append((t[j] & MASK) + (t[j - 1] >> LIMB_BITS))
        t = nt
    out, carry = [], jnp.zeros_like(a[0])
    for j in range(NL + 1):
        s = t[j] + carry
        out.append(s & MASK)
        carry = s >> LIMB_BITS
    res, top = out[:NL], out[NL]
    p = [jnp.full_like(a[0], l) for l in _P_LIMBS]
    d, borrow = _sub_chain(res, p)
    need_sub = (top > 0) | (borrow == 0)
    return _select_ll(need_sub, d, res)


# ---------------------------------------------------------------------------
# Complete mixed add (Jacobian += affine), limb-list form
# ---------------------------------------------------------------------------


def _add_mixed_fast_ll(x1, y1, z1, qx, qy, q_inf):
    """ADD-path-only mixed add (11 mont_muls vs 18 for the complete
    formula): the hot path of the round-5 kernel.

    The doubling branch of the complete add is only *needed* when the
    bucket's affine x equals the incoming point's (h == 0) — for
    generic inputs that is a partial-sum collision with probability
    ~2^-254 per add, plus the benign structured cases (first add into
    an empty bucket = p_inf, zero digit = q_inf) which cost selects,
    not muls. So this returns a ``special`` mask flagging h == 0 lanes
    (true double or P + (-P) annihilation); the kernel re-runs those
    steps through :func:`_add_mixed_ll` under a ``pl.when`` scalar
    branch. Removing the always-computed doubling path cut the
    per-step mont_mul count 18 -> 11 (~1.5x on a VPU-peak-bound
    kernel, round-4 verdict item #1).
    """
    # NOTE: the 3 squarings here deliberately use the general
    # _mont_mul. A CIOS squaring variant (_mont_sqr, kept for
    # reference/tests) counts ~17% fewer ops but measured 8% SLOWER
    # end-to-end on a v5e (2.30M vs 2.52M pts/s @2^22) — the doubled
    # lo/hi accumulate lengthens dependency chains that Mosaic
    # otherwise pipelines. docs/MSM_ROOFLINE.md.
    z1z1 = _mont_mul(z1, z1)
    u2 = _mont_mul(qx, z1z1)
    z1c = _mont_mul(z1, z1z1)
    s2 = _mont_mul(qy, z1c)
    h = _sub_mod(u2, x1)
    r = _sub_mod(s2, y1)
    hh = _mont_mul(h, h)
    hhh = _mont_mul(h, hh)
    v = _mont_mul(x1, hh)
    rr = _mont_mul(r, r)
    x3 = _sub_mod(_sub_mod(rr, hhh), _dbl_mod(v))
    y3 = _sub_mod(_mont_mul(r, _sub_mod(v, x3)), _mont_mul(y1, hhh))
    z3 = _mont_mul(z1, h)

    p_inf = _is_zero_ll(z1)
    one = _const_ll(_ONE_MONT, x1[0])
    # P = infinity: result is Q lifted to z=1.
    ox = _select_ll(p_inf, qx, x3)
    oy = _select_ll(p_inf, qy, y3)
    oz = _select_ll(p_inf, one, z3)
    # Q = infinity (zero digit / padding): result is P.
    ox = _select_ll(q_inf, x1, ox)
    oy = _select_ll(q_inf, y1, oy)
    oz = _select_ll(q_inf, z1, oz)
    special = _is_zero_ll(h) & (~p_inf) & (~q_inf)
    return ox, oy, oz, special


def _add_mixed_ll(x1, y1, z1, qx, qy, q_inf):
    """Complete P + Q with Q affine; mirrors ops/curve.add_mixed
    (add + dbl paths evaluated, lane selects for the special cases).
    ``q_inf``: bool (Wc, L) mask."""
    z1z1 = _mont_mul(z1, z1)
    xx = _mont_mul(x1, x1)
    yy = _mont_mul(y1, y1)
    yz = _mont_mul(y1, z1)
    x_yy = _add_mod(x1, yy)
    e_dbl = _add_mod(_dbl_mod(xx), xx)
    z1c = _mont_mul(z1, z1z1)
    t_dbl = _mont_mul(x_yy, x_yy)
    c_dbl = _mont_mul(yy, yy)
    f_dbl = _mont_mul(e_dbl, e_dbl)
    u2 = _mont_mul(qx, z1z1)
    s2 = _mont_mul(qy, z1c)
    h = _sub_mod(u2, x1)
    r = _sub_mod(s2, y1)
    hh = _mont_mul(h, h)
    rr = _mont_mul(r, r)
    hhh = _mont_mul(h, hh)
    v = _mont_mul(x1, hh)
    x3 = _sub_mod(_sub_mod(rr, hhh), _dbl_mod(v))

    d_dbl = _dbl_mod(_sub_mod(_sub_mod(t_dbl, xx), c_dbl))
    x3d = _sub_mod(f_dbl, _dbl_mod(d_dbl))
    c8 = _dbl_mod(_dbl_mod(_dbl_mod(c_dbl)))

    rvx = _mont_mul(r, _sub_mod(v, x3))
    s1h = _mont_mul(y1, hhh)
    z3 = _mont_mul(z1, h)
    ed = _mont_mul(e_dbl, _sub_mod(d_dbl, x3d))
    y3 = _sub_mod(rvx, s1h)
    y3d = _sub_mod(ed, c8)
    z3d = _dbl_mod(yz)

    h_zero = _is_zero_ll(h)
    r_zero = _is_zero_ll(r)
    p_inf = _is_zero_ll(z1)

    ox = _select_ll(h_zero & r_zero, x3d, x3)
    oy = _select_ll(h_zero & r_zero, y3d, y3)
    oz = _select_ll(h_zero & r_zero, z3d, z3)
    # P + (-P): infinity (z = 0; x/y values are don't-care, keep 1).
    inf_case = h_zero & (~r_zero) & (~p_inf)
    one = _const_ll(_ONE_MONT, x1[0])
    ox = _select_ll(inf_case, one, ox)
    oy = _select_ll(inf_case, one, oy)
    oz = _select_ll(inf_case, _zeros_like(x1), oz)
    # P = infinity: result is Q (affine lifted to z=1).
    ox = _select_ll(p_inf, qx, ox)
    oy = _select_ll(p_inf, qy, oy)
    oz = _select_ll(p_inf, one, oz)
    # Q = infinity: result is P.
    ox = _select_ll(q_inf, x1, ox)
    oy = _select_ll(q_inf, y1, oy)
    oz = _select_ll(q_inf, z1, oz)
    return ox, oy, oz


def _add_full_ll(x1, y1, z1, x2, y2, z2):
    """Complete P + Q, both Jacobian (mirror of ops/curve.add) — used
    by the in-kernel lane fold."""
    z1z1 = _mont_mul(z1, z1)
    z2z2 = _mont_mul(z2, z2)
    xx = _mont_mul(x1, x1)
    yy = _mont_mul(y1, y1)
    yz = _mont_mul(y1, z1)
    x_yy = _add_mod(x1, yy)
    e_dbl = _add_mod(_dbl_mod(xx), xx)
    z1c = _mont_mul(z1, z1z1)
    z2c = _mont_mul(z2, z2z2)
    z1z2 = _mont_mul(z1, z2)
    t_dbl = _mont_mul(x_yy, x_yy)
    c_dbl = _mont_mul(yy, yy)
    f_dbl = _mont_mul(e_dbl, e_dbl)
    u1 = _mont_mul(x1, z2z2)
    u2 = _mont_mul(x2, z1z1)
    s1 = _mont_mul(y1, z2c)
    s2 = _mont_mul(y2, z1c)
    h = _sub_mod(u2, u1)
    r = _sub_mod(s2, s1)
    hh = _mont_mul(h, h)
    rr = _mont_mul(r, r)
    hhh = _mont_mul(h, hh)
    v = _mont_mul(u1, hh)
    x3 = _sub_mod(_sub_mod(rr, hhh), _dbl_mod(v))

    d_dbl = _dbl_mod(_sub_mod(_sub_mod(t_dbl, xx), c_dbl))
    x3d = _sub_mod(f_dbl, _dbl_mod(d_dbl))
    c8 = _dbl_mod(_dbl_mod(_dbl_mod(c_dbl)))

    rvx = _mont_mul(r, _sub_mod(v, x3))
    s1h = _mont_mul(s1, hhh)
    z3 = _mont_mul(z1z2, h)
    ed = _mont_mul(e_dbl, _sub_mod(d_dbl, x3d))
    y3 = _sub_mod(rvx, s1h)
    y3d = _sub_mod(ed, c8)
    z3d = _dbl_mod(yz)

    h_zero = _is_zero_ll(h)
    r_zero = _is_zero_ll(r)
    p_inf = _is_zero_ll(z1)
    q_inf = _is_zero_ll(z2)

    dbl_case = h_zero & r_zero
    ox = _select_ll(dbl_case, x3d, x3)
    oy = _select_ll(dbl_case, y3d, y3)
    oz = _select_ll(dbl_case, z3d, z3)
    inf_case = h_zero & (~r_zero) & (~p_inf) & (~q_inf)
    one = _const_ll(_ONE_MONT, x1[0])
    ox = _select_ll(inf_case, one, ox)
    oy = _select_ll(inf_case, one, oy)
    oz = _select_ll(inf_case, _zeros_like(x1), oz)
    ox = _select_ll(q_inf, x1, ox)
    oy = _select_ll(q_inf, y1, oy)
    oz = _select_ll(q_inf, z1, oz)
    ox = _select_ll(p_inf, x2, ox)
    oy = _select_ll(p_inf, y2, oy)
    oz = _select_ll(p_inf, z2, oz)
    return ox, oy, oz


def _dbl_full_ll(x, y, z):
    """Complete Jacobian doubling (dbl-2009-l shape, a=0): 7 mont_muls.
    Infinity (z=0) stays at infinity (Z3 = 2YZ = 0); BN254 G1 has no
    order-2 points so Y=0 never occurs for finite points."""
    a = _mont_mul(x, x)
    b = _mont_mul(y, y)
    cc = _mont_mul(b, b)
    xb = _add_mod(x, b)
    d = _mont_mul(xb, xb)
    d = _dbl_mod(_sub_mod(_sub_mod(d, a), cc))
    e = _add_mod(_dbl_mod(a), a)
    f = _mont_mul(e, e)
    x3 = _sub_mod(f, _dbl_mod(d))
    c8 = _dbl_mod(_dbl_mod(_dbl_mod(cc)))
    y3 = _sub_mod(_mont_mul(e, _sub_mod(d, x3)), c8)
    z3 = _dbl_mod(_mont_mul(y, z))
    return x3, y3, z3


# ---------------------------------------------------------------------------
# Window join kernel
# ---------------------------------------------------------------------------
#
# The Horner window join (ops/msm._join_windows) is depth-fundamental —
# ~c*W sequential group doublings — but each XLA scan step costs ~0.23 ms
# of dispatch/loop overhead, a fixed ~60 ms PER MSM that dominated every
# commitment at prover domains (n <= 2^14). This kernel runs the same
# 2^{cw}-weighting inside ONE Pallas program: lane w of sublane k holds
# T_{k,w}; a fori_loop applies masked doublings (lane w doubles c*w
# times), then a wrapping Hillis-Steele lane fold sums the weighted
# windows. 252 doubles x ~20k vector ops ≈ 2 ms instead of 60.


def _join_kernel(c: int, w_count: int, tx_ref, ty_ref, tz_ref, out_ref):
    """Refs: tx/ty/tz (16, 8, 128) — limb-planes, sublane k = MSM index,
    lane w = window; out (48, 8, 128) (all lanes hold the total after
    the fold; caller reads lane 0)."""
    x = [tx_ref[limb] for limb in range(NL)]
    y = [ty_ref[limb] for limb in range(NL)]
    z = [tz_ref[limb] for limb in range(NL)]
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    # Padding lanes (w >= w_count) carry z=0 = infinity: adds ignore
    # them, doublings keep them at infinity — no masking needed beyond
    # the doubling count.
    dbl_target = lane_w * c

    def dbl_body(i, pt):
        px, py, pz = pt
        nx, ny, nz = _dbl_full_ll(px, py, pz)
        m = dbl_target > i
        return (
            _select_ll(m, nx, px),
            _select_ll(m, ny, py),
            _select_ll(m, nz, pz),
        )

    x, y, z = jax.lax.fori_loop(0, c * (w_count - 1), dbl_body, (x, y, z))

    def fold_body(i, pt):
        fx, fy, fz = pt
        shift = 64 >> i
        rx = [pltpu.roll(v, -shift, 1) for v in fx]
        ry = [pltpu.roll(v, -shift, 1) for v in fy]
        rz = [pltpu.roll(v, -shift, 1) for v in fz]
        return _add_full_ll(fx, fy, fz, rx, ry, rz)

    x, y, z = jax.lax.fori_loop(0, 7, fold_body, (x, y, z))
    for limb in range(NL):
        out_ref[limb] = x[limb]
        out_ref[NL + limb] = y[limb]
        out_ref[2 * NL + limb] = z[limb]


@functools.partial(jax.jit, static_argnames=("c", "interpret"))
def join_windows_pallas(totals, c: int, interpret: bool = False):
    """Batched Horner window join on the VPU: totals is a
    JacobianPoint with batch shape (W,) or (K, W), K <= 8, W <= 128
    (true for every window width c >= 2). Returns batch () or (K,)."""
    x, y, z = totals.x, totals.y, totals.z
    squeeze = x.ndim == 2
    if squeeze:
        x, y, z = x[:, None], y[:, None], z[:, None]
    k_count, w_count = x.shape[1], x.shape[2]
    if k_count > 8 or w_count > 128:
        raise ValueError(f"join kernel needs K<=8, W<=128; got {x.shape}")
    pads = ((0, 0), (0, 8 - k_count), (0, 128 - w_count))
    xp = jnp.pad(x, pads)
    yp = jnp.pad(y, pads)
    zp = jnp.pad(z, pads)  # zero z = infinity for padding slots
    out = pl.pallas_call(
        functools.partial(_join_kernel, c, w_count),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((48, 8, 128), jnp.uint32),
        interpret=interpret,
    )(xp, yp, zp)
    res = C.JacobianPoint(
        out[:NL, :k_count, 0],
        out[NL : 2 * NL, :k_count, 0],
        out[2 * NL :, :k_count, 0],
    )
    if squeeze:
        res = jax.tree_util.tree_map(lambda a: a[..., 0], res)
    return res


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _accum_kernel(
    nb: int, wc: int, lanes: int, px_ref, py_ref, mag_ref, neg_ref, tbl_ref
):
    """One grid step: fold L points into the group's VMEM bucket table.

    Refs: px/py (1, 16, L) — this step's point limbs; mag/neg
    (1, 1, Wc, L) int8 (digits <= 2^{c-1} fit — 4x less HBM stream
    than int32, which matters at 2^24); tbl (1, 48, B, Wc, L) — x
    limbs 0-15, y 16-31, z 32-47, persistent across the step grid dim.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        shape = tbl_ref.shape
        for limb in range(NL):
            one = jnp.full(shape[2:], _ONE_MONT[limb], jnp.uint32)
            tbl_ref[0, limb] = one
            tbl_ref[0, NL + limb] = one
            tbl_ref[0, 2 * NL + limb] = jnp.zeros(shape[2:], jnp.uint32)

    d = mag_ref[0, 0].astype(jnp.int32)  # (Wc, L)
    # Cast BEFORE comparing: an i1 mask derived from int8-tiled data
    # keeps the (32, 128) sublane layout and Mosaic cannot relayout it
    # against the uint32 (8, 128) operands of the selects.
    neg = neg_ref[0, 0].astype(jnp.int32) != 0
    # Broadcast each (1, L) point-limb row over the Wc window sublanes.
    qx = [
        jnp.broadcast_to(px_ref[0, limb : limb + 1, :], (wc, lanes))
        for limb in range(NL)
    ]
    qy_raw = [
        jnp.broadcast_to(py_ref[0, limb : limb + 1, :], (wc, lanes))
        for limb in range(NL)
    ]
    qy = _select_ll(neg, _neg_mod(qy_raw), qy_raw)
    q_inf = d == 0  # zero digit (incl. padding / infinity inputs): no-op

    # Gather the addressed bucket per (window, lane) with an unrolled
    # select chain over the small bucket axis (per-lane VMEM gathers
    # don't vectorize on TPU; B dense (Wc, L) selects do). Bucket 0 is
    # never written (digit 0 = q_inf no-op, masked out of the
    # writeback below), so the chain starts at bucket 1 — d==0 lanes
    # gather a don't-care value that the q_inf select discards.
    cx = [tbl_ref[0, limb, 1] for limb in range(NL)]
    cy = [tbl_ref[0, NL + limb, 1] for limb in range(NL)]
    cz = [tbl_ref[0, 2 * NL + limb, 1] for limb in range(NL)]
    for b in range(2, nb):
        hit = d == b
        cx = _select_ll(hit, [tbl_ref[0, limb, b] for limb in range(NL)], cx)
        cy = _select_ll(hit, [tbl_ref[0, NL + limb, b] for limb in range(NL)], cy)
        cz = _select_ll(hit, [tbl_ref[0, 2 * NL + limb, b] for limb in range(NL)], cz)

    nx, ny, nz, special = _add_mixed_fast_ll(cx, cy, cz, qx, qy, q_inf)

    def _writeback(wx, wy, wz):
        # Masked writeback: only the addressed bucket row changes
        # (bucket 0 untouched — zero digits contribute nothing).
        for b in range(1, nb):
            hit = d == b
            for limb in range(NL):
                tbl_ref[0, limb, b] = jnp.where(
                    hit, wx[limb], tbl_ref[0, limb, b]
                )
                tbl_ref[0, NL + limb, b] = jnp.where(
                    hit, wy[limb], tbl_ref[0, NL + limb, b]
                )
                tbl_ref[0, 2 * NL + limb, b] = jnp.where(
                    hit, wz[limb], tbl_ref[0, 2 * NL + limb, b]
                )

    # Scalar branch on the RARE cases (true doubling / P+(-P)): the
    # common step writes the 11-mul fast result; a step containing any
    # flagged lane recomputes through the complete 18-mul formula and
    # patches just those lanes. Both bodies exist in the compiled
    # kernel but only one executes per step.
    any_special = jnp.max(special.astype(jnp.int32)) > 0

    @pl.when(jnp.logical_not(any_special))
    def _fast():
        _writeback(nx, ny, nz)

    @pl.when(any_special)
    def _slow():
        fx, fy, fz = _add_mixed_ll(cx, cy, cz, qx, qy, q_inf)
        _writeback(
            _select_ll(special, fx, nx),
            _select_ll(special, fy, ny),
            _select_ll(special, fz, nz),
        )

    # In-kernel lane fold on the LAST step: Hillis-Steele with wrapping
    # rolls — after log2(L) rounds every lane holds the lane-sum, so
    # the caller just reads lane 0. Folding here (VMEM-resident, fused
    # adds) replaced an XLA suffix-scan whose HBM-bound adds cost a
    # FIXED ~0.5 s regardless of N — dominating every MSM below 2^20.
    @pl.when(t == pl.num_programs(1) - 1)
    def _fold_lanes():
        def body_b(b, carry):
            x = [tbl_ref[0, limb, b] for limb in range(NL)]
            y = [tbl_ref[0, NL + limb, b] for limb in range(NL)]
            z = [tbl_ref[0, 2 * NL + limb, b] for limb in range(NL)]

            # fori over the log2(L) halvings with a TRACED roll amount:
            # one _add_full_ll instantiation instead of log2(L) — the
            # unrolled form alone was ~2/3 of the kernel's jaxpr, and
            # TRACING this kernel (not compiling it) costs ~2 min per
            # process at that size.
            def fold_step(i, pt):
                fx, fy, fz = pt
                shift = (lanes >> 1) >> i
                xr = [pltpu.roll(v, -shift, 1) for v in fx]
                yr = [pltpu.roll(v, -shift, 1) for v in fy]
                zr = [pltpu.roll(v, -shift, 1) for v in fz]
                return _add_full_ll(fx, fy, fz, xr, yr, zr)

            x, y, z = jax.lax.fori_loop(
                0, lanes.bit_length() - 1, fold_step, (x, y, z)
            )
            for limb in range(NL):
                tbl_ref[0, limb, b] = x[limb]
                tbl_ref[0, NL + limb, b] = y[limb]
                tbl_ref[0, 2 * NL + limb, b] = z[limb]
            return carry

        jax.lax.fori_loop(0, nb, body_b, 0)


@functools.partial(
    jax.jit, static_argnames=("c", "lanes", "wc", "interpret")
)
def accumulate_buckets_pallas(
    px: jax.Array,
    py: jax.Array,
    pinf: jax.Array,
    scalars: jax.Array,
    c: int,
    lanes: int = LANES,
    wc: int = WC,
    interpret: bool = False,
) -> C.JacobianPoint:
    """Pallas bucket accumulation: returns S as (16, W, B) Jacobian
    batch, same contract as ops/msm.accumulate_buckets. N must be a
    multiple of LANES (the caller pads with zero scalars)."""
    from . import msm as M

    if c > 7:
        # Signed-digit magnitudes reach exactly 2^{c-1}; at c=8 that is
        # 128, which wraps to -128 in the int8 digit stream and silently
        # drops those points from every bucket (wrong MSM, no error).
        raise ValueError(
            f"pallas MSM digit stream is int8: window width c={c} > 7 "
            "would overflow (magnitude 2^{c-1} >= 128); use c <= 7 or "
            "the XLA path (ops/msm.msm_xla)"
        )

    n = px.shape[-1]
    if n % lanes:
        raise ValueError(f"pallas MSM needs N % {lanes} == 0, got {n}")
    w_count = M.num_windows(c)
    nb = (1 << (c - 1)) + 1
    t_steps = n // lanes
    wg = -(-w_count // wc)
    w_pad = wg * wc

    mags, negs = M.signed_digits(scalars, c, w_count)  # (W, N)
    # int8 digit/sign streams: magnitudes <= 2^{c-1} <= 128.
    mags = jnp.where(pinf[None, :], 0, mags).astype(jnp.int8)
    mags = jnp.pad(mags, ((0, w_pad - w_count), (0, 0)))
    negs = jnp.pad(negs.astype(jnp.int8), ((0, w_pad - w_count), (0, 0)))

    # (Wg, T, Wc, L) digit/sign blocks; points stay (16, T, L) views.
    mag_r = jnp.transpose(
        mags.reshape(wg, wc, t_steps, lanes), (0, 2, 1, 3)
    )
    neg_r = jnp.transpose(
        negs.reshape(wg, wc, t_steps, lanes), (0, 2, 1, 3)
    )
    px_r = jnp.moveaxis(px.reshape(16, t_steps, lanes), 1, 0)  # (T, 16, L)
    py_r = jnp.moveaxis(py.reshape(16, t_steps, lanes), 1, 0)

    grid = (wg, t_steps)
    out = pl.pallas_call(
        functools.partial(_accum_kernel, nb, wc, lanes),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 16, lanes), lambda wgi, t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 16, lanes), lambda wgi, t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, wc, lanes),
                lambda wgi, t: (wgi, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wc, lanes),
                lambda wgi, t: (wgi, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 48, nb, wc, lanes),
            lambda wgi, t: (wgi, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((wg, 48, nb, wc, lanes), jnp.uint32),
        interpret=interpret,
    )(px_r, py_r, mag_r, neg_r)

    # (Wg, 48, B, Wc, L) -> coords (16, B, W): the kernel already
    # folded the lane axis in VMEM (every lane holds the lane-sum), so
    # just read lane 0.
    tbl = jnp.transpose(out[..., 0], (1, 2, 0, 3)).reshape(48, nb, w_pad)
    tbl = tbl[:, :, :w_count]
    folded = C.JacobianPoint(tbl[:NL], tbl[NL : 2 * NL], tbl[2 * NL :])
    return jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 1, 2), folded)


def msm_kernel_pallas(
    px,
    py,
    pinf,
    scalars,
    c: int,
    lanes: int = LANES,
    wc: int = WC,
    interpret: bool = False,
):
    """Full MSM with the Pallas accumulation phase (call under jit)."""
    from . import msm as M

    buckets = accumulate_buckets_pallas(
        px, py, pinf, scalars, c, lanes, wc, interpret
    )
    totals = M._weighted_bucket_reduce(buckets)
    return join_windows_pallas(totals, c, interpret)


#: ONE-dispatch entry: the whole MSM (Pallas accumulation + XLA folds)
#: under a single jit, so the reduce/join phases don't issue eager
#: relay dispatches.
msm_pallas = jax.jit(
    msm_kernel_pallas, static_argnames=("c", "lanes", "wc", "interpret")
)
