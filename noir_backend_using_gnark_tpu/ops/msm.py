"""Pippenger multi-scalar multiplication over BN254 G1 (JAX/XLA).

Replaces gnark-crypto's ``MultiExp`` (the G1 MSMs inside KZG commit /
open and the PLONK prover — the dominant cost of ``plonk.Prove``,
SURVEY.md §3.1) with a TPU-friendly bucket method:

  * window decomposition: 16-bit-limb scalars are cut into ``c``-bit
    digits (``c`` chosen from the problem size);
  * bucket accumulation SIMD-style: per window, points are *sorted* by
    digit, then per-bucket sums are obtained with a work-efficient
    *segmented* scan over the complete Jacobian group law — ~2N EC adds
    at O(log N) depth, no scatter conflicts. The scan is orchestrated
    from Python (ops/scan_utils.py) so each compiled kernel holds ONE
    group-law instantiation — XLA compile time stays linear;
  * bucket reduction: sum_b b*S_b = sum_j (suffix sums) via a suffix
    scan + pairwise tree reduction, batched over all windows at once;
  * window join: Horner over windows (c doublings + 1 add per window).

Sorting + gathers are native XLA ops; every EC add is lane-parallel over
the limb field layer. The sharded multi-chip variant partitions points
across devices and reduces per-window partial buckets with collectives
(``parallel/dist_msm.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F
from . import scan_utils

FR = F.FR
FQ = F.FQ


class AffineBatch(NamedTuple):
    """Batch of affine G1 points: x, y (16, N) Fq Montgomery; inf (N,) bool."""

    x: jax.Array
    y: jax.Array
    inf: jax.Array

    @property
    def n(self):
        return self.x.shape[-1]


def affine_from_ints(points) -> AffineBatch:
    """Host affine tuples/None -> device AffineBatch."""
    jac = C.from_affine_ints(points)
    return AffineBatch(jac.x, jac.y, F.is_zero(jac.z))


@jax.jit
def _affine_to_jacobian(p: AffineBatch) -> C.JacobianPoint:
    one = F.one_mont(FQ, p.inf.shape)
    z = F.select(p.inf, F.zeros(p.inf.shape), one)
    return C.JacobianPoint(p.x, p.y, z)


def default_window_bits(n: int) -> int:
    """Window size heuristic: balance W*2N scan adds vs W*2^c bucket adds."""
    if n >= (1 << 18):
        return 16
    if n >= (1 << 12):
        return 12
    if n >= (1 << 8):
        return 8
    return 4


def num_windows(c: int, nbits: int = 254) -> int:
    return -(-nbits // c)


def extract_digits(scalars: jax.Array, c: int, num_w: int) -> jax.Array:
    """Split canonical-form limb scalars (16, N) into c-bit digits (W, N).

    Digits may straddle 16-bit limb boundaries; each digit is assembled
    from the two covering limbs with static shifts.
    """
    out = []
    for w in range(num_w):
        bit0 = w * c
        limb_idx = bit0 // F.LIMB_BITS
        off = bit0 % F.LIMB_BITS
        lo = scalars[limb_idx] >> np.uint32(off)
        if off + c > F.LIMB_BITS and limb_idx + 1 < F.NUM_LIMBS:
            hi = scalars[limb_idx + 1] << np.uint32(F.LIMB_BITS - off)
            lo = lo | hi
        out.append(lo & np.uint32((1 << c) - 1))
    return jnp.stack(out, axis=0)


# ---------------------------------------------------------------------------
# Segmented bucket accumulation (one window)
# ---------------------------------------------------------------------------


@jax.jit
def _seg_combine(left, right):
    """Segmented-scan monoid over (point, start-flag) pairs.

    Flags are uint32 with the same trailing axis as the point batch.
    """
    pl, fl = left
    pr, fr = right
    p = C.select_point(fr != 0, pr, C.add(pl, pr))
    return (p, fl | fr)


@jax.jit
def _sort_window(px, py, pinf, digits):
    order = jnp.argsort(digits)
    d = jnp.take(digits, order)
    points = _affine_to_jacobian(
        AffineBatch(jnp.take(px, order, axis=1), jnp.take(py, order, axis=1), jnp.take(pinf, order))
    )
    prev = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32), d[:-1]])
    starts = (d != prev).astype(jnp.uint32)
    nxt = jnp.concatenate([d[1:], jnp.full((1,), 0xFFFFFFFF, jnp.uint32)])
    ends = d != nxt
    return points, d, starts, ends


@functools.partial(jax.jit, static_argnames=("nbuckets",))
def _scatter_buckets(scanned: C.JacobianPoint, d, ends, nbuckets: int):
    """Write per-segment totals (at segment-end lanes) into the bucket
    table; non-end lanes aim at a dump slot. Indices are unique."""
    idx = jnp.where(ends, d, nbuckets).astype(jnp.int32)
    buckets = C.infinity((nbuckets + 1,))
    buckets = C.JacobianPoint(
        buckets.x.at[:, idx].set(scanned.x),
        buckets.y.at[:, idx].set(scanned.y),
        buckets.z.at[:, idx].set(scanned.z),
    )
    return C.JacobianPoint(
        buckets.x[:, :nbuckets], buckets.y[:, :nbuckets], buckets.z[:, :nbuckets]
    )


def _window_buckets(px, py, pinf, digits, c: int) -> C.JacobianPoint:
    """Per-bucket sums S_b for one window: JacobianPoint batch (2^c,)."""
    points, d, starts, ends = _sort_window(px, py, pinf, digits)
    scanned, _ = scan_utils.inclusive_scan(_seg_combine, (points, starts))
    return _scatter_buckets(scanned, d, ends, 1 << c)


@jax.jit
def _add_combine(left, right):
    return C.add(left, right)


def _reduce_windows(buckets: C.JacobianPoint) -> C.JacobianPoint:
    """Bucket reduction for all windows at once.

    Input: bucket sums, batch (W, B). Output: window totals, batch (W,),
    using T_w = sum_{j>=1} suffix_j with suffix_j = sum_{b>=j} S_b.
    """
    suffix = scan_utils.reverse_scan(_add_combine, buckets)
    tail = jax.tree_util.tree_map(lambda a: a[..., 1:], suffix)  # drop bucket 0
    total = scan_utils.tree_reduce(_add_combine, tail)
    return jax.tree_util.tree_map(lambda a: a[..., 0], total)


@functools.partial(jax.jit, static_argnames=("c",))
def _join_windows(tx, ty, tz, c: int):
    """Horner join: total = sum_w 2^{c w} T_w, highest window first."""
    stacked = C.JacobianPoint(tx, ty, tz)  # batch (W,)
    w_count = tx.shape[1]

    def body(acc, i):
        acc = jax.lax.fori_loop(0, c, lambda _, p: C.double(p), acc)
        t_i = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, w_count - 1 - i, axis=1, keepdims=False),
            stacked,
        )
        return C.add(acc, t_i), None

    init = C.infinity(())
    out, _ = jax.lax.scan(body, init, jnp.arange(w_count))
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def msm(points: AffineBatch, scalars: jax.Array, c: int | None = None) -> C.JacobianPoint:
    """sum_i scalars[i] * points[i].

    points: AffineBatch of N points; scalars: canonical-form limbs
    (16, N). Returns a single Jacobian point (batch shape ()).
    """
    n = points.n
    if scalars.shape[-1] != n:
        raise ValueError("points/scalars length mismatch")
    c = c or default_window_bits(n)
    w_count = num_windows(c)
    digits = extract_digits(scalars, c, w_count)  # (W, N)

    bucket_list = [
        _window_buckets(points.x, points.y, points.inf, digits[w], c)
        for w in range(w_count)
    ]
    buckets = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=1), *bucket_list
    )  # batch (W, B)

    totals = _reduce_windows(buckets)  # batch (W,)
    return _join_windows(totals.x, totals.y, totals.z, c)


def msm_ints(points, scalars, c: int | None = None):
    """Host-convenience MSM: python points/ints -> affine int result."""
    batch = affine_from_ints(points)
    sc = F.from_ints([s % FR.modulus for s in scalars], FR, to_mont=False)
    return C.to_affine_ints(jax.tree_util.tree_map(lambda a: a[..., None], msm(batch, sc, c)))[0]
