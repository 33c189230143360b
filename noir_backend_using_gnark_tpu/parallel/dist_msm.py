"""Distributed Pippenger MSM: points sharded across the mesh.

Each device runs the bucket-accumulation phase (sort + segmented scan)
over its local point partition; the per-window bucket tables — the only
cross-chip state, (16, B) per window — are then all_gathered and folded
with the EC group law on every device (EC addition is not a ``psum``
reduction, so the fold is explicit). Bucket reduction and the window
join reuse the single-chip code on the replicated result.

Traffic per window: D * 2^c points of ~200B over ICI — for c=16 and
D=8 that's ~100MB total, amortized over N/D * ~2 EC adds of local work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from .mesh import SHARD_AXIS

FR = F.FR


def _local_window_buckets(px, py, pinf, digits, c: int):
    """Traced (inline) bucket accumulation for one window on the local
    shard — same math as ops/msm._window_buckets but with
    ``associative_scan`` so it can live inside a shard_map body."""
    nbuckets = 1 << c
    order = jnp.argsort(digits)
    d = jnp.take(digits, order)
    points = C.JacobianPoint(
        jnp.take(px, order, axis=1),
        jnp.take(py, order, axis=1),
        F.select(
            jnp.take(pinf, order),
            F.zeros(d.shape),
            F.one_mont(F.FQ, d.shape),
        ),
    )
    prev = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32), d[:-1]])
    starts = (d != prev).astype(jnp.uint32)[None, :]

    def comb(left, right):
        pl, fl = left
        pr, fr = right
        return (C.select_point(fr[0] != 0, pr, C.add(pl, pr)), fl | fr)

    scanned, _ = jax.lax.associative_scan(comb, (points, starts), axis=1)
    nxt = jnp.concatenate([d[1:], jnp.full((1,), 0xFFFFFFFF, jnp.uint32)])
    ends = d != nxt
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


def dist_window_buckets(mesh, px, py, pinf, digits, c: int) -> C.JacobianPoint:
    """Bucket table for one window, reduced across the mesh.

    Inputs are globally-shaped arrays sharded on the point axis.
    Returns replicated (16, B) bucket sums.
    """
    n_dev = mesh.devices.size

    def body(px_l, py_l, pinf_l, dig_l):
        local = _local_window_buckets(px_l, py_l, pinf_l, dig_l, c)
        # (D, 16, B) gathered bucket tables; fold with the group law.
        gx = jax.lax.all_gather(local.x, SHARD_AXIS)
        gy = jax.lax.all_gather(local.y, SHARD_AXIS)
        gz = jax.lax.all_gather(local.z, SHARD_AXIS)
        acc = C.JacobianPoint(gx[0], gy[0], gz[0])
        for dev in range(1, n_dev):
            acc = C.add(acc, C.JacobianPoint(gx[dev], gy[dev], gz[dev]))
        return acc

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, SHARD_AXIS), P(None, SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(C.JacobianPoint(P(None, None), P(None, None), P(None, None))),
        check_vma=False,
    )(px, py, pinf, digits)


def dist_msm(
    mesh, points: M.AffineBatch, scalars: jax.Array, c: int | None = None
) -> C.JacobianPoint:
    """Full distributed MSM. Host-driven over windows (one compiled
    shard_map body reused for every window)."""
    n = points.n
    c = c or M.default_window_bits(n)
    w_count = M.num_windows(c)
    digits = M.extract_digits(scalars, c, w_count)
    bucket_list = [
        dist_window_buckets(mesh, points.x, points.y, points.inf, digits[w], c)
        for w in range(w_count)
    ]
    buckets = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1), *bucket_list)
    totals = M._reduce_windows(buckets)
    return M._join_windows(totals.x, totals.y, totals.z, c)
