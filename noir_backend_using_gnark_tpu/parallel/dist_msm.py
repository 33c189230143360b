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
from jax import shard_map

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import scan_utils
from .mesh import SHARD_AXIS

FR = F.FR


def _local_window_buckets(px, py, pinf, digits, c: int):
    """Traced (inline) bucket accumulation for one window on the local
    shard — same math as ops/msm._window_buckets but with the rolled
    (single-combine-instantiation) segmented scan so it can live inside
    a shard_map body without exploding XLA compile time
    (lax.associative_scan inlines ~2n EC adds; measured 7-minute CPU
    compiles at 8 devices)."""
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

    scanned, _ = scan_utils.rolled_scan(comb, (points, starts))
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


@functools.lru_cache(maxsize=None)
def _window_buckets_fn(mesh, c: int):
    """Compiled bucket-accumulation kernel for one window, cached per
    (mesh, c) so the per-window host loop reuses ONE executable (jit
    then dedupes by operand shape)."""
    n_dev = mesh.devices.size

    def body(px_l, py_l, pinf_l, dig_l):
        local = _local_window_buckets(px_l, py_l, pinf_l, dig_l, c)
        # (D, 16, B) gathered bucket tables; fold with the group law via
        # lax.scan (one C.add instantiation, not D-1 inlined copies).
        gathered = C.JacobianPoint(
            jax.lax.all_gather(local.x, SHARD_AXIS),
            jax.lax.all_gather(local.y, SHARD_AXIS),
            jax.lax.all_gather(local.z, SHARD_AXIS),
        )
        init = jax.tree_util.tree_map(lambda a: a[0], gathered)
        rest = jax.tree_util.tree_map(lambda a: a[1:], gathered)

        def fold(acc, dev_buckets):
            return C.add(acc, dev_buckets), None

        acc, _ = jax.lax.scan(fold, init, rest)
        return acc

    return jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(None, SHARD_AXIS),
                P(None, SHARD_AXIS),
                P(SHARD_AXIS),
                P(SHARD_AXIS),
            ),
            out_specs=(C.JacobianPoint(P(None, None), P(None, None), P(None, None))),
            check_vma=False,
        )
    )


def dist_window_buckets(mesh, px, py, pinf, digits, c: int) -> C.JacobianPoint:
    """Bucket table for one window, reduced across the mesh.

    Inputs are globally-shaped arrays sharded on the point axis.
    Returns replicated (16, B) bucket sums.
    """
    return _window_buckets_fn(mesh, c)(px, py, pinf, digits)


def dist_msm(
    mesh,
    points: M.AffineBatch,
    scalars: jax.Array,
    c: int | None = None,
    nbits: int = 254,
) -> C.JacobianPoint:
    """Full distributed MSM. Host-driven over windows (one compiled
    shard_map body reused for every window). ``nbits`` bounds the
    scalar bit-width (fewer windows when the caller knows scalars are
    small)."""
    n = points.n
    c = c or M.default_window_bits(n)
    w_count = M.num_windows(c, nbits)
    digits = M.extract_digits(scalars, c, w_count)
    bucket_list = [
        dist_window_buckets(mesh, points.x, points.y, points.inf, digits[w], c)
        for w in range(w_count)
    ]
    buckets = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1), *bucket_list)
    totals = M._reduce_windows(buckets)
    return M._join_windows(totals.x, totals.y, totals.z, c)
