"""Distributed Pippenger MSM: points sharded across the mesh.

Each device runs the single-chip megakernel's accumulation + lane fold
(ops/msm.py: signed digits, lane-private bucket tables, conflict-free
gather/add/scatter under ``lax.scan``) over its local point partition;
the per-device bucket tables — the only cross-chip state, (16, W, B)
per device — are all_gathered and folded with the EC group law on every
device (EC addition is not a ``psum`` reduction, so the fold is an
explicit ``lax.scan``). Bucket reduction and the window join then run
replicated, reusing the single-chip code.

Traffic: D * W * B points of ~200B over ICI — for c=8 (W=32, B=129)
and D=8 that's ~6.6 MB total, amortized over N/D * W local mixed adds.
The whole thing is ONE compiled shard_map kernel: one dispatch per MSM.
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
from .mesh import SHARD_AXIS

FR = F.FR


@functools.lru_cache(maxsize=None)
def _dist_msm_fn(mesh, c: int, lanes: int):
    """Compiled whole-MSM kernel for one (mesh, c, lanes): local bucket
    accumulation -> all_gather -> device fold -> reduce -> join."""

    def body(px_l, py_l, pinf_l, sc_l):
        local = M.accumulate_buckets(px_l, py_l, pinf_l, sc_l, c, lanes)  # (16, W, B)
        gathered = C.JacobianPoint(
            jax.lax.all_gather(local.x, SHARD_AXIS),
            jax.lax.all_gather(local.y, SHARD_AXIS),
            jax.lax.all_gather(local.z, SHARD_AXIS),
        )  # (D, 16, W, B)
        init = jax.tree_util.tree_map(lambda a: a[0], gathered)
        rest = jax.tree_util.tree_map(lambda a: a[1:], gathered)

        def fold(acc, dev_buckets):
            return C.add(acc, dev_buckets), None

        buckets, _ = jax.lax.scan(fold, init, rest)
        totals = M._weighted_bucket_reduce(buckets)
        return M._join_windows(totals, c)

    return jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(None, SHARD_AXIS),
                P(None, SHARD_AXIS),
                P(SHARD_AXIS),
                P(None, SHARD_AXIS),
            ),
            out_specs=C.JacobianPoint(P(None), P(None), P(None)),
            check_vma=False,
        )
    )


def dist_msm(
    mesh,
    points: M.AffineBatch,
    scalars: jax.Array,
    c: int | None = None,
) -> C.JacobianPoint:
    """Full distributed MSM — ONE dispatch. Inputs are globally-shaped
    arrays (sharded or replicated; shard_map partitions the point axis).
    Returns a replicated single Jacobian point."""
    n = points.n
    n_dev = mesh.devices.size
    c = c or M.default_window_bits(max(1, n // n_dev))
    lanes = M._lanes_for(max(1, n // n_dev), c)
    from ..utils import metrics, sanitize

    if sanitize.enabled():
        # Same entry tripwires as ops.msm.msm — mesh proves route their
        # commits here and must not silently lose sanitizer coverage.
        sanitize.check_g1_affine(
            points.x, points.y, F.FQ.modulus, "dist_msm.points",
            mont=True, inf=points.inf,
        )
        sanitize.check_field(scalars, FR.modulus, "dist_msm.scalars")

    # Fabric traffic of the bucket all_gather: 3 Jacobian coordinate
    # planes of (16, W, B_buckets) uint32 per device, each received by
    # the other D-1 devices.
    w_cnt = M.num_windows(c)
    n_buckets = (1 << (c - 1)) + 1  # signed-digit buckets incl. zero
    metrics.count(
        "comm.all_gather_bytes",
        3 * 16 * w_cnt * n_buckets * 4 * (n_dev - 1) * n_dev,
    )
    pad = (-n) % (lanes * n_dev)
    px, py, pinf = points.x, points.y, points.inf
    if pad:
        px = jnp.pad(px, ((0, 0), (0, pad)))
        py = jnp.pad(py, ((0, 0), (0, pad)))
        pinf = jnp.pad(pinf, ((0, pad),), constant_values=True)
        scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
    return _dist_msm_fn(mesh, c, lanes)(px, py, pinf, scalars)
