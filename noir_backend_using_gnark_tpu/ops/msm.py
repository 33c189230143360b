"""Pippenger multi-scalar multiplication over BN254 G1 (JAX/XLA).

Replaces gnark-crypto's ``MultiExp`` (the G1 MSMs inside KZG commit /
open and the PLONK prover — the dominant cost of ``plonk.Prove``,
SURVEY.md §3.1 hot path (b)) with a TPU-native bucket method that runs
as ONE compiled kernel per problem shape:

  * **signed-digit windows**: scalars are recoded into W = ceil(254/c)
    signed c-bit digits (magnitude <= 2^{c-1}), halving the bucket
    table vs unsigned digits; negative digits negate the point's y
    lane-wise (free);
  * **lane-private bucket accumulation**: each window gets L parallel
    lanes, each owning a private bucket table row. A ``lax.scan`` over
    T = N/L steps adds one affine point per lane per step into
    ``buckets[w, l, digit]`` — a gather + one mixed add + a scatter
    with *unique* per-lane indices, so there are no write conflicts and
    no sorting. Work: exactly W*N mixed adds (work-efficient, same as a
    CPU Pippenger's accumulation phase);
  * **lane fold**: pairwise tree-fold of the L lane tables
    (W*L*B complete adds, log2(L) levels);
  * **weighted bucket reduction**: T_w = sum_b b*S_b via two suffix
    scans (Hillis-Steele with ``jnp.roll``; one group-law instantiation
    each);
  * **window join**: Horner over windows (c doublings + 1 add per
    window, ``lax.scan``).

Everything above is a single jit per (N, c, L): one device dispatch per
MSM, no host round-trips (round 1's sort + host-orchestrated segmented
scan cost hundreds of relay round-trips per MSM). The sharded
multi-chip variant partitions points across devices and folds the
per-device bucket tables with an all_gather (``parallel/dist_msm.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F
from ..utils import sanitize

FR = F.FR
FQ = F.FQ

#: Scalar bit-width for BN254 Fr (r < 2^254).
SCALAR_BITS = 254


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


def default_window_bits(n: int) -> int:
    """Window size default, backed by round-3 TPU measurements.

    On a v5e at 2^16 points, lanes=256: c=3 -> 52.1k pts/s, c=4 ->
    51.7k, c=5 -> 38.7k, c=6 -> 24.0k, c=8 -> 8.2k. The per-step
    bucket-table traffic (2 * W*L*B slots) and the B-way select chains
    dominate the W*N mixed adds on this path, so SMALL windows win —
    the opposite of the CPU add-count heuristic that picked c=8 in
    round 2. c=4 also keeps the unrolled select graph ~14x smaller,
    which the XLA CPU pipeline needs (the B=129 c=8 graph triggered
    compiler segfaults in long test processes).
    """
    return 4


def num_windows(c: int, nbits: int = SCALAR_BITS) -> int:
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


def signed_digits(scalars: jax.Array, c: int, num_w: int):
    """Signed-window recoding: returns (magnitudes, negative) both (W, N).

    digit in (2^{c-1}, 2^c) becomes digit - 2^c with a +1 carry into the
    next window; magnitudes are <= 2^{c-1}. Valid whenever the scalar
    fits in num_w*c - 1 bits (true for Fr < 2^254 with c*W >= 255), so
    the final carry never overflows the top window.
    """
    digits = extract_digits(scalars, c, num_w)  # (W, N) uint32
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    carry = jnp.zeros(digits.shape[1:], jnp.uint32)
    mags, negs = [], []
    for w in range(num_w):
        t = digits[w] + carry
        neg = t > half
        mags.append(jnp.where(neg, full - t, t))
        negs.append(neg)
        carry = neg.astype(jnp.uint32)
    return jnp.stack(mags, axis=0), jnp.stack(negs, axis=0)


def _lanes_for(n: int, c: int, mem_budget: int = 1 << 27) -> int:
    """Lanes per window, capped at 256 by round-3 TPU measurements.

    Measured on a v5e (c=4): 2^16 L=256 -> 51.7k pts/s vs L=1024 ->
    11.9k; 2^20 L=256 -> 106k vs L=1024 -> 69k. Larger lane counts
    scale the per-step bucket table (and the Hillis-Steele lane fold's
    B*W*L*log L adds) faster than they save scan steps. The memory
    budget still bounds tiny-c tables (XLA holds several temporary
    copies of the scan carry; round-2 lesson: a 512 MB budget OOMed a
    16 GB chip at 2^18 with 29 GB of temps)."""
    nbuckets = (1 << (c - 1)) + 1
    w = num_windows(c)
    by_mem = mem_budget // (192 * w * nbuckets)  # 3 coords * 16 limbs * 4 B
    by_work = max(1, n // 256)
    lanes = max(1, min(by_mem, by_work, n, 256))
    return 1 << (lanes.bit_length() - 1)  # power of two, rounded down


# ---------------------------------------------------------------------------
# The megakernel
# ---------------------------------------------------------------------------


def _suffix_scan_points(p: C.JacobianPoint) -> C.JacobianPoint:
    """Inclusive suffix scan (sum of elements to the right, self
    included) along the last batch axis, ONE group-law instantiation.

    Hillis-Steele doubling with a traced roll distance driven by
    ``lax.scan``; wrapped lanes keep their running value.
    """
    n = p.x.shape[-1]
    if n == 1:
        return p
    steps = (n - 1).bit_length()
    ds = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
    lane = jnp.arange(n, dtype=jnp.int32)

    def step(cur, d):
        rolled = jax.tree_util.tree_map(lambda a: jnp.roll(a, -d, axis=-1), cur)
        combined = C.add(cur, rolled)
        keep = lane >= (n - d)  # no right neighbor at distance d
        out = C.select_point(keep, cur, combined)
        return out, None

    out, _ = jax.lax.scan(step, p, ds)
    return out


def _weighted_bucket_reduce(buckets: C.JacobianPoint) -> C.JacobianPoint:
    """T_w = sum_{b>=1} b * S_b for bucket tables with batch (..., B).

    Two suffix scans: U = suffix(S) gives U_j = sum_{b>=j} S_b, and
    sum_{j>=1} U_j is element 1 of suffix(U).
    """
    u = _suffix_scan_points(buckets)
    v = _suffix_scan_points(u)
    return jax.tree_util.tree_map(lambda a: a[..., 1], v)


def _join_windows(totals: C.JacobianPoint, c: int) -> C.JacobianPoint:
    """Horner join: sum_w 2^{c w} T_w, highest window first.

    ``totals`` batch shape (..., W) — any leading batch axes are
    independent MSMs joined in the SAME ~c*W sequential doublings
    (the doubling chain is depth-fundamental, so batching K MSMs here
    amortizes its XLA per-step overhead K-fold; kzg.commit_many_ints
    leans on this to join all of a prover round's commitments at
    once)."""
    w_count = totals.x.shape[-1]
    batch = totals.x.shape[1:-1]

    def body(acc, i):
        acc = jax.lax.fori_loop(0, c, lambda _, p: C.double(p), acc)
        t_i = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, w_count - 1 - i, axis=a.ndim - 1, keepdims=False
            ),
            totals,
        )
        return C.add(acc, t_i), None

    out, _ = jax.lax.scan(body, C.infinity(batch), jnp.arange(w_count))
    return out


def accumulate_buckets(
    px: jax.Array,
    py: jax.Array,
    pinf: jax.Array,
    scalars: jax.Array,
    c: int,
    lanes: int,
) -> C.JacobianPoint:
    """Bucket accumulation + lane fold (traced; call under jit).

    Returns the per-window bucket tables S as a JacobianPoint with
    batch shape (W, B), B = 2^{c-1}+1. N must be divisible by ``lanes``.
    Shared by the single-chip kernel and the shard_map body in
    parallel/dist_msm.py (which folds tables across devices before the
    reduction).
    """
    n = px.shape[-1]
    w_count = num_windows(c)
    nb = (1 << (c - 1)) + 1
    t_steps = n // lanes

    mags, negs = signed_digits(scalars, c, w_count)  # (W, N)

    # Scan-major layouts: step t owns point slice [t*L, (t+1)*L).
    pxr = jnp.moveaxis(px.reshape(16, t_steps, lanes), 1, 0)  # (T, 16, L)
    pyr = jnp.moveaxis(py.reshape(16, t_steps, lanes), 1, 0)
    pinfr = pinf.reshape(t_steps, lanes)
    magr = jnp.moveaxis(mags.reshape(w_count, t_steps, lanes), 1, 0)  # (T, W, L)
    negr = jnp.moveaxis(negs.reshape(w_count, t_steps, lanes), 1, 0)

    # Bucket-MAJOR table (16, B, W, L): the lane axis must be the
    # minor-most dimension so the TPU's 128-wide vector registers tile
    # it densely. Round 3 measured the bucket-minor layout (16,W,L,B)
    # at ~4x slower with large L — B=9/17 as the minor dim forces
    # padded, strided vector accesses on every table touch.
    buckets = C.infinity((nb, w_count, lanes))

    def step(bk, xs):
        # One-hot bucket access: TPU lanes cannot scatter/gather to
        # per-lane addresses (XLA serializes them — measured ~100x off
        # peak), so the read and the writeback are B-way vectorized
        # SELECTS over the small (major) bucket axis instead. Extra
        # work is O(B) cheap selects per EC add; everything stays on
        # the VPU with dense (W, L) tiles.
        px_t, py_t, pinf_t, mag_t, neg_t = xs
        d = mag_t.astype(jnp.int32)  # (W, L)
        cur = jax.tree_util.tree_map(lambda a: a[:, 0], bk)
        for b in range(1, nb):
            cur = C.select_point(
                d == b, jax.tree_util.tree_map(lambda a: a[:, b], bk), cur
            )
        qx = jnp.broadcast_to(px_t[:, None, :], (16, w_count, lanes))
        qy = jnp.broadcast_to(py_t[:, None, :], (16, w_count, lanes))
        qy = F.select(neg_t, F.neg(qy, FQ), qy)
        qinf = jnp.broadcast_to(pinf_t[None, :], (w_count, lanes)) | (mag_t == 0)
        new = C.add_mixed(cur, qx, qy, qinf)
        hit = jax.lax.broadcasted_iota(
            jnp.int32, (nb, w_count, lanes), 0
        ) == d[None]
        bk = C.JacobianPoint(
            jnp.where(hit[None], new.x[:, None], bk.x),
            jnp.where(hit[None], new.y[:, None], bk.y),
            jnp.where(hit[None], new.z[:, None], bk.z),
        )
        return bk, None

    buckets, _ = jax.lax.scan(step, buckets, (pxr, pyr, pinfr, magr, negr))

    # Lane fold: (16, B, W, L) -> (16, W, B). The suffix scan runs
    # along the (minor, dense) lane axis directly — log2(L) steps under
    # lax.scan, ONE group-law instantiation; element 0 is the total.
    summed = _suffix_scan_points(buckets)  # (16, B, W, L), totals at [..., 0]
    folded = jax.tree_util.tree_map(lambda a: a[..., 0], summed)  # (16, B, W)
    return jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 1, 2), folded)


def msm_kernel(
    px: jax.Array,
    py: jax.Array,
    pinf: jax.Array,
    scalars: jax.Array,
    c: int,
    lanes: int,
) -> C.JacobianPoint:
    """Traced single-chip MSM body (call under jit)."""
    buckets = accumulate_buckets(px, py, pinf, scalars, c, lanes)
    totals = _weighted_bucket_reduce(buckets)  # batch (W,)
    return _join_windows(totals, c)


_msm_jit = jax.jit(msm_kernel, static_argnames=("c", "lanes"))

#: Cached platform string for the Pallas-vs-XLA dispatch.
_PLATFORM = None


def _tpu_platform() -> bool:
    """True when the default jax backend is a TPU (cached)."""
    global _PLATFORM
    if _PLATFORM is None:
        try:
            _PLATFORM = jax.devices()[0].platform
        except Exception:  # noqa: BLE001
            _PLATFORM = "unknown"
    return _PLATFORM == "tpu"


def _use_pallas(n: int) -> bool:
    """Route big MSMs through the Pallas VMEM-resident bucket kernel on
    TPU (ops/msm_pallas): measured 756k pts/s at 2^20 vs 106k for the
    XLA scan path (v5e, c=6/c=4 respectively). Small sizes stay on the
    XLA path — both are dispatch-latency-bound there and the XLA
    kernel's compile is cheaper. NOIRTPU_MSM_IMPL=xla|pallas overrides."""
    import os

    mode = os.environ.get("NOIRTPU_MSM_IMPL", "auto")
    if mode == "xla":
        return False
    if mode == "pallas":
        return True
    if n < (1 << 13):
        return False
    return _tpu_platform()


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


#: Chunk size for the Pallas path: the largest size whose executable
#: stays small enough to load fast; larger MSMs partition over it.
PALLAS_CHUNK = 1 << 22

_fold_add = None  # lazily jitted C.add for shape-() Jacobian points


def _pallas_aot_call(px, py, pinf, scalars, cp):
    """One Pallas MSM dispatch through the AOT artifact store
    (utils/aot.py): tracing this kernel costs ~60-130 s per process at
    2^22; an artifact hit is ~2 s cold."""
    from . import msm_pallas
    from ..utils import aot

    return aot.call_aot(
        "msm_pallas",
        msm_pallas.msm_kernel_pallas,
        px,
        py,
        pinf,
        scalars,
        statics=dict(c=cp),
        src_modules=("ops.msm_pallas", "ops.msm", "ops.curve", "ops.field"),
    )


def _msm_chunked(chunk_fn, px, py, pinf, scalars, cp, chunk: int | None = None):
    """MSM over > chunk points as a sum of fixed-shape chunk MSMs.

    Every chunk call has IDENTICAL shapes (the tail is padded with
    infinity points / zero scalars, which the kernels treat as
    identity), so all chunks share one compiled executable. Partial
    Jacobian results fold with the complete device add (ops/curve.add).
    """
    global _fold_add
    chunk = chunk or PALLAS_CHUNK
    n = px.shape[-1]
    parts = []
    for i in range(0, n, chunk):
        end = min(i + chunk, n)
        tail = chunk - (end - i)
        cx, cy = px[:, i:end], py[:, i:end]
        cinf, csc = pinf[i:end], scalars[:, i:end]
        if tail:
            cx = jnp.pad(cx, ((0, 0), (0, tail)))
            cy = jnp.pad(cy, ((0, 0), (0, tail)))
            cinf = jnp.pad(cinf, ((0, tail)), constant_values=True)
            csc = jnp.pad(csc, ((0, 0), (0, tail)))
        parts.append(chunk_fn(cx, cy, cinf, csc, cp))
    if _fold_add is None:
        _fold_add = jax.jit(C.add)
    acc = parts[0]
    for p in parts[1:]:
        acc = _fold_add(acc, p)
    return acc


def msm(points: AffineBatch, scalars: jax.Array, c: int | None = None) -> C.JacobianPoint:
    """sum_i scalars[i] * points[i] — ONE device dispatch.

    points: AffineBatch of N points; scalars: canonical-form limbs
    (16, N). Returns a single Jacobian point (batch shape ()).
    """
    n = points.n
    if scalars.shape[-1] != n:
        raise ValueError("points/scalars length mismatch")
    px, py, pinf = points.x, points.y, points.inf
    if sanitize.enabled():  # debug tier: sampled on-curve + scalar range
        sanitize.check_g1_affine(
            px, py, FQ.modulus, "ops.msm.points", mont=True, inf=pinf
        )
        sanitize.check_field(scalars, FR.modulus, "ops.msm.scalars")
    # c > 7 overflows the pallas kernel's int8 digit stream — route
    # such explicit overrides through the XLA path instead.
    if _use_pallas(n) and (c is None or c <= 7):
        from . import msm_pallas

        cp = c or 6  # measured best under the VMEM-resident kernel
        pad = (-n) % msm_pallas.LANES
        if pad:
            px = jnp.pad(px, ((0, 0), (0, pad)))
            py = jnp.pad(py, ((0, 0), (0, pad)))
            pinf = jnp.pad(pinf, ((0, pad)), constant_values=True)
            scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
        if px.shape[-1] > PALLAS_CHUNK:
            # One executable for every size: n > 2^22 partitions into
            # 2^22 chunks that all reuse the SAME AOT artifact (a 2^24
            # monolith is a distinct ~60 MB executable costing ~110 s
            # to load per process through the compile relay; chunk
            # reuse loads ~16 MB once — measured round 5). Cost: K-1
            # Jacobian adds + ~6% throughput vs the monolith.
            return _msm_chunked(_pallas_aot_call, px, py, pinf, scalars, cp)
        return _pallas_aot_call(px, py, pinf, scalars, cp)
    c = c or default_window_bits(n)
    lanes = _lanes_for(n, c)
    pad = (-n) % lanes
    if pad:
        px = jnp.pad(px, ((0, 0), (0, pad)))
        py = jnp.pad(py, ((0, 0), (0, pad)))
        pinf = jnp.pad(pinf, ((0, pad)), constant_values=True)
        scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
    return _msm_jit(px, py, pinf, scalars, c, lanes)


def msm_ints(points, scalars, c: int | None = None):
    """Host-convenience MSM: python points/ints -> affine int result."""
    batch = affine_from_ints(points)
    sc = F.from_ints([s % FR.modulus for s in scalars], FR, to_mont=False)
    return C.to_affine_ints(jax.tree_util.tree_map(lambda a: a[..., None], msm(batch, sc, c)))[0]
