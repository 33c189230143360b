"""Host-orchestrated work-efficient scans over expensive combines.

``jax.lax.associative_scan`` inlines its combine ~2*log2(n) times into a
single XLA graph. With our EC group law (~28 field muls, ~2.5k HLO ops
per combine) that produces graphs in the 100k-op range, which XLA — CPU
especially — compiles pathologically slowly. These helpers run the same
work-efficient (Blelloch-style, ~2n combines) recursion from *Python*,
so each compiled unit contains exactly ONE combine; jax.jit's shape
cache reuses one compiled kernel per recursion level and across calls.

The runtime cost is a few hundred small dispatches per scan, each doing
O(n_level) lane-parallel work — negligible against the EC math.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _slice_last(tree, sl):
    return jax.tree_util.tree_map(lambda a: a[..., sl], tree)


def _concat_last(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=-1), *trees)


def _interleave_last(even, odd):
    """even (..., m) and odd (..., m) -> (..., 2m) alternating."""

    def f(e, o):
        stacked = jnp.stack([e, o], axis=-1)
        return stacked.reshape(stacked.shape[:-2] + (stacked.shape[-2] * 2,))

    return jax.tree_util.tree_map(f, even, odd)


def _length(tree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[-1]


def inclusive_scan(combine: Callable, elems):
    """Inclusive scan along the last axis of every leaf.

    ``combine(left, right)`` must be associative over the pytree
    structure of ``elems`` (typically a jitted function). Work: ~2n
    combine calls across log2(n) levels; each call is one compiled
    kernel per distinct level shape.
    """
    n = _length(elems)
    if n == 1:
        return elems
    m = n // 2
    even = _slice_last(elems, slice(0, 2 * m, 2))
    odd = _slice_last(elems, slice(1, 2 * m, 2))
    pair_sums = combine(even, odd)
    scanned_pairs = inclusive_scan(combine, pair_sums)  # values at odd slots
    # Even slots: out[0] = elems[0]; out[2i] = scanned_pairs[i-1] + elems[2i].
    first = _slice_last(even, slice(0, 1))
    if m > 1:
        rest = combine(
            _slice_last(scanned_pairs, slice(0, m - 1)), _slice_last(even, slice(1, m))
        )
        even_out = _concat_last([first, rest])
    else:
        even_out = first
    out = _interleave_last(even_out, scanned_pairs)
    if n % 2:
        tail = combine(
            _slice_last(scanned_pairs, slice(m - 1, m)), _slice_last(elems, slice(n - 1, n))
        )
        out = _concat_last([out, tail])
    return out


def rolled_scan(combine: Callable, elems):
    """Trace-safe inclusive scan along the last axis with ONE combine
    instantiation in the whole graph.

    For use *inside* jit/shard_map bodies, where the host-orchestrated
    :func:`inclusive_scan` cannot run (it would inline ~2n combines and
    blow up compile time — an 8-device EC segmented scan measured a
    7-minute XLA CPU compile). Hillis-Steele doubling steps are driven
    by ``lax.scan`` over the step index, so XLA sees a single combine
    body regardless of n; the shift distance is a traced operand of
    ``jnp.roll``. Work is n*log2(n) combines (vs ~2n), all lane-parallel
    — the right trade inside a sharded kernel where the per-shard n is
    already divided by the mesh size.

    ``combine(left, right)`` must be associative and tolerate junk in
    lanes that end up masked (wrapped-around roll values) — true for
    field/EC arithmetic.
    """
    n = _length(elems)
    if n == 1:
        return elems
    steps = (n - 1).bit_length()
    ds = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
    lane = jnp.arange(n, dtype=jnp.int32)

    def step(carry, d):
        shifted = jax.tree_util.tree_map(lambda a: jnp.roll(a, d, axis=-1), carry)
        combined = combine(shifted, carry)
        keep = lane < d  # no left neighbor at distance d: identity
        out = jax.tree_util.tree_map(
            lambda c, new: jnp.where(keep, c, new), carry, combined
        )
        return out, None

    out, _ = jax.lax.scan(step, elems, ds)
    return out


def rolled_reduce(combine: Callable, elems):
    """Trace-safe reduction along the last axis (single combine
    instantiation); returns a tree with last axis of length 1."""
    scanned = rolled_scan(combine, elems)
    return _slice_last(scanned, slice(-1, None))


def reverse_scan(combine: Callable, elems):
    """Inclusive scan from the right (suffix scan)."""
    flipped = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=-1), elems)
    scanned = inclusive_scan(combine, flipped)
    return jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=-1), scanned)


def tree_reduce(combine: Callable, elems):
    """Reduce along the last axis to length 1 by pairwise folding
    (log2(n) combine calls, each lane-parallel over half the elements)."""
    n = _length(elems)
    while n > 1:
        m = n // 2
        left = _slice_last(elems, slice(0, m))
        right = _slice_last(elems, slice(m, 2 * m))
        folded = combine(left, right)
        if n % 2:
            folded = _concat_last([folded, _slice_last(elems, slice(n - 1, n))])
        elems = folded
        n = _length(elems)
    return elems
