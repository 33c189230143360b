"""Polynomial primitives over Fr built on the NTT/scan layers.

Everything operates on (16, n) Montgomery-form coefficient arrays.

The sequential-looking recurrences (Horner evaluation, synthetic
division by X - z) are expressed as *suffix scans over affine maps*:
the map m_i(x) = f_i + z*x composes associatively —
(p1, a1) o (p2, a2) = (p1*p2, a1 + p1*a2) — so a work-efficient scan
computes all partial Horner states in O(n) multiplies at O(log n)
depth. This is the standard trick for running first-order linear
recurrences on SIMD hardware; it's what makes KZG openings TPU-shaped
instead of a million-step serial loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import field as F
from . import scan_utils

FR = F.FR


@jax.jit
def _affine_compose(left, right):
    """Compose affine maps (p, a): (f o g)(x) = f(g(x)).

    left = f = (pf, af), right = g = (pg, ag): result (pf*pg, af + pf*ag).
    """
    pf, af = left
    pg, ag = right
    return (
        F.mont_mul(pf, pg, FR),
        F.add(af, F.mont_mul(pf, ag, FR), FR),
    )


def _swapped_compose(a, b):
    return _affine_compose(b, a)


@jax.jit
def _horner_states_jit(coeffs: jax.Array, z: jax.Array) -> jax.Array:
    zz = jnp.broadcast_to(
        z.reshape((16,) + (1,) * (coeffs.ndim - 1)), coeffs.shape
    )
    elems = (zz, coeffs)
    # We need m_i o m_{i+1} o ... o m_{n-1}: flip, scan with swapped
    # operand order (composition is not commutative), flip back.
    flipped = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=-1), elems)
    scanned = scan_utils.rolled_scan(_swapped_compose, flipped)
    _, adds = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=-1), scanned)
    return adds


def horner_states(coeffs: jax.Array, z: jax.Array) -> jax.Array:
    """s_i = f_i + z*f_{i+1} + z^2*f_{i+2} + ... for all i.

    ``coeffs``: (16, ..., n) — extra axes are a batch of polynomials
    evaluated at the same z. s_0 is f(z); s_{i+1} are the quotient
    coefficients of (f(X) - f(z)) / (X - z) (synthetic division).

    ONE device dispatch: the affine-map scan runs in-graph
    (scan_utils.rolled_scan, single combine instantiation). The
    host-orchestrated work-efficient scan was ~3*log2(n) dispatches —
    fine on local hardware, but the TPU relay charges ~0.1-0.3 s of
    latency PER dispatch, which dominated prove time.
    """
    return _horner_states_jit(coeffs, z)


def eval_at(coeffs: jax.Array, z: jax.Array) -> jax.Array:
    """f(z); z is a single element (16,) or (16, 1). Returns (16, 1)."""
    s = horner_states(coeffs, z)
    return s[:, :1]


def eval_many(polys: list, z: jax.Array) -> list:
    """[f_i(z)] for polynomials of (possibly) different lengths — ONE
    device dispatch: zero-pad to a common length, stack, batched
    Horner. Returns a list of (16, 1) arrays."""
    n = max(p.shape[-1] for p in polys)
    stacked = jnp.stack(
        [jnp.pad(p, ((0, 0), (0, n - p.shape[-1]))) for p in polys], axis=1
    )  # (16, P, n)
    s = horner_states(stacked, z)
    first = s[:, :, 0]  # (16, P)
    return [first[:, i : i + 1] for i in range(len(polys))]


def divide_by_linear(coeffs: jax.Array, z: jax.Array):
    """(quotient, remainder) of f(X) / (X - z).

    quotient: (16, n-1); remainder: (16, 1) == f(z).
    """
    s = horner_states(coeffs, z)
    return s[:, 1:], s[:, :1]


@jax.jit
def add_polys(a: jax.Array, b: jax.Array) -> jax.Array:
    n = max(a.shape[1], b.shape[1])
    a = jnp.pad(a, ((0, 0), (0, n - a.shape[1])))
    b = jnp.pad(b, ((0, 0), (0, n - b.shape[1])))
    return F.add(a, b, FR)


@jax.jit
def scale_poly(a: jax.Array, s: jax.Array) -> jax.Array:
    """Multiply every coefficient by the single element s (16,)/(16,1)."""
    return F.mont_mul(a, jnp.broadcast_to(s.reshape(16, 1), a.shape), FR)


@jax.jit
def _lincomb_stacked(stacked: jax.Array, weights: jax.Array) -> jax.Array:
    """sum over axis 1 of stacked (16, P, n) * weights (16, P, 1),
    with the P-axis reduction done as mod-p adds."""
    prods = F.mont_mul(stacked, weights, FR)
    acc = prods[:, 0]
    for i in range(1, prods.shape[1]):
        acc = F.add(acc, prods[:, i], FR)
    return acc


def linear_combination(polys: list, weights: list) -> jax.Array:
    """sum_i weights[i] * polys[i] (weights: single elements (16,1)).

    ONE dispatch: pads to a common length, stacks, multiplies by the
    stacked weights and reduces (the scale/add chain was 2 dispatches
    per polynomial — relay-latency-bound).
    """
    n = max(p.shape[-1] for p in polys)
    stacked = jnp.stack(
        [jnp.pad(p, ((0, 0), (0, n - p.shape[-1]))) for p in polys], axis=1
    )
    w = jnp.stack([jnp.broadcast_to(w.reshape(16, 1), (16, 1)) for w in weights], axis=1)
    return _lincomb_stacked(stacked, w)
