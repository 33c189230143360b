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


def horner_states(coeffs: jax.Array, z: jax.Array) -> jax.Array:
    """s_i = f_i + z*f_{i+1} + z^2*f_{i+2} + ... for all i, shape (16, n).

    s_0 is f(z); s_{i+1} are the quotient coefficients of
    (f(X) - f(z)) / (X - z) (synthetic division).
    """
    n = coeffs.shape[1]
    zz = jnp.broadcast_to(z.reshape(16, 1), (16, n))
    elems = (zz, coeffs)
    # We need m_i o m_{i+1} o ... o m_{n-1}: flip, scan with swapped
    # operand order (composition is not commutative), flip back.
    flipped = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=-1), elems)
    scanned = scan_utils.inclusive_scan(jax.jit(_swapped_compose), flipped)
    _, adds = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=-1), scanned)
    return adds


def eval_at(coeffs: jax.Array, z: jax.Array) -> jax.Array:
    """f(z); z is a single element (16,) or (16, 1). Returns (16, 1)."""
    s = horner_states(coeffs, z)
    return s[:, :1]


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


def linear_combination(polys: list, weights: list) -> jax.Array:
    """sum_i weights[i] * polys[i] (weights: single elements (16,1))."""
    acc = scale_poly(polys[0], weights[0])
    for p, w in zip(polys[1:], weights[1:]):
        acc = add_polys(acc, scale_poly(p, w))
    return acc
