"""Debug sanitizer tier — the integer-crypto analogue of ``jax_debug_nans``.

The reference inherits Go's race detector and Rust's ownership checks
for free (SURVEY.md §5 "race/sanitizer"); a JAX backend's failure mode
is different: limb-representation corruption. Every field element here
is 16 uint32 limbs of 16 bits in Montgomery form (ops/field.py), and
the two invariants a buggy kernel can silently break are

  1. **limb range** — every limb fits 16 bits (a missed carry/reduction
     leaves bits above 2^16 that the next multiply wraps mod 2^32), and
  2. **canonicality** — the represented value is < p (a skipped final
     conditional-subtract leaves p <= v < 2^256, which corrupts only the
     rare inputs near p — exactly the bug class that passes small tests).

NaNs can't flag either (everything is finite integer math), so this
module provides the equivalent tripwire: :func:`check_field` validates
both invariants over a whole batch with vectorized numpy (no Python
per-element loop), and :func:`check_g1_affine` spot-checks that point
coordinates actually lie on BN254 (y^2 = x^3 + 3 over Fq).

Zero-cost when off: every check starts with ``if not enabled(): return``
— no device sync, no host transfer. Turn it on with
``NOIRTPU_SANITIZE=1`` (or :func:`enable`); the prover then validates
its round outputs at each phase boundary and raises
:class:`SanitizeError` naming the phase and the first offending element
instead of emitting an unverifiable proof. CI runs the 15-program suite
once under this mode (the analogue of a ``-race`` tier).
"""

from __future__ import annotations

import os

import numpy as np

from ..errors import BackendError
from . import bigint

#: ``None`` = follow the env var (re-read on every check, so setting
#: ``NOIRTPU_SANITIZE=1`` after import works like ``jax_debug_nans``);
#: ``True``/``False`` = explicit :func:`enable` override wins.
_STATE: dict = {"override": None}


class SanitizeError(BackendError):
    """A limb-representation invariant was violated (debug tier)."""


def enable(on: bool = True) -> None:
    _STATE["override"] = on


def enabled() -> bool:
    if _STATE["override"] is not None:
        return _STATE["override"]
    return os.environ.get("NOIRTPU_SANITIZE", "") not in ("", "0")


def _to_host(arr) -> np.ndarray:
    """Device -> host, blocking. Accepts jax or numpy arrays."""
    return np.asarray(arr)


def check_field(arr, modulus: int, where: str) -> None:
    """Validate a ``(16, *batch)`` uint32 limb batch: limbs fit 16 bits
    and every element (interpreted little-endian) is ``< modulus``.

    Montgomery form doesn't matter — a Montgomery representative is a
    field element like any other and must itself be canonical.
    """
    if not enabled():
        return
    a = _to_host(arr)
    if a.ndim < 1 or a.shape[0] != bigint.NUM_LIMBS:
        raise SanitizeError(
            f"[{where}] expected (16, ...) limb array, got shape {a.shape}"
        )
    flat = a.reshape(bigint.NUM_LIMBS, -1)
    over = flat > bigint.LIMB_MASK
    if over.any():
        limb, idx = np.argwhere(over)[0]
        raise SanitizeError(
            f"[{where}] limb overflow: element {idx} limb {limb} = "
            f"{int(flat[limb, idx]):#x} > 0xffff (missed carry/reduction)"
        )
    p_limbs = bigint.int_to_limbs(modulus)
    # Vectorized lexicographic v < p, most-significant limb first.
    lt = np.zeros(flat.shape[1], dtype=bool)
    decided = np.zeros(flat.shape[1], dtype=bool)
    for i in range(bigint.NUM_LIMBS - 1, -1, -1):
        li = flat[i]
        lt |= ~decided & (li < p_limbs[i])
        decided |= li != p_limbs[i]
    bad = ~lt  # v == p (undecided) or v > p both land here
    if bad.any():
        idx = int(np.argwhere(bad)[0][0])
        v = bigint.limbs_to_int(flat[:, idx])
        raise SanitizeError(
            f"[{where}] non-canonical element {idx}: value {v:#x} >= "
            f"modulus (skipped final subtract?)"
        )


def check_g1_affine(
    x_arr,
    y_arr,
    q: int,
    where: str,
    sample: int = 8,
    mont: bool = False,
    inf=None,
) -> None:
    """Spot-check affine G1 coordinates: y^2 == x^3 + 3 (mod q) on up to
    ``sample`` evenly-spaced elements.

    Inputs are ``(16, n)`` limb arrays; pass ``mont=True`` when the
    coordinates are in Montgomery form (ops/curve keeps Fq in Montgomery
    end-to-end) and the check converts the sampled values host-side.
    ``inf`` is an optional (n,) infinity mask — flagged points are
    skipped; without it, (0, 0) is accepted as the infinity encoding.
    A full on-curve sweep at 2^24 points would cost more than the MSM
    it guards, hence sampling.
    """
    if not enabled():
        return
    xs = _to_host(x_arr).reshape(bigint.NUM_LIMBS, -1)
    ys = _to_host(y_arr).reshape(bigint.NUM_LIMBS, -1)
    infs = None if inf is None else _to_host(inf).reshape(-1)
    n = xs.shape[1]
    if n == 0:
        return
    r_inv = pow(1 << (bigint.LIMB_BITS * bigint.NUM_LIMBS), -1, q) if mont else 1
    for idx in sorted({int(i) for i in np.linspace(0, n - 1, num=min(sample, n))}):
        if infs is not None and infs[idx]:
            continue
        x = bigint.limbs_to_int(xs[:, idx]) * r_inv % q
        y = bigint.limbs_to_int(ys[:, idx]) * r_inv % q
        if infs is None and x == 0 and y == 0:
            continue  # point at infinity encoding
        if (y * y - (x * x * x + 3)) % q != 0:
            raise SanitizeError(
                f"[{where}] point {idx} off-curve: x={x:#x} y={y:#x}"
            )
