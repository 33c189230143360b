"""Pippenger MSM tests vs the naive host MSM."""

import numpy as np
import pytest

from noir_backend_using_gnark_tpu.ops import field as F
from noir_backend_using_gnark_tpu.ops import msm as M
from noir_backend_using_gnark_tpu.utils import hostcurve as H

R = H.R


def test_extract_digits():
    s = F.from_ints([0x1234567890ABCDEF], F.FR, to_mont=False)
    digits = np.asarray(M.extract_digits(s, 8, 8))[:, 0]
    want = [(0x1234567890ABCDEF >> (8 * w)) & 0xFF for w in range(8)]
    assert list(digits) == want
    # 12-bit windows straddle limb boundaries
    digits = np.asarray(M.extract_digits(s, 12, 6))[:, 0]
    want = [(0x1234567890ABCDEF >> (12 * w)) & 0xFFF for w in range(6)]
    assert list(digits) == want


def test_msm_small(rng):
    g = H.g1_generator()
    pts = [H.g1_mul(g, rng.randrange(1, H.R)) for _ in range(7)]
    scalars = [rng.randrange(H.R) for _ in range(6)] + [0]
    got = M.msm_ints(pts, scalars, c=4)
    want = H.g1_msm(pts, scalars)
    assert got == want


def test_msm_with_infinity_and_dups(rng):
    g = H.g1_generator()
    p = H.g1_mul(g, 7)
    pts = [g, g, None, p, H.g1_neg(p), None, g]
    scalars = [1, 2, 5, 11, 11, 3, 0]
    got = M.msm_ints(pts, scalars, c=4)
    want = H.g1_msm(pts, scalars)
    assert got == want


def test_msm_window_sizes(rng):
    g = H.g1_generator()
    n = 7  # same shapes as test_msm_small (compile-cache friendly)
    pts = [H.g1_mul(g, rng.randrange(1, H.R)) for _ in range(n)]
    scalars = [rng.randrange(H.R) for _ in range(n)]
    want = H.g1_msm(pts, scalars)
    assert M.msm_ints(pts, scalars, c=8) == want


def test_msm_all_zero_scalars():
    g = H.g1_generator()
    assert M.msm_ints([g, g], [0, 0], c=4) is None


def test_signed_digits_reconstruct(rng):
    """Signed recoding must satisfy sum_w digit_w * 2^{cw} == scalar."""
    c = 8
    w_count = M.num_windows(c)
    scalars = [rng.randrange(H.R) for _ in range(5)] + [0, H.R - 1]
    sc = F.from_ints(scalars, F.FR, to_mont=False)
    mags, negs = M.signed_digits(sc, c, w_count)
    mags = np.asarray(mags).astype(np.int64)
    negs = np.asarray(negs)
    for i, s in enumerate(scalars):
        total = 0
        for w in range(w_count):
            d = -int(mags[w, i]) if negs[w, i] else int(mags[w, i])
            total += d << (c * w)
        assert total == s
        assert mags[:, i].max() <= 1 << (c - 1)


def test_msm_2e12_default_window(rng):
    """Production path: n=2^12 with the default c=8 signed-window
    megakernel (round 1 never exercised default_window_bits sizes)."""
    n = 1 << 12
    g = H.g1_generator()
    # few distinct points tiled (generation cost), full-width scalars
    distinct = [H.g1_mul(g, rng.randrange(1, H.R)) for _ in range(8)]
    pts = [distinct[i % 8] for i in range(n)]
    scalars = [rng.randrange(H.R) for _ in range(n)]
    got = M.msm_ints(pts, scalars)
    # host oracle: group equal points, sum their scalars
    acc = [0] * 8
    for i, s in enumerate(scalars):
        acc[i % 8] = (acc[i % 8] + s) % H.R
    want = H.g1_msm(distinct, acc)
    assert got == want


@pytest.mark.slow
def test_pallas_accumulation_matches_host(rng):
    """The Pallas VMEM-resident bucket kernel (interpret mode on CPU)
    computes the same MSM as the host reference."""
    import jax

    from noir_backend_using_gnark_tpu.ops import curve as C
    from noir_backend_using_gnark_tpu.ops import msm_pallas as MP

    n = 128  # one grid step per window group
    g = H.g1_generator()
    pts, acc = [], g
    for _ in range(n):
        pts.append(acc)
        acc = H.g1_add(acc, g)
    scalars = [rng.randrange(1, R) for _ in range(n)]
    want = None
    for p, s in zip(pts, scalars):
        want = H.g1_add(want, H.g1_mul(p, s))
    batch = M.affine_from_ints(pts)
    sc = F.from_ints(scalars, F.FR, to_mont=False)
    out = MP.msm_kernel_pallas(batch.x, batch.y, batch.inf, sc, 4, interpret=True)
    got = C.to_affine_ints(jax.tree_util.tree_map(lambda a: a[..., None], out))[0]
    assert got == want


def test_pallas_rejects_int8_overflow_window():
    """c=8 signed digits reach magnitude 128, which wraps in the int8
    digit stream — the kernel must refuse rather than silently drop
    points (advisor round 3)."""
    from noir_backend_using_gnark_tpu.ops import msm_pallas as MP

    n = MP.LANES
    px = F.from_ints([1] * n, F.FQ, to_mont=False)
    sc = F.from_ints([1] * n, F.FR, to_mont=False)
    pinf = np.zeros(n, bool)
    with pytest.raises(ValueError, match="c <= 7|int8"):
        MP.accumulate_buckets_pallas(px, px, pinf, sc, c=8, interpret=True)


def test_msm_chunked_matches_single(rng):
    """_msm_chunked (the >PALLAS_CHUNK partition used on TPU) must
    equal a single-shot MSM. Driven here with the XLA kernel as the
    chunk function so the fold logic is exercised on CPU."""
    import jax

    from noir_backend_using_gnark_tpu.ops import curve as C

    g = H.g1_generator()
    n = 24  # 3 chunks of 8 + tail padding inside the helper
    pts = [H.g1_mul(g, rng.randrange(1, H.R)) for _ in range(n)]
    scalars = [rng.randrange(H.R) for _ in range(n)]
    want = H.g1_msm(pts, scalars)

    batch = M.affine_from_ints(pts)
    sc = F.from_ints(scalars, F.FR, to_mont=False)

    def chunk_fn(px, py, pinf, csc, c):
        return M._msm_jit(px, py, pinf, csc, c, px.shape[-1])

    out = M._msm_chunked(chunk_fn, batch.x, batch.y, batch.inf, sc, 4, chunk=10)
    got = C.to_affine_ints(jax.tree_util.tree_map(lambda a: a[..., None], out))[0]
    assert got == want
