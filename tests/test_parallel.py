"""Sharded-pipeline tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noir_backend_using_gnark_tpu.ops import field as F
from noir_backend_using_gnark_tpu.ops import msm as M
from noir_backend_using_gnark_tpu.ops import ntt as N
from noir_backend_using_gnark_tpu.parallel import dist_msm, dist_ntt, mesh as mesh_mod
from noir_backend_using_gnark_tpu.utils import bigint, hostcurve as H

R = bigint.FR_MODULUS


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return mesh_mod.make_mesh(8)


def test_four_step_matches_local(rng, mesh8):
    n = 256
    coeffs = [rng.randrange(R) for _ in range(n)]
    a = F.from_ints(coeffs, F.FR)
    want = F.to_ints(N.ntt(a), F.FR)
    got_arr = jax.jit(lambda x: dist_ntt.four_step_ntt(x, mesh8))(a)
    got = F.to_ints(got_arr, F.FR)
    assert got == want


def test_four_step_intt_roundtrip(rng, mesh8):
    n = 256
    coeffs = [rng.randrange(R) for _ in range(n)]
    a = F.from_ints(coeffs, F.FR)
    fwd = jax.jit(lambda x: dist_ntt.four_step_ntt(x, mesh8))(a)
    back = jax.jit(lambda x: dist_ntt.four_step_intt(x, mesh8))(fwd)
    assert F.to_ints(back, F.FR) == coeffs


def test_dist_msm_matches_host(rng, mesh8):
    g = H.g1_generator()
    n = 16  # 2 points per device
    pts = [H.g1_mul(g, rng.randrange(1, H.R)) for _ in range(n)]
    scalars = [rng.randrange(H.R) for _ in range(n)]
    batch = M.affine_from_ints(pts)
    sc = F.from_ints(scalars, F.FR, to_mont=False)
    out = dist_msm.dist_msm(mesh8, batch, sc, c=4)
    got = __import__(
        "noir_backend_using_gnark_tpu.ops.curve", fromlist=["to_affine_ints"]
    ).to_affine_ints(jax.tree_util.tree_map(lambda a: a[..., None], out))[0]
    assert got == H.g1_msm(pts, scalars)
