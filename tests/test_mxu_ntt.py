"""MXU four-step NTT: equality vs the scan NTT, batching, prover wiring.

The two kernels must compute the exact same field elements so that
proof bytes are independent of which NTT implementation the prover
routes through (plonk/prove._TransformOps._mxu_ok).
"""

import numpy as np
import pytest

from noir_backend_using_gnark_tpu.ops import field as F
from noir_backend_using_gnark_tpu.ops import mxu_ntt as MX
from noir_backend_using_gnark_tpu.ops import ntt as N


def _rand(n, batch=(), seed=0):
    rng = np.random.RandomState(seed)
    vals = [int(x) for x in rng.randint(0, 2**62, size=int(np.prod(batch or (1,))) * n)]
    arr = F.from_ints(vals, F.FR)
    return arr.reshape((16,) + batch + (n,))


@pytest.mark.parametrize("k", [4, 6, 9, 11])
def test_matches_scan_ntt(k):
    n = 1 << k
    a = _rand(n, seed=k)
    assert (np.asarray(MX.ntt_mxu(a)) == np.asarray(N.ntt(a, N.Domain.get(n)))).all()
    assert (
        np.asarray(MX.ntt_mxu(a, inverse=True))
        == np.asarray(N.intt(a, N.Domain.get(n)))
    ).all()


def test_roundtrip():
    n = 1 << 8
    a = _rand(n, seed=42)
    back = MX.ntt_mxu(MX.ntt_mxu(a), inverse=True)
    assert (np.asarray(back) == np.asarray(a)).all()


def test_batched_matches_scan():
    n = 1 << 6
    a = _rand(n, batch=(3,), seed=7)
    got = MX.ntt_mxu(a)
    ref = N.ntt(a, N.Domain.get(n))
    assert got.shape == a.shape
    assert (np.asarray(got) == np.asarray(ref)).all()


@pytest.mark.slow
def test_prover_routes_through_mxu(monkeypatch):
    """Proof bytes are identical whichever NTT kernel the prover uses.

    Needs a domain >= 256 so the MXU threshold engages (a ~250-gate
    circuit gives n=256, 4n=1024 coset transforms)."""
    from noir_backend_using_gnark_tpu import artifacts
    from noir_backend_using_gnark_tpu.acir import builder, lowering, solver
    from noir_backend_using_gnark_tpu.kzg import kzg
    from noir_backend_using_gnark_tpu.plonk import prove as pp
    from noir_backend_using_gnark_tpu.plonk import setup as ps
    from noir_backend_using_gnark_tpu.plonk import verify as pv

    b = builder.CircuitBuilder()
    x = b.witness(public=True)
    acc = x
    for i in range(250):
        acc = b.mul(acc, x) if i % 3 == 0 else b.add(acc, x)
    circuit = b.build()
    witness = solver.solve(circuit, {1: 3})
    values = solver.dense_values(circuit, witness)
    pc = lowering.lower_to_plonk(circuit)
    assignment = lowering.build_assignment(pc, values)
    srs = kzg.generate_srs((1 << 10) + 8, 777)
    pk, vk = ps.setup(pc, srs)
    seed = b"\x03" * 32
    monkeypatch.setenv("NOIRTPU_NTT_IMPL", "scan")
    p_scan = pp.prove(pk, assignment, rng_seed=seed)
    monkeypatch.setenv("NOIRTPU_NTT_IMPL", "mxu")
    p_mxu = pp.prove(pk, assignment, rng_seed=seed)
    assert artifacts.proof_to_bytes(p_scan) == artifacts.proof_to_bytes(p_mxu)
    publics = [values[i - 1] for i in pc.public_witness_indices]
    assert pv.verify(vk, p_mxu, publics)


# ---------------------------------------------------------------------------
# Two-level big path (n > 2^22 in production; exercised small here)
# ---------------------------------------------------------------------------


def _rand_poly(n, seed=3):
    rng = np.random.RandomState(seed)
    return F.from_ints([int(v) for v in rng.randint(0, 2**62, size=n)], F.FR)


def test_big_path_matches_scan():
    n = 1 << 12
    x = _rand_poly(n)
    dom = N.Domain.get(n)
    assert (np.asarray(MX.ntt_mxu_big(x)) == np.asarray(N.ntt(x, dom))).all()
    assert (
        np.asarray(MX.ntt_mxu_big(x, inverse=True))
        == np.asarray(N.intt(x, dom))
    ).all()


def test_big_path_roundtrip_and_batch():
    n = 1 << 12
    x = _rand_poly(2 * n).reshape(16, 2, n)
    dom = N.Domain.get(n)
    got = MX.ntt_mxu_big(x)
    assert (np.asarray(got) == np.asarray(N.ntt(x, dom))).all()
    back = MX.ntt_mxu_big(got, inverse=True)
    assert (np.asarray(back) == np.asarray(x)).all()


def test_big_path_chunked_inner(monkeypatch):
    """Force the lax.map chunking (the 2^24 memory-bounding path) at a
    small size and check exactness."""
    monkeypatch.setattr(MX, "_CHUNK_TARGET", 1 << 8)  # chunk=4 at n1=64
    n = 1 << 12
    x = _rand_poly(n, seed=9)
    dom = N.Domain.get(n)
    assert (np.asarray(MX.ntt_mxu_big(x)) == np.asarray(N.ntt(x, dom))).all()


def test_dispatch_routes_big():
    """ntt_mxu transparently routes n > 2^22 to the big path — checked
    via the MxuBigDomain cache key (no 2^23 transform on CPU here; the
    split/table shapes are what's asserted)."""
    dom = MX.MxuBigDomain(1 << 23)
    assert dom.n1 * dom.n2 == 1 << 23
    assert max(dom.n1, dom.n2) <= 1 << 12
    t1, t2 = dom.fwd
    assert t1.shape[0] == 16 and t1.shape[1] == dom.n2
    assert t1.shape[2] * t2.shape[2] == dom.n1
