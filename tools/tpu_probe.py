"""Ad-hoc on-device kernel timing probe (development tool).

Measures individual kernels on whatever accelerator the ambient JAX
install provides, with the persistent compile cache enabled. Not part
of the bench contract (bench.py is); this exists so kernel iterations
during development get timed identically to the driver bench.

Usage: python tools/tpu_probe.py msm:20:6 msm:22:7 ntt_mxu:20 ntt_scan:20 ...
Each arg = section:log2[:window].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noir_backend_using_gnark_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402  (host_base_points reuse)
from noir_backend_using_gnark_tpu.ops import field as F  # noqa: E402
from noir_backend_using_gnark_tpu.ops import msm as M  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]


rng = np.random.RandomState(7)


def rand_fr_limbs(n):
    arr = rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32)
    arr[15] &= 0x2FFF
    return jnp.asarray(arr)


def probe_msm(log2: int, c: int | None):
    n = 1 << log2
    bx, by = bench.host_base_points(1 << bench.BASE_LOG2)
    reps = max(1, n // (1 << bench.BASE_LOG2))
    px = jnp.asarray(np.tile(bx, (1, reps))[:, :n])
    py = jnp.asarray(np.tile(by, (1, reps))[:, :n])
    pinf = jnp.zeros((n,), bool)
    pts = M.AffineBatch(px, py, pinf)
    sc = rand_fr_limbs(n)
    t0 = time.time()
    sync(M.msm(pts, sc, c=c))
    print(f"msm 2^{log2} c={c}: compile+warm {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    sync(M.msm(pts, sc, c=c))
    dt = time.time() - t0
    print(f"msm 2^{log2} c={c}: {dt:.4f}s = {n/dt/1e6:.3f} M pts/s", flush=True)


def probe_ntt(kind: str, log2: int):
    n = 1 << log2
    if kind == "scan":
        from noir_backend_using_gnark_tpu.ops import ntt as N

        dom = N.Domain.get(n)
        fn = lambda a: N.ntt(a, dom)  # noqa: E731
    else:
        from noir_backend_using_gnark_tpu.ops import mxu_ntt

        fn = mxu_ntt.ntt_mxu
    coeffs = rand_fr_limbs(n)
    t0 = time.time()
    sync(fn(coeffs))
    cold = time.time() - t0
    print(f"ntt_{kind} 2^{log2}: cold(compile+run) {cold:.2f}s", flush=True)
    reps = 5 if log2 <= 20 else 2
    out = coeffs
    t0 = time.time()
    for _ in range(reps):
        out = fn(out)
    sync(out)
    dt = (time.time() - t0) / reps
    print(
        f"ntt_{kind} 2^{log2}: warm {dt:.4f}s = {n/dt/1e6:.3f} M elems/s",
        flush=True,
    )


def main():
    print("device:", jax.devices()[0], flush=True)
    for arg in sys.argv[1:]:
        parts = arg.split(":")
        t0 = time.time()
        try:
            if parts[0] == "msm":
                probe_msm(int(parts[1]), int(parts[2]) if len(parts) > 2 else None)
            elif parts[0] in ("ntt_mxu", "ntt_scan"):
                probe_ntt(parts[0].split("_")[1], int(parts[1]))
            else:
                print("unknown section", arg)
        except Exception as e:  # noqa: BLE001
            print(f"{arg}: ERROR {type(e).__name__}: {e}", flush=True)
        print(f"[{arg}] total {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
