"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: BN254 Pippenger MSM throughput (points/s) at the largest
power-of-two size that completes, on whatever accelerator the ambient
JAX platform provides (TPU under axon; CPU as fallback).

vs_baseline normalizes against 1e6 points/s — the documented ballpark
of gnark v0.8's CPU Pippenger (~1 us/point/core; the reference
publishes no numbers, BASELINE.md) — so vs_baseline > 1 means faster
than the reference's engine on its own headline op.

Sub-results (NTT throughput, end-to-end proof latency) go in "details".
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

BASELINE_MSM_POINTS_PER_SEC = 1.0e6


def main() -> int:
    t_start = time.time()
    details = {}
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

    import jax
    import numpy as np

    from noir_backend_using_gnark_tpu.utils.runtime import setup_jax

    setup_jax()

    details["platform"] = jax.devices()[0].platform
    details["device"] = str(jax.devices()[0])

    from noir_backend_using_gnark_tpu.ops import curve as C
    from noir_backend_using_gnark_tpu.ops import field as F
    from noir_backend_using_gnark_tpu.ops import msm as M
    from noir_backend_using_gnark_tpu.ops import ntt as N
    from noir_backend_using_gnark_tpu.utils import hostcurve as H

    rng = np.random.RandomState(7)

    def rand_fr_limbs(n):
        """Uniform-ish scalars as (16, n) canonical limb arrays, built
        directly in numpy (top limb truncated to keep < r)."""
        arr = rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32)
        arr[15] &= 0x2FFF  # < 2^254 < r... (conservative truncation)
        return jax.numpy.asarray(arr)

    # ---------------- NTT throughput ----------------
    ntt_log2 = int(os.environ.get("NOIRTPU_BENCH_NTT_LOG2", "18"))
    try:
        n = 1 << ntt_log2
        coeffs = F.from_mont(rand_fr_limbs(n), F.FR)  # just valid field elems
        dom = N.Domain.get(n)
        out = N.ntt(coeffs, dom)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = N.ntt(coeffs, dom)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        details[f"ntt_2e{ntt_log2}_sec"] = round(dt, 4)
        details[f"ntt_2e{ntt_log2}_elems_per_sec"] = round(n / dt)
    except Exception as e:  # noqa: BLE001
        details["ntt_error"] = f"{type(e).__name__}: {e}"

    # ---------------- MSM throughput (headline) ----------------
    msm_value = None
    msm_size = None
    max_log2 = int(os.environ.get("NOIRTPU_BENCH_MSM_LOG2", "16"))
    for log2 in range(max_log2, 9, -2):
        try:
            n = 1 << log2
            # Synthetic distinct points: k*G for k = 1..n via fixed-base mul.
            tx, ty = C.generator_powers_table(64)
            ks = F.from_ints(range(1, n + 1), F.FR, to_mont=False)
            pts_jac = C.fixed_base_mul(tx, ty, ks)
            ax, ay, inf = C.to_affine(pts_jac)
            points = M.AffineBatch(ax, ay, inf)
            scalars = rand_fr_limbs(n)
            out = M.msm(points, scalars)
            jax.block_until_ready(out)  # compile + warm
            t0 = time.time()
            out = M.msm(points, scalars)
            jax.block_until_ready(out)
            dt = time.time() - t0
            details[f"msm_2e{log2}_sec"] = round(dt, 4)
            msm_value = n / dt
            msm_size = log2
            break
        except Exception as e:  # noqa: BLE001
            details[f"msm_2e{log2}_error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)

    # ---------------- End-to-end proof ----------------
    try:
        from noir_backend_using_gnark_tpu.acir import lowering, parse, solver
        from noir_backend_using_gnark_tpu.kzg import kzg
        from noir_backend_using_gnark_tpu.plonk import prove as pp
        from noir_backend_using_gnark_tpu.plonk import setup as ps
        from noir_backend_using_gnark_tpu.plonk import verify as pv

        fix = os.path.join(os.path.dirname(__file__), "tests/fixtures/acir_x_neq_y.json")
        circuit = parse.parse_circuit(open(fix).read())
        witness = solver.solve(circuit, {1: 0, 2: 1})
        values = solver.dense_values(circuit, witness)
        pc = lowering.lower_to_plonk(circuit)
        srs = kzg.generate_srs(32, 424242)
        pk, vk = ps.setup(pc, srs)
        assignment = lowering.build_assignment(pc, values)
        proof = pp.prove(pk, assignment, rng_seed=b"\x01" * 32)  # warm/compile
        t0 = time.time()
        proof = pp.prove(pk, assignment, rng_seed=b"\x02" * 32)
        dt = time.time() - t0
        publics = [values[i - 1] for i in pc.public_witness_indices]
        ok = pv.verify(vk, proof, publics)
        details["plonk_prove_sec_toy"] = round(dt, 4)
        details["plonk_verify_ok"] = bool(ok)
    except Exception as e:  # noqa: BLE001
        details["plonk_error"] = f"{type(e).__name__}: {e}"
        traceback.print_exc(file=sys.stderr)

    details["total_bench_sec"] = round(time.time() - t_start, 1)

    if msm_value is None:
        result = {
            "metric": "bn254_msm_points_per_sec",
            "value": 0.0,
            "unit": "points/s",
            "vs_baseline": 0.0,
            "details": details,
        }
    else:
        result = {
            "metric": f"bn254_msm_2e{msm_size}_points_per_sec",
            "value": round(msm_value),
            "unit": "points/s",
            "vs_baseline": round(msm_value / BASELINE_MSM_POINTS_PER_SEC, 4),
            "details": details,
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
