"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: BN254 Pippenger MSM throughput (points/s) at the largest
power-of-two size that completes within the time budget, on whatever
accelerator the ambient JAX platform provides (TPU under axon; CPU as
fallback).

vs_baseline normalizes against 1e6 points/s — the documented ballpark
of gnark v0.8's CPU Pippenger (~1 us/point/core; the reference
publishes no numbers, BASELINE.md) — so vs_baseline > 1 means faster
than the reference's engine on its own headline op.

Un-killable by design (round 1 lost its only TPU datapoint to a
timeout): a SIGALRM fires at NOIRTPU_BENCH_BUDGET seconds (default
420) and prints whatever has finished; sizes escalate 2^12 -> 2^20
only while budget remains; every section is individually guarded.
Sub-results (NTT throughput, end-to-end proof latency) go in
"details".
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
import traceback

BASELINE_MSM_POINTS_PER_SEC = 1.0e6

T_START = time.time()
DETAILS: dict = {}
STATE = {"msm_value": None, "msm_size": None, "emitted": False}


def emit_and_exit(code: int = 0):
    if STATE["emitted"]:
        os._exit(code)
    STATE["emitted"] = True
    DETAILS["total_bench_sec"] = round(time.time() - T_START, 1)
    if STATE["msm_value"] is None:
        result = {
            "metric": "bn254_msm_points_per_sec",
            "value": 0.0,
            "unit": "points/s",
            "vs_baseline": 0.0,
            "details": DETAILS,
        }
    else:
        result = {
            "metric": f"bn254_msm_2e{STATE['msm_size']}_points_per_sec",
            "value": round(STATE["msm_value"]),
            "unit": "points/s",
            "vs_baseline": round(STATE["msm_value"] / BASELINE_MSM_POINTS_PER_SEC, 4),
            "details": DETAILS,
        }
    print(json.dumps(result), flush=True)
    # os._exit: do not wait on runtime teardown / pending device work.
    os._exit(code)


def _alarm(signum, frame):  # noqa: ARG001
    DETAILS["timed_out"] = True
    emit_and_exit(0)


def remaining() -> float:
    return BUDGET - (time.time() - T_START)


BUDGET = float(os.environ.get("NOIRTPU_BENCH_BUDGET", "420"))
signal.signal(signal.SIGALRM, _alarm)
# The driver runs bench.py under `timeout` (SIGTERM, then SIGKILL):
# round 1's only TPU datapoint died as rc=124 with no JSON. Trap
# SIGTERM/SIGINT so whatever has finished is ALWAYS printed.
signal.signal(signal.SIGTERM, _alarm)
signal.signal(signal.SIGINT, _alarm)
signal.alarm(max(5, int(BUDGET)))


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from noir_backend_using_gnark_tpu.utils.runtime import setup_jax

    setup_jax()

    DETAILS["platform"] = jax.devices()[0].platform
    DETAILS["device"] = str(jax.devices()[0])

    from noir_backend_using_gnark_tpu.ops import curve as C
    from noir_backend_using_gnark_tpu.ops import field as F
    from noir_backend_using_gnark_tpu.ops import msm as M
    from noir_backend_using_gnark_tpu.ops import ntt as N

    rng = np.random.RandomState(7)

    def rand_fr_limbs(n):
        """Uniform-ish scalars as (16, n) canonical limb arrays, built
        directly in numpy (top limb truncated to keep < r)."""
        arr = rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32)
        arr[15] &= 0x2FFF  # < 2^254 < r (conservative truncation)
        return jax.numpy.asarray(arr)

    # ---------------- Field throughput (cheap, always lands) ------------
    try:
        n = 1 << 20
        a = rand_fr_limbs(n)
        out = F.mont_mul(a, a, F.FR)
        jax.block_until_ready(out)
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            out = F.mont_mul(out, a, F.FR)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        DETAILS["fr_mul_2e20_per_sec"] = round(n / dt)
    except Exception as e:  # noqa: BLE001
        DETAILS["fr_mul_error"] = f"{type(e).__name__}: {e}"

    # ---------------- NTT throughput ------------------------------------
    max_ntt = int(os.environ.get("NOIRTPU_BENCH_NTT_LOG2", "20"))
    for log2 in (12, 16, 18, 20, 22):
        if log2 > max_ntt:
            break
        # a cold compile of the fused kernel can take ~1-2 min via the
        # relay; only escalate while there is headroom.
        if remaining() < 120:
            DETAILS["ntt_stopped_early_at"] = log2
            break
        try:
            n = 1 << log2
            coeffs = F.from_mont(rand_fr_limbs(n), F.FR)
            dom = N.Domain.get(n)
            out = N.ntt(coeffs, dom)
            jax.block_until_ready(out)  # compile + warm
            reps = 5
            t0 = time.time()
            for _ in range(reps):
                out = N.ntt(out, dom)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / reps
            DETAILS[f"ntt_2e{log2}_sec"] = round(dt, 5)
            DETAILS[f"ntt_2e{log2}_elems_per_sec"] = round(n / dt)
        except Exception as e:  # noqa: BLE001
            DETAILS[f"ntt_2e{log2}_error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
            break

    # ---------------- MSM throughput (headline) -------------------------
    max_msm = int(os.environ.get("NOIRTPU_BENCH_MSM_LOG2", "20"))

    # Synthetic distinct base points (k*G), tiled to the MSM size: point
    # *generation* is not what's being measured.
    base_n = 1 << 12
    tx, ty = C.generator_powers_table(64)
    ks = F.from_ints(range(1, base_n + 1), F.FR, to_mont=False)
    pts_jac = C.fixed_base_mul(tx, ty, ks)
    bx, by, binf = C.to_affine(pts_jac)
    jax.block_until_ready(bx)

    for log2 in (12, 16, 18, 20, 22):
        if log2 > max_msm:
            break
        if remaining() < 150:
            DETAILS["msm_stopped_early_at"] = log2
            break
        try:
            n = 1 << log2
            reps_tile = max(1, n // base_n)
            px = jnp.tile(bx, (1, reps_tile))[:, :n]
            py = jnp.tile(by, (1, reps_tile))[:, :n]
            pinf = jnp.tile(binf, (reps_tile,))[:n]
            points = M.AffineBatch(px, py, pinf)
            scalars = rand_fr_limbs(n)
            out = M.msm(points, scalars)
            jax.block_until_ready(out)  # compile + warm
            t0 = time.time()
            out = M.msm(points, scalars)
            jax.block_until_ready(out)
            dt = time.time() - t0
            DETAILS[f"msm_2e{log2}_sec"] = round(dt, 4)
            STATE["msm_value"] = n / dt
            STATE["msm_size"] = log2
        except Exception as e:  # noqa: BLE001
            DETAILS[f"msm_2e{log2}_error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
            break

    # ---------------- End-to-end proof -----------------------------------
    if remaining() > 90:
        try:
            from noir_backend_using_gnark_tpu.acir import lowering, parse, solver
            from noir_backend_using_gnark_tpu.kzg import kzg
            from noir_backend_using_gnark_tpu.plonk import prove as pp
            from noir_backend_using_gnark_tpu.plonk import setup as ps
            from noir_backend_using_gnark_tpu.plonk import verify as pv

            fix = os.path.join(
                os.path.dirname(__file__), "tests/fixtures/acir_x_neq_y.json"
            )
            circuit = parse.parse_circuit(open(fix).read())
            witness = solver.solve(circuit, {1: 0, 2: 1})
            values = solver.dense_values(circuit, witness)
            pc = lowering.lower_to_plonk(circuit)
            srs = kzg.generate_srs(32, 424242)
            pk, vk = ps.setup(pc, srs)
            assignment = lowering.build_assignment(pc, values)
            proof = pp.prove(pk, assignment, rng_seed=b"\x01" * 32)  # warm
            t0 = time.time()
            proof = pp.prove(pk, assignment, rng_seed=b"\x02" * 32)
            dt = time.time() - t0
            publics = [values[i - 1] for i in pc.public_witness_indices]
            ok = pv.verify(vk, proof, publics)
            DETAILS["plonk_prove_sec_toy"] = round(dt, 4)
            DETAILS["plonk_verify_ok"] = bool(ok)
        except Exception as e:  # noqa: BLE001
            DETAILS["plonk_error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
    else:
        DETAILS["plonk_skipped_budget"] = True

    emit_and_exit(0)
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001
        DETAILS["fatal"] = f"{type(e).__name__}: {e}"
        traceback.print_exc(file=sys.stderr)
        emit_and_exit(0)
