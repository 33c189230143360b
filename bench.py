"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: BN254 Pippenger MSM throughput (points/s) at the largest
power-of-two size that completes within the time budget, on whatever
accelerator the ambient JAX platform provides (TPU under axon; CPU as
fallback).

vs_baseline normalizes against 1e6 points/s — the documented ballpark
of gnark v0.8's CPU Pippenger (~1 us/point/core; the reference
publishes no numbers, BASELINE.md) — so vs_baseline > 1 means faster
than the reference's engine on its own headline op.

Un-killable by design. Round 1 lost its TPU datapoint to a timeout and
round 2's first attempt showed why a SIGALRM guard is not enough: the
alarm handler cannot run while the interpreter is inside a native XLA
compile (which is exactly where a budget overrun happens). So the
budget is enforced by a SUPERVISOR process:

  * `python bench.py` = supervisor: spawns `bench.py --worker` in its
    own process group, polls a partials file the worker appends one
    JSON line to after every completed section, and at budget (or on
    SIGTERM/SIGINT from the driver, or on worker exit) emits the final
    JSON assembled from whatever sections landed, then kills the
    worker's process group. The supervisor does no JAX work — nothing
    can wedge it.
  * `--worker`: runs sections most-valuable-first (MSM headline ->
    NTT -> field -> end-to-end prove), checks its own soft deadline
    between sections, and relies on the persistent compilation cache
    (utils/runtime.setup_jax) so repeated invocations escalate further.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

BASELINE_MSM_POINTS_PER_SEC = 1.0e6
BUDGET = float(os.environ.get("NOIRTPU_BENCH_BUDGET", "420"))


# ---------------------------------------------------------------------------
# Supervisor
# ---------------------------------------------------------------------------


def supervise() -> int:
    t_start = time.time()
    fd, partials_path = tempfile.mkstemp(prefix="noirtpu_bench_", suffix=".jsonl")
    os.close(fd)
    env = dict(os.environ, NOIRTPU_BENCH_PARTIALS=partials_path)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        env=env,
        start_new_session=True,
        stdout=sys.stderr,
        stderr=sys.stderr,
    )

    interrupted = {"flag": False}

    def on_term(signum, frame):  # noqa: ARG001
        interrupted["flag"] = True

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    # Reserve a slice of the budget for teardown + emission.
    deadline = t_start + max(10.0, BUDGET - 5.0)
    while time.time() < deadline and not interrupted["flag"]:
        if child.poll() is not None:
            break
        time.sleep(0.5)

    details: dict = {}
    try:
        with open(partials_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        details.update(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass

    if child.poll() is None:
        details["timed_out"] = True
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass

    details["total_bench_sec"] = round(time.time() - t_start, 1)
    msm_value = details.pop("_msm_value", None)
    msm_size = details.pop("_msm_size", None)
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
    print(json.dumps(result), flush=True)
    try:
        os.unlink(partials_path)
    except OSError:
        pass
    return 0


# ---------------------------------------------------------------------------
# Worker
# ---------------------------------------------------------------------------


T_START = time.time()


def remaining() -> float:
    return BUDGET - (time.time() - T_START)


def emit_partial(**kv):
    path = os.environ.get("NOIRTPU_BENCH_PARTIALS")
    line = json.dumps(kv)
    if path:
        with open(path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())
    print("partial:", line, file=sys.stderr, flush=True)


def work() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

    import traceback

    import jax
    import jax.numpy as jnp
    import numpy as np

    from noir_backend_using_gnark_tpu.utils.runtime import setup_jax

    setup_jax()

    emit_partial(platform=jax.devices()[0].platform, device=str(jax.devices()[0]))

    from noir_backend_using_gnark_tpu.ops import curve as C
    from noir_backend_using_gnark_tpu.ops import field as F
    from noir_backend_using_gnark_tpu.ops import msm as M
    from noir_backend_using_gnark_tpu.ops import ntt as N

    rng = np.random.RandomState(7)

    def sync(x):
        """Force real completion: under the axon relay,
        jax.block_until_ready returns at remote-enqueue time, so all
        timings MUST be closed by a dependent host readback."""
        return np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]

    def rand_fr_limbs(n):
        """Uniform-ish scalars as (16, n) canonical limb arrays, built
        directly in numpy (top limb truncated to keep < r)."""
        arr = rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32)
        arr[15] &= 0x2FFF  # < 2^254 < r (conservative truncation)
        return jax.numpy.asarray(arr)

    # ---------------- MSM throughput (headline, runs FIRST) -------------
    max_msm = int(os.environ.get("NOIRTPU_BENCH_MSM_LOG2", "20"))

    # Synthetic distinct base points (k*G), tiled to the MSM size: point
    # *generation* is not what's being measured.
    base_n = 1 << 12
    tx, ty = C.generator_powers_table(64)
    ks = F.from_ints(range(1, base_n + 1), F.FR, to_mont=False)
    pts_jac = C.fixed_base_mul(tx, ty, ks)
    bx, by, binf = C.to_affine(pts_jac)
    sync(bx)
    emit_partial(msm_base_setup_sec=round(time.time() - T_START, 1))

    for log2 in (12, 16, 18, 20, 22):
        if log2 > max_msm:
            break
        if remaining() < 30:
            emit_partial(msm_stopped_early_at=log2)
            break
        try:
            n = 1 << log2
            reps_tile = max(1, n // base_n)
            px = jnp.tile(bx, (1, reps_tile))[:, :n]
            py = jnp.tile(by, (1, reps_tile))[:, :n]
            pinf = jnp.tile(binf, (reps_tile,))[:n]
            points = M.AffineBatch(px, py, pinf)
            scalars = rand_fr_limbs(n)
            t0 = time.time()
            out = M.msm(points, scalars)
            sync(out)  # compile + warm
            compile_sec = time.time() - t0
            t0 = time.time()
            out = M.msm(points, scalars)
            sync(out)
            dt = time.time() - t0
            emit_partial(
                **{
                    f"msm_2e{log2}_sec": round(dt, 4),
                    f"msm_2e{log2}_compile_sec": round(compile_sec, 1),
                    "_msm_value": n / dt,
                    "_msm_size": log2,
                }
            )
        except Exception as e:  # noqa: BLE001
            emit_partial(**{f"msm_2e{log2}_error": f"{type(e).__name__}: {e}"})
            traceback.print_exc(file=sys.stderr)
            break

    # ---------------- NTT throughput ------------------------------------
    max_ntt = int(os.environ.get("NOIRTPU_BENCH_NTT_LOG2", "22"))
    for log2 in (12, 16, 18, 20, 22):
        if log2 > max_ntt:
            break
        if remaining() < 20:
            emit_partial(ntt_stopped_early_at=log2)
            break
        try:
            n = 1 << log2
            coeffs = F.from_mont(rand_fr_limbs(n), F.FR)
            dom = N.Domain.get(n)
            out = N.ntt(coeffs, dom)
            sync(out)  # compile + warm
            reps = 5
            t0 = time.time()
            for _ in range(reps):
                out = N.ntt(out, dom)
            sync(out)
            dt = (time.time() - t0) / reps
            emit_partial(
                **{
                    f"ntt_2e{log2}_sec": round(dt, 5),
                    f"ntt_2e{log2}_elems_per_sec": round(n / dt),
                }
            )
        except Exception as e:  # noqa: BLE001
            emit_partial(**{f"ntt_2e{log2}_error": f"{type(e).__name__}: {e}"})
            traceback.print_exc(file=sys.stderr)
            break

    # ---------------- Field throughput (cheap) --------------------------
    if remaining() > 10:
        try:
            n = 1 << 20
            a = rand_fr_limbs(n)
            out = F.mont_mul(a, a, F.FR)
            sync(out)
            reps = 10
            t0 = time.time()
            for _ in range(reps):
                out = F.mont_mul(out, a, F.FR)
            sync(out)
            dt = (time.time() - t0) / reps
            emit_partial(fr_mul_2e20_per_sec=round(n / dt))
        except Exception as e:  # noqa: BLE001
            emit_partial(fr_mul_error=f"{type(e).__name__}: {e}")

    # ---------------- End-to-end proof -----------------------------------
    if remaining() > 30:
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
            emit_partial(plonk_prove_sec_toy=round(dt, 4), plonk_verify_ok=bool(ok))
        except Exception as e:  # noqa: BLE001
            emit_partial(plonk_error=f"{type(e).__name__}: {e}")
            traceback.print_exc(file=sys.stderr)
    else:
        emit_partial(plonk_skipped_budget=True)

    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        try:
            raise SystemExit(work())
        except SystemExit:
            raise
        except BaseException as e:  # noqa: BLE001
            emit_partial(fatal=f"{type(e).__name__}: {e}")
            import traceback

            traceback.print_exc(file=sys.stderr)
            raise SystemExit(0)
    else:
        raise SystemExit(supervise())
