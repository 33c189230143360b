"""Multi-host (jax.distributed / DCN) initialization path.

The fast test covers the no-op guards; the slow test boots a REAL
2-process ``jax.distributed`` cluster over localhost CPU (each process
with 2 virtual devices -> a 4-device global mesh) and runs a sharded
collective across it — the closest this single-chip box can get to
BASELINE.md's multi-host row (the methodology limit is documented in
parallel/multihost.py).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from noir_backend_using_gnark_tpu.parallel import multihost


def test_init_single_process_is_noop():
    multihost.init(num_processes=1)
    assert not multihost.is_initialized()


def test_init_without_launcher_env_is_noop(monkeypatch):
    for k in (
        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
        "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
        "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
    ):
        monkeypatch.delenv(k, raising=False)
    multihost.init()
    assert not multihost.is_initialized()


_WORKER = textwrap.dedent(
    """
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from noir_backend_using_gnark_tpu.parallel import mesh as mesh_mod
    from noir_backend_using_gnark_tpu.parallel import multihost

    addr, pid = sys.argv[1], int(sys.argv[2])
    multihost.init(coordinator_address=addr, num_processes=2, process_id=pid)
    assert multihost.is_initialized()
    p_id, n_proc, n_local, n_global = multihost.process_info()
    assert (p_id, n_proc) == (pid, 2)
    assert n_global == 2 * n_local

    # A global computation across BOTH processes' devices: psum over
    # the full mesh (pmap over local devices, axis spans globally).
    local = jnp.arange(n_local, dtype=jnp.float32) + 10.0 * p_id
    out = jax.pmap(
        lambda x: jax.lax.psum(x, "i"), axis_name="i"
    )(local.reshape(n_local, 1))
    expect = sum(
        float(d) + 10.0 * (p // n_local)
        for p, d in [(i, i % n_local) for i in range(n_global)]
    )
    np.testing.assert_allclose(np.asarray(out)[0, 0], expect)
    print(f"worker {pid}: global devices {n_global}, psum ok", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    """Boot a 2-process jax.distributed cluster on localhost CPU and
    run a cross-process psum."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=repo_root
        + (os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""),
    )
    env.pop("NOIRTPU_SHARD", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "psum ok" in out
