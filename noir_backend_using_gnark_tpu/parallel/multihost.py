"""Multi-host (DCN) initialization for the sharded prover.

The reference is strictly single-process (SURVEY.md §2 end); the
multi-host obligation comes from BASELINE.md config row 5 (2^26
circuits over N>=2 hosts). On TPU pods the runtime story is standard
JAX SPMD: every host runs the SAME program, ``jax.distributed``
wires the hosts together, ``jax.devices()`` then returns the GLOBAL
device list, and the existing 1-D mesh (parallel/mesh.py) simply
spans all hosts — the four-step NTT's ``all_to_all`` and the MSM
bucket ``all_gather`` compile to ICI collectives within a host and
DCN transfers across hosts with no code changes (XLA owns transport;
there is no NCCL/MPI analogue to manage).

Environment note: this repo's dev box has ONE physical chip, so the
multi-host path can only be exercised here as N virtual single-host
processes (see tests/test_multihost.py, which boots a real
2-process ``jax.distributed`` cluster over localhost CPU) — the
>=80%-scaling-at-2^24 BASELINE bar needs a real pod slice.

Usage on a pod (same command on every host):

    from noir_backend_using_gnark_tpu.parallel import multihost, mesh
    multihost.init()                   # env-driven (TPU pods: no args)
    m = mesh.make_mesh()               # spans every chip on every host
    backend = Backend(Config(mesh_shape=(jax.device_count(),)))
"""

from __future__ import annotations

import os

_INITIALIZED = False


def init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, relies on the environment (TPU pod runtimes and
    SLURM/OpenMPI launchers are auto-detected by jax.distributed; the
    standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID variables also work). Explicit arguments win — the
    form the localhost test harness uses.

    Single-process (num_processes == 1 with no coordinator) is a
    no-op: jax works standalone and initializing a 1-process cluster
    would only add a coordinator round-trip to every startup.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    env_np = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0
    )
    if coordinator_address is None and env_np in (0, 1):
        auto = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if not auto and env_np != 0:
            return  # explicit single-process: nothing to do
        if not auto and env_np == 0:
            # No explicit config at all: only initialize when a
            # launcher environment is detectable; plain single-host
            # runs skip (jax.distributed.initialize would block
            # waiting for a coordinator on misconfigured boxes).
            detectable = any(
                k in os.environ
                for k in (
                    "TPU_WORKER_HOSTNAMES",
                    "MEGASCALE_COORDINATOR_ADDRESS",
                    "SLURM_JOB_ID",
                    "OMPI_COMM_WORLD_SIZE",
                )
            )
            if not detectable:
                return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def is_initialized() -> bool:
    return _INITIALIZED


def process_info():
    """(process_id, n_processes, n_local_devices, n_global_devices)."""
    import jax

    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
