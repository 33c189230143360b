"""Device mesh plumbing for the sharded prover pipeline.

The reference has no distributed layer at all (SURVEY.md §2: single
process, single machine); multi-chip scaling here follows the
BASELINE.json configs — polynomial coefficients and MSM points are
partitioned across chips over a named 1-D mesh, with XLA collectives
(all_to_all for NTT transposes, all_gather + local fold for EC bucket
reduction) riding ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (SHARD_AXIS,))


def shard_last(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the last axis over the mesh, replicate the rest."""
    spec = [None] * (ndim - 1) + [SHARD_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
