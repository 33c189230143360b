"""Process-level JAX runtime setup shared by the CLI, bench and driver
entry points.

Centralizes the persistent compilation cache: the limb-arithmetic
kernels compile to large XLA graphs and (on this relay host) CPU
compiles can round-trip a remote compile service — caching them on
disk is the difference between a 10-minute and a 10-second CLI
invocation. Tests configure the same cache in tests/conftest.py.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    """Idempotent: enable the persistent compilation cache."""
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "NOIRTPU_JAX_CACHE", "/tmp/noirtpu_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Deterministic cache keys across processes: with tracebacks in
    # HLO locations, the Pallas MSM kernel's module hash differed per
    # process (round-3 observation: two jit_msm_kernel_pallas entries
    # for identical code → every fresh process recompiled ~2-3 min).
    try:
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key", True)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass
    _DONE = True
