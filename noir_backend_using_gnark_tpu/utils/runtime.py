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

    cache_dir = cache_dir or os.environ.get("NOIRTPU_JAX_CACHE") or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "noirtpu",
        "jax",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # The GPU-only XLA side caches (kernel cache, per-fusion autotune
    # cache) embed the cache-dir PATH in compile_options, which is
    # hashed into the persistent-cache key — so merely relocating the
    # cache directory invalidates every entry (measured: a ~3 min
    # Pallas MSM recompile after a cache move). They do nothing on
    # TPU/CPU; disable them so keys depend only on the computation.
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # noqa: BLE001 — older jax without this flag
        pass
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
