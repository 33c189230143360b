"""Test configuration: CPU backend, 8 virtual devices, fusion disabled.

Environment subtleties this file works around:

  * some hosts import jax at interpreter start (via sitecustomize, to
    register an accelerator plugin), so by
    the time pytest runs, XLA_FLAGS has already been consumed by
    jaxlib. Env-var edits from here would be silently ignored —
    therefore the process RE-EXECS itself once with the corrected
    environment;
  * the re-exec must happen with pytest's fd-level capture *suspended*,
    otherwise the new process inherits pytest's temp-file stdout and
    all test output vanishes;
  * XLA's CPU fusion pass is quadratic in graph size for our
    big-integer limb arithmetic (a 16-mul chain: 81s with fusion, 5s
    without), so CPU test compiles run with the fusion passes disabled;
  * this box's jaxlib CPU pipeline sporadically dies (SIGSEGV/SIGABRT
    inside ``backend_compile_and_load``) in LONG pytest processes that
    perform many compiles — observed only while compiling, never while
    running cached executables. The persistent compile cache is the
    mitigation: a crashed run still caches everything it compiled, so
    re-running converges to an all-cache-hit green pass. If a run
    aborts mid-suite, simply re-run it (or use ``pytest -n 2`` via the
    installed xdist to restart crashed workers).

Tests always run on CPU with 8 virtual devices so the multi-chip
sharding paths (parallel/) are exercised without TPU hardware and
results are bit-deterministic.
"""

import os
import random
import faulthandler
import signal
import sys

import numpy as np
import pytest

# `kill -USR1 <pid>` dumps all thread stacks — for diagnosing stalls on
# this 2-core box (e.g. hung remote compiles) without a debugger.
faulthandler.register(signal.SIGUSR1, all_threads=True)

_REQUIRED_FLAGS = (
    "--xla_force_host_platform_device_count=8",
    "--xla_disable_hlo_passes=fusion,cpu-fusion",
)


def _env_ok() -> bool:
    flags = os.environ.get("XLA_FLAGS", "")
    if any(f.split("=")[0] not in flags for f in _REQUIRED_FLAGS):
        return False
    return os.environ.get("JAX_PLATFORMS") == "cpu"


def _pytest_args() -> list:
    """The args after the pytest entry point in the original argv."""
    argv = list(sys.orig_argv)
    if len(argv) >= 3 and argv[1] == "-m" and argv[2] == "pytest":
        return argv[3:]
    if len(argv) >= 2 and os.path.basename(argv[1]).startswith("pytest"):
        return argv[2:]
    return argv[1:]


def _should_shard(pytest_args) -> bool:
    """Whole-suite runs are re-exec'd into tests/_sharded_runner (one
    pytest subprocess per file): this box's jaxlib sporadically
    segfaults once ONE process has compiled/cache-loaded ~50+ XLA
    modules, which a full-suite process always does. Per-file children
    stay below the horizon; the persistent compile cache keeps total
    cost unchanged. NOIRTPU_SHARD=0 opts out."""
    if os.environ.get("NOIRTPU_SHARDED") or os.environ.get("NOIRTPU_SHARD") == "0":
        return False
    if any(a.startswith("--collect") or a == "--co" for a in pytest_args):
        return False
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        import _sharded_runner as sr
    finally:
        sys.path.pop(0)
    _, paths = sr.split_args(pytest_args)
    n_files = 0
    for p in paths or [os.path.dirname(__file__)]:
        if os.path.isdir(p):
            import glob

            n_files += len(glob.glob(os.path.join(p, "test_*.py")))
        else:
            n_files += 1
    return n_files > 3


def pytest_configure(config):
    args = _pytest_args()
    if _should_shard(args):
        flags = os.environ.get("XLA_FLAGS", "")
        missing = [f for f in _REQUIRED_FLAGS if f.split("=")[0] not in flags]
        os.environ["XLA_FLAGS"] = " ".join([flags] + missing).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["NOIRTPU_CONFTEST_REEXEC"] = "1"
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        runner = os.path.join(os.path.dirname(__file__), "_sharded_runner.py")
        os.execv(sys.executable, [sys.executable, runner, *args])
    if os.environ.get("NOIRTPU_CONFTEST_REEXEC") or _env_ok():
        _configure_jax()
        return
    flags = os.environ.get("XLA_FLAGS", "")
    missing = [f for f in _REQUIRED_FLAGS if f.split("=")[0] not in flags]
    os.environ["XLA_FLAGS"] = " ".join([flags] + missing).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["NOIRTPU_CONFTEST_REEXEC"] = "1"
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    # sys.orig_argv preserves the exact original command line
    # (including "-m pytest"), unlike sys.argv.
    os.execv(sys.executable, list(sys.orig_argv))


def _configure_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the limb-arithmetic graphs are big
    # (a mont_mul traces to ~300 HLO ops, a curve add to ~2.5k) and
    # dominate first-run test wall-clock; cache across invocations.
    cache_dir = os.environ.get("NOIRTPU_JAX_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Keep cache keys independent of the cache-dir path (see
    # utils/runtime.py: the GPU-only XLA side caches embed the path
    # in compile_options, which is hashed into the key).
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(1234)
