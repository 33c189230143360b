"""AOT kernel artifact store: persist *lowered* kernels across processes.

JAX's persistent compilation cache starts at the compiled-executable
layer — it does nothing for tracing + lowering, and the big Pallas
kernels here are expensive to lower: the 2^22 MSM bucket kernel traces
to a ~9 MB StableHLO module, ~60-130 s of host work per process
(measured round 5; the XLA compile behind it is only ~24 s and IS
cached). ``jax.export`` gives a serializable lowered artifact, so a
cold process pays deserialize (~0 s) + executable-cache load (~2 s)
instead of a full retrace: 158 s -> 1.8 s for the 2^22 MSM, measured
on a v5e.

Artifacts are keyed by kernel name, arg signature (shape/dtype),
static config, jax version, platform/device kind, and a fingerprint of
the source modules that define the kernel — any code change invalidates
the artifact and the next call re-exports. Storage lives next to the
persistent compile cache (``<cache>/exported/``).

This mirrors what the reference achieves with ahead-of-time compiled
Go/CUDA binaries (gnark's prover is a compiled artifact; our kernels
otherwise re-lower per process): see
/root/reference/gnark_backend_ffi/main.go:1-40 for the compiled-FFI
deployment shape this replaces.

Opt out with ``NOIRTPU_AOT=0`` (falls back to plain jit dispatch).
"""

from __future__ import annotations

import functools
import hashlib
import os
from typing import Any, Callable

#: In-process memo: key -> callable (jitted exp.call or jitted fn).
_LOADED: dict[str, Callable] = {}
_FINGERPRINTS: dict[tuple, str] = {}
_REGISTERED = False


def enabled() -> bool:
    return os.environ.get("NOIRTPU_AOT", "1") != "0"


def _register_pytrees() -> None:
    """Register custom pytree output types for jax.export serialization."""
    global _REGISTERED
    if _REGISTERED:
        return
    import jax.export as je

    from ..ops import curve as C

    try:
        je.register_namedtuple_serialization(
            C.JacobianPoint, serialized_name="noirtpu.ops.curve.JacobianPoint"
        )
    except ValueError:
        pass  # already registered (re-import under pytest)
    _REGISTERED = True


def _source_fingerprint(modules: tuple[str, ...]) -> str:
    """Hash the source bytes of package modules (dotted suffixes under
    noir_backend_using_gnark_tpu/), so artifacts invalidate on edit."""
    if modules not in _FINGERPRINTS:
        base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for mod in modules:
            path = os.path.join(base, *mod.split(".")) + ".py"
            try:
                with open(path, "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(mod.encode())
        _FINGERPRINTS[modules] = h.hexdigest()[:16]
    return _FINGERPRINTS[modules]


def _artifact_dir() -> str:
    import jax

    cache = jax.config.jax_compilation_cache_dir or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "noirtpu",
        "jax",
    )
    return os.path.join(cache, "exported")


def _sig(args: tuple) -> str:
    import jax

    parts = []
    for a in jax.tree_util.tree_leaves(args):
        parts.append(f"{getattr(a, 'dtype', type(a).__name__)}{getattr(a, 'shape', '')}")
    return ",".join(parts)


def call_aot(
    name: str,
    fn: Callable,
    *args: Any,
    statics: dict[str, Any] | None = None,
    src_modules: tuple[str, ...] = (),
) -> Any:
    """Dispatch ``fn(*args, **statics)`` through the AOT artifact store.

    ``fn`` must be an UNjitted jax-traceable function; ``statics`` are
    python-level config closed over before jit. On an artifact hit the
    call skips tracing entirely; on a miss it exports (one lowering —
    the same cost a plain jit first-call would pay), persists the
    artifact, and runs it. Any export/load failure falls back to plain
    jit so this layer can never break correctness.
    """
    import jax

    statics = statics or {}
    if not enabled() or any(
        isinstance(a, jax.core.Tracer) for a in jax.tree_util.tree_leaves(args)
    ):
        # Inside an enclosing trace (fused prover dispatches) the
        # surrounding jit owns caching; AOT is a top-level concern.
        return jax.jit(functools.partial(fn, **statics))(*args)

    platform = jax.devices()[0].platform
    kind = jax.devices()[0].device_kind.replace(" ", "_")
    fp = _source_fingerprint(src_modules)
    stat = ",".join(f"{k}={v}" for k, v in sorted(statics.items()))
    raw = f"{name}|{jax.__version__}|{platform}|{kind}|{fp}|{stat}|{_sig(args)}"
    key = f"{name}-{hashlib.sha256(raw.encode()).hexdigest()[:24]}"

    cached = _LOADED.get(key)
    if cached is not None:
        return cached(*args)

    _register_pytrees()
    import jax.export as je

    path = os.path.join(_artifact_dir(), key + ".jaxexport")
    jfn = jax.jit(functools.partial(fn, **statics))
    call = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = je.deserialize(f.read())
            call = jax.jit(exp.call)
        except Exception:  # noqa: BLE001 — stale/corrupt artifact
            try:
                os.unlink(path)
            except OSError:
                pass
    if call is None:
        try:
            exp = je.export(jfn)(*args)
            os.makedirs(_artifact_dir(), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
            call = jax.jit(exp.call)
        except Exception:  # noqa: BLE001 — unexportable (e.g. platform quirk)
            call = jfn
    _LOADED[key] = call
    return call(*args)
