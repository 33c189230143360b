"""Build driver for the native C++ runtime (g++ -> shared library).

The reference builds its native layer as a CGo static archive wired
into cargo (Makefile:5-7, build.rs:14-22). Here the native layer is a
plain C-ABI shared library compiled once on first use and cached next
to the source, keyed by a hash of the source text + compiler flags —
no build step required at install time, no FFI archive dance.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "src", "noirtpu_native.cpp")
_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-fvisibility=default"]


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read() + " ".join(_FLAGS).encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "NOIRTPU_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "noirtpu_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"libnoirtpu_{digest}.so")


def build(force: bool = False) -> str:
    """Compile (or reuse) the shared library; returns its path.

    Raises RuntimeError if no C++ toolchain is available or the compile
    fails — callers fall back to the pure-Python implementations.
    """
    out = _cache_path()
    if not force and os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", *_FLAGS, _SRC, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        raise RuntimeError(f"native build unavailable: {e}") from e
    if proc.returncode != 0:
        raise RuntimeError(f"native build failed:\n{proc.stderr}")
    os.replace(tmp, out)  # atomic under concurrent builders
    return out


if __name__ == "__main__":
    print(build(force=True))
