"""Per-file pytest sharding for this box's crash-prone jaxlib.

This machine's jaxlib CPU pipeline sporadically segfaults/aborts inside
``backend_compile_and_load`` / compilation-cache deserialization once a
single process has compiled-or-loaded ~50+ XLA modules (observed
repeatedly in round 3; never while executing cached code). A full
``pytest tests/`` run crosses that horizon and dies mid-suite, so
tests/conftest.py re-execs whole-suite invocations into this runner,
which executes ONE pytest subprocess per test file — every child stays
far below the crash horizon, and the shared persistent compile cache
(/tmp/noirtpu_jax_cache) keeps the total cost the same as one process.

Behavior: forwards all non-path pytest args to every child; honors
``-x`` / ``--exitfirst`` by stopping at the first failing file; exit
status is the worst child status. Opt out with NOIRTPU_SHARD=0.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

TESTS_DIR = pathlib.Path(__file__).parent


def split_args(argv):
    """Partition pytest argv into (flags, path-ish args)."""
    flags, paths = [], []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-m", "-k", "-p", "--durations", "-o", "-W"):
            flags.extend(argv[i : i + 2])
            i += 2
            continue
        if a.startswith("-"):
            flags.append(a)
        elif os.path.exists(a) or "::" in a:
            paths.append(a)
        else:
            flags.append(a)
        i += 1
    return flags, paths


def main(argv) -> int:
    flags, paths = split_args(argv)
    stop_on_fail = "-x" in flags or "--exitfirst" in flags

    files = []
    for p in paths or [str(TESTS_DIR)]:
        pp = pathlib.Path(p)
        if pp.is_dir():
            files.extend(sorted(str(f) for f in pp.glob("test_*.py")))
        else:
            files.append(p)

    env = dict(os.environ, NOIRTPU_SHARDED="1")
    worst = 0
    failed = []
    for f in files:
        print(f"[shard] {f}", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", *flags, f], env=env
        )
        if rc not in (0, 5):  # 5 = no tests collected (e.g. all slow)
            worst = worst or rc
            failed.append((f, rc))
            if stop_on_fail:
                break
    print(
        f"[shard] {len(files)} files, {len(failed)} failed"
        + (f": {[f for f, _ in failed]}" if failed else ""),
        flush=True,
    )
    return worst


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
