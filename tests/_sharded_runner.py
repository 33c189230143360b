"""Grouped pytest sharding for this box's crash-prone jaxlib.

This machine's jaxlib CPU pipeline sporadically segfaults/aborts inside
``backend_compile_and_load`` / compilation-cache deserialization
(observed repeatedly in round 3; never while executing cached code), so
a full single-process ``pytest tests/`` can die mid-suite:
tests/conftest.py re-execs whole-suite invocations into this runner.

Round 4 measurement changed the sharding shape: the dominant WARM cost
is per-process compile-cache deserialization (~1-3 s per XLA module; a
lone groth16 prove test = ~400 s of pure cache loading), so one child
per file re-pays the load of every shared module 17 times. The runner
now launches one child per module-affinity GROUP, runs two groups
concurrently (the remote compile queue is serial either way; execution
overlaps on the 2 cores), and retries a signal-killed group once (the
cache makes retries converge).

Behavior: forwards all non-path pytest args to every child; honors
``-x`` / ``--exitfirst`` by stopping at the first failing group; exit
status is the worst child status. Opt out with NOIRTPU_SHARD=0; force
serial groups with NOIRTPU_SHARD_PAR=1.
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
    groups = group_files(files)
    # Two children at once on this 2-core box: the remote compile
    # service queue is serial either way (concurrent compiles just
    # wait their turn) and execution overlaps. Groups are ordered
    # heaviest-first so the tail isn't one long straggler.
    n_par = max(1, int(os.environ.get("NOIRTPU_SHARD_PAR", "2")))

    worst = 0
    failed = []
    running: list = []  # (group, Popen, retry_count)

    def launch(group, retried=0):
        print(f"[shard] {' '.join(pathlib.Path(f).name for f in group)}", flush=True)
        running.append(
            (
                group,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", *flags, *group], env=env
                ),
                retried,
            )
        )

    def reap(block: bool):
        nonlocal worst
        import time

        while running:
            done = [
                (i, g, p, r)
                for i, (g, p, r) in enumerate(running)
                if p.poll() is not None
            ]
            if done:
                for i, g, p, retried in sorted(done, key=lambda x: -x[0]):
                    running.pop(i)
                    rc = p.returncode
                    if rc in (0, 5):  # 5 = no tests collected (all slow)
                        continue
                    if rc < 0 and retried < 2:
                        # Signal death = this box's sporadic jaxlib
                        # SIGSEGV/SIGABRT during compile/cache load.
                        # Retries converge (everything a crashed child
                        # compiled is already cached).
                        print(f"[shard] retrying after signal {-rc}", flush=True)
                        launch(g, retried=retried + 1)
                        continue
                    worst = worst or rc
                    failed.append((g, rc))
                return
            if not block:
                return
            time.sleep(0.5)

    for group in groups:
        if stop_on_fail and failed:
            break
        while len(running) >= n_par:
            reap(block=True)
            if stop_on_fail and failed:
                break
        if stop_on_fail and failed:
            break
        launch(group)
    while running:
        reap(block=True)
    print(
        f"[shard] {len(groups)} groups, {len(failed)} failed"
        + (f": {[g for g, _ in failed]}" if failed else ""),
        flush=True,
    )
    return worst


#: Module-affinity groups: each child process pays ~1-3 s of
#: compile-cache DESERIALIZATION per XLA module it touches (measured:
#: one groth16 prove test alone = ~400 s of pure cache loading), so
#: files sharing kernel modules must share a process. Groups are
#: balanced for 2-way parallel execution and kept below the ~many-
#: hundreds-of-modules horizon where this box's jaxlib sporadically
#: crashes (the retry in reap() covers the residual risk).
GROUPS = [
    # prover stack (shares NTT/KZG/plonk modules) — the critical path
    ["test_programs.py", "test_plonk.py", "test_gnark_protocol.py",
     "test_gnark_format.py", "test_sanitize.py"],
    # G2/Groth16 stack (shares field+curve2 modules; grouping all four
    # curve files in one child crossed the jaxlib crash horizon)
    ["test_groth16.py", "test_curve2.py"],
    # mesh/sharded stack
    ["test_parallel.py", "test_multihost.py"],
    # G1 curve + MSM
    ["test_curve.py", "test_msm.py"],
    # transforms
    ["test_mxu_ntt.py", "test_ntt.py", "test_field.py"],
    # host-only / sub-second files
    ["test_acir.py", "test_native.py", "test_hostcurve.py",
     "test_metrics.py", "test_gnark_vectors.py"],
]


def group_files(files):
    """Partition the file list into module-affinity groups (GROUPS
    order = heaviest first); unknown files become singleton groups."""
    by_name = {pathlib.Path(f).name: f for f in files}
    out = []
    seen = set()
    for names in GROUPS:
        g = [by_name[n] for n in names if n in by_name]
        seen.update(pathlib.Path(f).name for f in g)
        if g:
            out.append(g)
    for f in files:
        if pathlib.Path(f).name not in seen:
            out.append([f])
    return out


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
