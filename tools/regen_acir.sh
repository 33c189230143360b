#!/usr/bin/env bash
# Regenerate / cross-check the committed ACIR fixtures from the Noir sources.
#
# Each tests/programs/<name>/ package carries:
#   src/main.nr + Nargo.toml   — the Noir source (copied verbatim from the
#                                reference suite, tests/test_programs/<name>;
#                                reference driver: tests/tests.rs:88-120)
#   circuit.acir.json          — the acvm-serde ACIR this repo's suite proves
#                                (hand-reconstructed where no compiler was
#                                available; see PROVENANCE notes per package)
#
# This script needs the lambdaclass nargo fork (acvm 0.5 era) on PATH —
# install exactly as the reference Makefile does (Makefile:24-25):
#
#   cargo install --force --git https://github.com/lambdaclass/noir --branch fork nargo
#
# For every package it runs `nargo compile` and diffs the compiler's ACIR
# against the committed circuit.acir.json, so any machine with the fork can
# audit the reconstructions (gate counts, directive placement, witness
# numbering). It never overwrites fixtures unless --write is passed.
set -euo pipefail

cd "$(dirname "$0")/../tests/programs"
WRITE=0
[ "${1:-}" = "--write" ] && WRITE=1

command -v nargo >/dev/null || {
    echo "error: nargo not on PATH — install the lambdaclass fork:" >&2
    echo "  cargo install --force --git https://github.com/lambdaclass/noir --branch fork nargo" >&2
    exit 1
}

fail=0
for dir in */; do
    name="${dir%/}"
    [ -f "$name/src/main.nr" ] || {
        echo "[skip] $name: no Noir source (repo-local extra program)"
        continue
    }
    echo "[compile] $name"
    (cd "$name" && nargo compile --witness-name main main >/dev/null)
    built="$name/target/main.acir.json"
    [ -f "$built" ] || built="$name/target/main.json"
    if [ ! -f "$built" ]; then
        echo "  !! nargo produced no ACIR artifact under $name/target" >&2
        fail=1
        continue
    fi
    if [ "$WRITE" = 1 ]; then
        python3 -m json.tool "$built" >"$name/circuit.acir.json"
        echo "  wrote $name/circuit.acir.json"
    elif ! python3 - "$built" "$name/circuit.acir.json" <<'EOF'
import json, sys
a = json.load(open(sys.argv[1])); b = json.load(open(sys.argv[2]))
sys.exit(0 if a == b else 1)
EOF
    then
        echo "  !! $name: committed ACIR differs from nargo output" >&2
        fail=1
    else
        echo "  ok (matches committed fixture)"
    fi
done
exit $fail
