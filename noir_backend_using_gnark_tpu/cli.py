"""noir-tpu CLI: the nargo-verb surface over ACIR program packages.

The reference's integration suite drives a forked ``nargo`` binary with
``check / compile / execute / prove / verify / test / gates``
(tests/tests.rs:101-138). This environment has no Noir compiler, so a
*program package* here is a directory holding the already-compiled
artifact plus the nargo-style TOML files:

    <package>/
      circuit.acir.json   # ACIR (acvm serde JSON — acir/parse.py)
      abi.json            # {param name: witness index or [indices]}
      Prover.toml         # witness inputs by name (nargo format)
      Verifier.toml       # public inputs by name (nargo format)

Artifacts are written under <package>/target/: witness.hex (the
encoded felt vector, reference wire format), proof.hex, pk.hex, vk.hex.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tomllib

from . import artifacts
from .acir import lowering, parse, solver
from .api import Backend
from .config import Config
from .errors import BackendError
from .utils import bigint

R = bigint.FR_MODULUS


def _load_package(pkg: str):
    acir_path = os.path.join(pkg, "circuit.acir.json")
    if not os.path.exists(acir_path):
        raise BackendError(f"no circuit.acir.json in {pkg}")
    circuit = parse.parse_circuit(open(acir_path).read())
    abi = {}
    abi_path = os.path.join(pkg, "abi.json")
    if os.path.exists(abi_path):
        abi = json.load(open(abi_path))
    return circuit, abi


def _parse_value(v) -> int:
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v % R
    if isinstance(v, str):
        return int(v, 0) % R
    raise BackendError(f"cannot interpret TOML value {v!r} as a field element")


def _toml_witness(path: str, abi: dict) -> dict:
    """TOML inputs -> {witness index: value} via the abi name map."""
    if not os.path.exists(path):
        return {}
    doc = tomllib.load(open(path, "rb"))
    out = {}
    for name, value in doc.items():
        indices = abi.get(name, None)
        if indices is None:
            raise BackendError(f"parameter {name!r} not in abi.json")
        if isinstance(indices, int):
            indices = [indices]
        values = value if isinstance(value, list) else [value]
        if len(values) != len(indices):
            raise BackendError(
                f"parameter {name!r}: {len(values)} values for {len(indices)} witnesses"
            )
        for idx, v in zip(indices, values):
            out[int(idx)] = _parse_value(v)
    return out


def _target(pkg: str) -> str:
    d = os.path.join(pkg, "target")
    os.makedirs(d, exist_ok=True)
    return d


def cmd_check(pkg: str, backend: Backend) -> int:
    circuit, abi = _load_package(pkg)
    _toml_witness(os.path.join(pkg, "Prover.toml"), abi)
    print(f"[check] ok: {len(circuit.opcodes)} opcodes, "
          f"{len(circuit.public_inputs)} public inputs")
    return 0


def cmd_compile(pkg: str, backend: Backend) -> int:
    # No Noir compiler in this distribution: validates + stages the ACIR.
    circuit, _ = _load_package(pkg)
    out = os.path.join(_target(pkg), "circuit.acir.json")
    with open(out, "w") as f:
        f.write(parse.circuit_to_json(circuit))
    print(f"[compile] staged {out}")
    return 0


def cmd_gates(pkg: str, backend: Backend) -> int:
    circuit, _ = _load_package(pkg)
    print(f"[gates] exact circuit size: {backend.get_exact_circuit_size(circuit)}")
    return 0


def cmd_execute(pkg: str, backend: Backend) -> int:
    circuit, abi = _load_package(pkg)
    initial = _toml_witness(os.path.join(pkg, "Prover.toml"), abi)
    witness = backend.solve(circuit, initial)
    values = solver.dense_values(circuit, witness)
    out = os.path.join(_target(pkg), "witness.hex")
    with open(out, "w") as f:
        f.write(bigint.encode_felts(values))
    print(f"[execute] solved {len(values)} witnesses -> {out}")
    return 0


def cmd_prove(pkg: str, backend: Backend) -> int:
    circuit, abi = _load_package(pkg)
    initial = _toml_witness(os.path.join(pkg, "Prover.toml"), abi)
    witness = backend.solve(circuit, initial)
    values = solver.dense_values(circuit, witness)
    target = _target(pkg)
    pk_path = os.path.join(target, "pk.hex")
    vk_path = os.path.join(target, "vk.hex")
    if os.path.exists(pk_path) and os.path.exists(vk_path):
        pk = bytes.fromhex(open(pk_path).read())
    else:
        pk, vk = backend.preprocess(circuit)
        with open(pk_path, "w") as f:
            f.write(pk.hex())
        with open(vk_path, "w") as f:
            f.write(vk.hex())
    proof = backend.prove_with_pk(circuit, values, pk)
    out = os.path.join(target, "proof.hex")
    with open(out, "w") as f:
        f.write(proof.hex())
    print(f"[prove] proof -> {out}")
    return 0


def cmd_verify(pkg: str, backend: Backend) -> int:
    circuit, abi = _load_package(pkg)
    target = _target(pkg)
    try:
        proof = bytes.fromhex(open(os.path.join(target, "proof.hex")).read())
        vk = bytes.fromhex(open(os.path.join(target, "vk.hex")).read())
    except ValueError:
        # Corrupt hex is a verification failure, not a crash (the
        # reference maps malformed artifacts to DeserializeProof errors,
        # errors.rs:5-38).
        print("[verify] FAILED (corrupt proof/vk hex)")
        return 1
    verifier_inputs = _toml_witness(os.path.join(pkg, "Verifier.toml"), abi)
    pc = lowering.lower_to_plonk(circuit)
    publics = [verifier_inputs.get(i, 0) for i in pc.public_witness_indices]
    ok = backend.verify_with_vk(proof, publics, circuit, vk)
    print(f"[verify] {'ok' if ok else 'FAILED'}")
    return 0 if ok else 1


def cmd_test(pkg: str, backend: Backend) -> int:
    """Smoke test: execute -> prove -> verify round trip."""
    rc = cmd_execute(pkg, backend)
    rc = rc or cmd_prove(pkg, backend)
    rc = rc or cmd_verify(pkg, backend)
    print(f"[test] {'ok' if rc == 0 else 'FAILED'}")
    return rc


COMMANDS = {
    "check": cmd_check,
    "compile": cmd_compile,
    "execute": cmd_execute,
    "prove": cmd_prove,
    "verify": cmd_verify,
    "gates": cmd_gates,
    "test": cmd_test,
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="noir-tpu",
        description="TPU-native Noir proving backend (nargo-verb compatible)",
    )
    ap.add_argument("command", choices=sorted(COMMANDS))
    ap.add_argument("package", nargs="?", default=".", help="program package dir")
    ap.add_argument("--srs-path", default=None)
    ap.add_argument("--srs-size", type=int, default=None)
    ap.add_argument("--seed", default=None, help="hex seed for deterministic proofs")
    ap.add_argument(
        "--scheme",
        choices=("plonk", "groth16"),
        default="plonk",
        help="proof system (reference cargo features plonk/groth16)",
    )
    ap.add_argument(
        "--mesh",
        type=int,
        default=1,
        metavar="N",
        help="shard the prover over an N-device mesh (NTTs via the "
        "four-step all_to_all transform, commitment MSMs distributed)",
    )
    args = ap.parse_args(argv)

    cfg = Config()
    if args.srs_path:
        cfg.srs_path = args.srs_path
    if args.srs_size:
        cfg.srs_size = args.srs_size
    if args.seed:
        cfg.prover_seed = bytes.fromhex(args.seed)
    cfg.scheme = args.scheme
    if args.mesh > 1:
        cfg.mesh_shape = (args.mesh,)
    from .utils.runtime import setup_jax

    setup_jax()
    backend = Backend(cfg)
    try:
        return COMMANDS[args.command](args.package, backend)
    except BackendError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
