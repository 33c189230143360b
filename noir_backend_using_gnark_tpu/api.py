"""Public backend API: the reference's 8-operation surface.

Python entry points mirroring acvm's ``ProofSystemCompiler`` +
``PartialWitnessGenerator`` as implemented by the reference
(src/backend.rs:35-170):

  np_language, black_box_function_supported, get_exact_circuit_size,
  preprocess, prove_with_pk, verify_with_vk, prove_with_meta,
  verify_from_cs, solve_black_box_function_call (witness side).

Everything crosses this boundary as host types (ints, bytes) — the
reference's hex/JSON FFI hop (plonk/mod.rs:59-93) disappears, but the
byte formats of the artifacts are preserved or specified
(artifacts.py).
"""

from __future__ import annotations

from . import artifacts
from .acir import lowering, model, solver
from .config import DEFAULT, Config
from .errors import ProvingError
from .plonk import prove as plonk_prove
from .plonk import setup as plonk_setup
from .plonk import verify as plonk_verify
from .utils import bigint, metrics

R = bigint.FR_MODULUS


class Backend:
    """The TPU proving backend (reference: ``struct Gnark``, backend.rs:20)."""

    def __init__(self, config: Config | None = None):
        self.config = (config or DEFAULT).validate()
        self._srs = None

    # -- introspection ---------------------------------------------------

    def np_language(self) -> dict:
        """PLONKCSat width 3 (backend.rs:36-38)."""
        return {"PLONKCSat": {"width": 3}}

    def black_box_function_supported(self, func: model.BlackBoxFunc) -> bool:
        """The reference's support matrix (backend.rs:40-56)."""
        return model.SUPPORTED_BLACK_BOX.get(func, False)

    def get_exact_circuit_size(self, circuit: model.Circuit) -> int:
        """#opcodes + per-arith (mul_terms + 1) (wrapper mod.rs:56-73)."""
        return circuit.circuit_size()

    # -- SRS -------------------------------------------------------------

    def _srs_for(self, n: int):
        needed = n + 8
        if self._srs is None or self._srs.size < needed:
            size = max(self.config.srs_size, 1)
            while size < needed:
                size *= 2
            self._srs = artifacts.try_load_srs(size, self.config.srs_path)
        return self._srs

    # -- the 4 proving operations ---------------------------------------

    def preprocess(self, circuit: model.Circuit) -> tuple[bytes, bytes]:
        """ACIR -> (pk bytes, vk bytes) (backend.rs:81-83).

        Unlike the reference — which sends a vector of *random* values
        along (plonk/mod.rs:196; only the shape matters to gnark) — the
        lowering here needs no values at all.
        """
        with metrics.phase("preprocess"):
            pc = lowering.lower_to_plonk(circuit)
            metrics.count("constraints", len(pc.q_l))
            srs = self._srs_for(plonk_setup.domain_size_for(pc))
            pk, vk = plonk_setup.setup(pc, srs)
            return artifacts.pk_to_bytes(pk), artifacts.vk_to_bytes(vk)

    def prove_with_pk(
        self, circuit: model.Circuit, values: list, proving_key: bytes
    ) -> bytes:
        """Dense witness values (1-based order, missing = 0 —
        backend.rs:24-33) + pk blob -> proof bytes (backend.rs:85-94)."""
        with metrics.phase("prove_with_pk"):
            pc = lowering.lower_to_plonk(circuit)
            pk = artifacts.pk_from_bytes(proving_key)
            pk.srs = self._srs_for(pk.n)
            assignment = lowering.build_assignment(pc, [v % R for v in values])
            proof = plonk_prove.prove(pk, assignment, self.config.prover_seed)
            return artifacts.proof_to_bytes(proof)

    def verify_with_vk(
        self,
        proof: bytes,
        public_inputs: list,
        circuit: model.Circuit,
        verification_key: bytes,
    ) -> bool:
        """Proof bytes + dense public-input values + vk blob -> bool
        (backend.rs:96-106).

        ``public_inputs`` is the dense values vector with only the
        public witnesses populated (the acvm calling convention); we
        pick out the public positions in lowering order. A direct list
        of exactly the public values (in witness-index order) is also
        accepted.
        """
        with metrics.phase("verify_with_vk"):
            pc = lowering.lower_to_plonk(circuit)
            vk = artifacts.vk_from_bytes(verification_key)
            publics = self._extract_publics(pc, public_inputs)
            try:
                p = artifacts.proof_from_bytes(proof)
            except Exception:
                return False
            return plonk_verify.verify(vk, p, publics)

    def prove_with_meta(self, circuit: model.Circuit, values: list) -> bytes:
        """Setup-and-prove in one call (backend.rs:58-66; the reference's
        Go path for this was never linked — main.go has no
        PlonkProveWithMeta export — ours is real)."""
        pk_bytes, _ = self.preprocess(circuit)
        return self.prove_with_pk(circuit, values, pk_bytes)

    def verify_from_cs(
        self, proof: bytes, public_inputs: list, circuit: model.Circuit
    ) -> bool:
        """Setup-and-verify (backend.rs:68-75; the reference's Go
        PlonkVerifyWithMeta is a hardcoded ``return false`` stub,
        main.go:39-42 — ours verifies)."""
        pc = lowering.lower_to_plonk(circuit)
        srs = self._srs_for(plonk_setup.domain_size_for(pc))
        _, vk = plonk_setup.setup(pc, srs)
        publics = self._extract_publics(pc, public_inputs)
        try:
            p = artifacts.proof_from_bytes(proof)
        except Exception:
            return False
        return plonk_verify.verify(vk, p, publics)

    # -- witness generation ----------------------------------------------

    def solve(self, circuit: model.Circuit, initial_witness: dict) -> dict:
        """Full pwg loop (the reference only implements the black-box
        part, backend.rs:109-170; acvm drives the rest)."""
        return solver.solve(circuit, initial_witness)

    def solve_black_box_function_call(
        self, witness: dict, func_call: model.BlackBoxFuncCall
    ) -> None:
        from .acir import blackbox

        blackbox.solve_black_box(func_call, witness)

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _extract_publics(pc: lowering.PlonkCircuit, public_inputs: list) -> list:
        if len(public_inputs) == len(pc.public_witness_indices):
            return [v % R for v in public_inputs]
        publics = []
        for wit_idx in pc.public_witness_indices:
            if wit_idx - 1 < len(public_inputs):
                publics.append(public_inputs[wit_idx - 1] % R)
            else:
                raise ProvingError(
                    f"public input witness {wit_idx} missing from values vector"
                )
        return publics
