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
from .errors import BackendError, ProvingError
from .plonk import prove as plonk_prove
from .plonk import setup as plonk_setup
from .plonk import verify as plonk_verify
from .utils import bigint, metrics
from .utils.retry import retry_transient

R = bigint.FR_MODULUS


class Backend:
    """The TPU proving backend (reference: ``struct Gnark``, backend.rs:20)."""

    def __init__(self, config: Config | None = None):
        self.config = (config or DEFAULT).validate()
        self._srs = None
        self._mesh = None
        self._g16_seed = None

    def mesh(self):
        """Device mesh from ``config.mesh_shape`` (None for single chip).

        The reference has no distributed layer (SURVEY §2 end); this is
        the BASELINE.json multi-chip path: prover NTTs ride the sharded
        four-step transform and commitment MSMs the distributed
        Pippenger when the mesh has >1 device.
        """
        n_dev = 1
        for s in self.config.mesh_shape:
            n_dev *= int(s)
        if n_dev <= 1:
            return None
        if self._mesh is None:
            from .parallel.mesh import make_mesh

            self._mesh = make_mesh(n_dev)
        return self._mesh

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

    def _groth16_seed(self) -> bytes:
        """Stable per-Backend trusted-setup seed.

        Mirrors the reference's per-machine SRS semantics
        (common.go:127-144: random alpha, cached — keys only match
        within the same cache): repeated preprocess/verify_from_cs
        calls on one Backend derive the same toxic waste, so keys and
        proofs interoperate; different Backends (without an explicit
        ``prover_seed``) do not.
        """
        if self.config.prover_seed is not None:
            return self.config.prover_seed
        if self._g16_seed is None:
            import os

            self._g16_seed = os.urandom(32)
        return self._g16_seed

    # -- the 4 proving operations ---------------------------------------

    def _require_bn254(self, op: str) -> None:
        """Proving needs the G1/pairing engine, which is bn254-only —
        faithfully matching the reference, whose bls12_381 feature has
        no Go-side counterpart (main.go:16-21 imports only bn254; see
        config.Config.validate). Fr-level ops (codecs, witness math)
        work for either curve."""
        if self.config.curve != "bn254":
            raise BackendError(
                f"{op}: proving is bn254-only (curve={self.config.curve!r}; "
                "the reference's bls12_381 feature is felt-codec-only too)"
            )

    def preprocess(self, circuit: model.Circuit) -> tuple[bytes, bytes]:
        """ACIR -> (pk bytes, vk bytes) (backend.rs:81-83).

        Unlike the reference — which sends a vector of *random* values
        along (plonk/mod.rs:196; only the shape matters to gnark) — the
        lowering here needs no values at all. ``config.scheme`` selects
        PLONK or Groth16, mirroring the reference's cargo feature pair
        (Cargo.toml:32-37; its groth16 externs were never linkable,
        SURVEY §2.9 — ours dispatch for real).
        """
        self._require_bn254("preprocess")
        with metrics.phase("preprocess"):
            if self.config.scheme == "groth16":
                from .groth16 import groth16

                r1cs = groth16.build_r1cs(circuit)
                metrics.count("constraints", r1cs.num_constraints)
                pk, vk = groth16.setup(r1cs, self._groth16_seed())
                return (
                    artifacts.groth16_pk_to_bytes(pk),
                    artifacts.groth16_vk_to_bytes(vk),
                )
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
        self._require_bn254("prove_with_pk")
        with metrics.phase("prove_with_pk"):
            if self.config.scheme == "groth16":
                from .groth16 import groth16

                g16pk = artifacts.groth16_pk_from_bytes(proving_key)
                # With a fixed config.prover_seed a retry after a
                # compile-relay transport cut reproduces the same proof
                # bytes; with seed=None each attempt draws fresh
                # blinding (still a valid proof). Either way a retried
                # attempt re-enters the phase timers, so treat per-phase
                # wall-clock as inflated whenever retry.* counters > 0.
                proof = retry_transient(
                    lambda: groth16.prove(
                        g16pk,
                        [v % R for v in values],
                        self.config.prover_seed,
                        mesh=self.mesh(),
                    ),
                    "groth16.prove",
                )
                return artifacts.groth16_proof_to_bytes(proof)
            pc = lowering.lower_to_plonk(circuit)
            pk = artifacts.pk_from_bytes(proving_key)
            pk.srs = self._srs_for(pk.n)
            fp = getattr(pk, "srs_fingerprint", None)
            if fp and fp != bytes(8) and fp != artifacts.srs_digest(pk.srs):
                raise ProvingError(
                    "proving key was built against a different SRS than the "
                    "one loaded (srs fingerprint mismatch) — regenerate keys "
                    "or point --srs-path at the original cache"
                )
            assignment = lowering.build_assignment(pc, [v % R for v in values])
            # Same caveats as the groth16 branch above: byte-identical
            # retries only under a fixed prover_seed, and retry.* > 0
            # means the metrics phase timers double-counted an attempt.
            proof = retry_transient(
                lambda: plonk_prove.prove(
                    pk,
                    assignment,
                    self.config.prover_seed,
                    mesh=self.mesh(),
                    protocol=self.config.proof_format,
                ),
                "plonk.prove",
            )
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
        self._require_bn254("verify_with_vk")
        with metrics.phase("verify_with_vk"):
            pc = lowering.lower_to_plonk(circuit)
            publics = self._extract_publics(pc, public_inputs)
            if self.config.scheme == "groth16":
                from .groth16 import groth16

                g16vk = artifacts.groth16_vk_from_bytes(verification_key)
                try:
                    p16 = artifacts.groth16_proof_from_bytes(proof)
                except Exception:
                    return False
                return groth16.verify(g16vk, p16, publics)
            vk = artifacts.vk_from_bytes(verification_key)
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
        _, vk_bytes = self.preprocess(circuit)
        return self.verify_with_vk(proof, public_inputs, circuit, vk_bytes)

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
        """Extract the public values in lowering order.

        The acvm calling convention (backend.rs:24-33) passes a *dense*
        values vector indexed by 1-based witness; that interpretation
        is tried first whenever the vector is long enough to cover the
        highest public witness, so it always wins when both readings
        are possible (round-1 review: the direct-list fallback used to
        shadow it when ``len(values) == nb_public``). A bare list of
        exactly the public values is accepted only as the fallback.
        """
        max_wit = max(pc.public_witness_indices, default=0)
        if len(public_inputs) >= max_wit:
            return [public_inputs[w - 1] % R for w in pc.public_witness_indices]
        if len(public_inputs) == len(pc.public_witness_indices):
            return [v % R for v in public_inputs]
        raise ProvingError(
            f"values vector of length {len(public_inputs)} covers neither the "
            f"highest public witness index {max_wit} nor the public count "
            f"{len(pc.public_witness_indices)}"
        )
