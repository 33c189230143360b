"""noir_backend_using_gnark_tpu — a TPU-native Noir proving backend.

A from-scratch reimplementation of the capabilities of
lambdaclass/noir_backend_using_gnark with the entire cryptographic
engine (gnark's PLONK/KZG/MSM/NTT over BN254) rebuilt as JAX/XLA/Pallas
kernels for TPU, plus a host-side witness solver, ACIR toolchain, CLI
and artifact store.

Quick start::

    import noir_backend_using_gnark_tpu as nbt

    circuit = nbt.parse_circuit(open("circuit.acir.json").read())
    backend = nbt.Backend()
    witness = backend.solve(circuit, {1: 0, 2: 1})
    values = nbt.dense_values(circuit, witness)
    pk, vk = backend.preprocess(circuit)
    proof = backend.prove_with_pk(circuit, values, pk)
    assert backend.verify_with_vk(proof, values, circuit, vk)
"""

from .acir.model import (  # noqa: F401
    ArithmeticOpcode,
    BlackBoxFunc,
    BlackBoxFuncCall,
    Circuit,
    Directive,
    FunctionInput,
    MulTerm,
    SimpleTerm,
)
from .acir.parse import circuit_to_json, parse_circuit  # noqa: F401
from .acir.solver import dense_values, solve  # noqa: F401
from .api import Backend  # noqa: F401
from .config import Config  # noqa: F401
from . import errors  # noqa: F401

__version__ = "0.1.0"
