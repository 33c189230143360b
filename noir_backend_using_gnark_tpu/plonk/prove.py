"""PLONK prover (device compute pipeline).

Our replacement for gnark's ``plonk.Prove`` — the part of the reference
that is ~99% of prove time (SURVEY.md §3.1 hot loop (b)). Every
polynomial-sized operation runs on the TPU: wire gathering, NTTs/coset
NTTs, the permutation grand product (parallel prefix scan + batched
inversion), quotient construction, and all KZG commitments/openings
(Pippenger MSMs). Host work is O(1): transcript hashing and a handful
of scalar field ops.

Protocol: vanilla PLONK (GWC19) with 3 wires, *expanded openings* —
selectors and sigmas are opened at zeta so the verifier evaluates the
full identity numerically (no linearization poly). See
plonk/keys.py for the proof layout and transcript.py for Fiat-Shamir.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ProvingError
from ..kzg import kzg
from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt as N
from ..ops import poly as P
from ..ops import scan_utils
from ..utils import bigint, metrics, sanitize
from .keys import Proof, ProvingKey, ZETA_OPENING_LABELS
from .setup import K1, K2
from .transcript import Transcript

FR = F.FR
R = bigint.FR_MODULUS

#: Cached jax platform ("tpu"/"cpu"), resolved on first prover use.
_PLATFORM = None

#: Coset shift for the 4n quotient-evaluation domain.
QUOTIENT_SHIFT = bigint.FR_MULTIPLICATIVE_GENERATOR


def _sparse_poly(length: int, entries: dict) -> jax.Array:
    """Mostly-zero coefficient array with a few host-int entries
    (Montgomery form) — used to add blinding multiples of Z_H."""
    arr = np.zeros((F.NUM_LIMBS, length), np.uint32)
    r_mont = 1 << 256
    for idx, val in entries.items():
        limbs = bigint.int_to_limbs(val % R * r_mont % R)
        for i, l in enumerate(limbs):
            arr[i, idx] = l
    return jnp.asarray(arr)


@functools.partial(jax.jit, static_argnames=("k",))
def _blind_apply(coeffs: jax.Array, sparse: jax.Array, k: int) -> jax.Array:
    """Zero-pad by k and add the sparse blinding poly — ONE dispatch
    (the eager pad was its own ~13 ms relay dispatch per call)."""
    pad = ((0, 0),) * (coeffs.ndim - 1) + ((0, k),)
    return F.add(jnp.pad(coeffs, pad), sparse, FR)


def _blind(coeffs: jax.Array, n: int, blinds: list) -> jax.Array:
    """coeffs (16, n) + (sum_i blinds[i] X^i) * (X^n - 1), len n+len(b)."""
    k = len(blinds)
    entries = {}
    for i, b in enumerate(blinds):
        entries[i] = (entries.get(i, 0) - b) % R
        entries[n + i] = (entries.get(n + i, 0) + b) % R
    return _blind_apply(coeffs, _sparse_poly(n + k, entries), k)


def _blind_batch(coeffs: jax.Array, n: int, blinds: list) -> jax.Array:
    """Batched :func:`_blind`: coeffs (16, K, n) + per-poly blinding
    in ONE pad + ONE add dispatch (the per-wire calls were 6 relay
    round-trips)."""
    k = len(blinds[0])
    npolys = len(blinds)
    arr = np.zeros((F.NUM_LIMBS, npolys, n + k), np.uint32)
    r_mont = 1 << 256
    for pi, bl in enumerate(blinds):
        entries: dict = {}
        for i, b in enumerate(bl):
            entries[i] = (entries.get(i, 0) - b) % R
            entries[n + i] = (entries.get(n + i, 0) + b) % R
        for idx, val in entries.items():
            for li, limb in enumerate(bigint.int_to_limbs(val % R * r_mont % R)):
                arr[li, pi, idx] = limb
    return _blind_apply(coeffs, jnp.asarray(arr), k)


def _bcast_col(scalar_d: jax.Array, like: jax.Array) -> jax.Array:
    """(16, 1) scalar limb array -> broadcast to ``like``'s shape."""
    return jnp.broadcast_to(
        scalar_d.reshape((16,) + (1,) * (like.ndim - 1)), like.shape
    )


@jax.jit
def _z_evals_kernel(wa_e, wb_e, wc_e, xs, s1e, s2e, s3e, bg):
    """Round 2's whole elementwise chain — ONE dispatch (each un-jitted
    field op is a separate ~0.1-0.3 s round-trip on the relay host, and
    this chain had ~12 of them). ``bg``: (16, 4) bundled device scalars
    [beta, gamma, k1, k2] — one upload instead of four."""
    beta_d, gamma_d = bg[:, 0:1], bg[:, 1:2]
    k1_d, k2_d = bg[:, 2:3], bg[:, 3:4]
    n = wa_e.shape[-1]
    gamma_col = _bcast_col(gamma_d, wa_e)

    def lin(w_e, ids):
        return F.add(F.add(w_e, P.scale_poly(ids, beta_d), FR), gamma_col, FR)

    num = F.mont_mul(
        F.mont_mul(lin(wa_e, xs), lin(wb_e, P.scale_poly(xs, k1_d)), FR),
        lin(wc_e, P.scale_poly(xs, k2_d)),
        FR,
    )
    den = F.mont_mul(
        F.mont_mul(lin(wa_e, s1e), lin(wb_e, s2e), FR), lin(wc_e, s3e), FR
    )
    ratio = F.mont_mul(num, F.batch_inv(den, FR), FR)
    prefix = scan_utils.rolled_scan(lambda a, b: F.mont_mul(a, b, FR), ratio)
    one = F.one_mont(FR, (1,))
    return jnp.concatenate([one, prefix[:, : n - 1]], axis=1)


@functools.partial(jax.jit, static_argnames=("n",))
def _quotient_kernel(ev4, x_pows4, bg, ch, n: int):
    """Round 3's full coset-evaluation algebra (gate + permutation +
    L1 terms, gnark sign convention) — ONE dispatch from the stacked
    coset evaluations to t4 = numerator * Z_H^{-1}. ``bg``: (16, 4)
    [beta, gamma, k1, k2]; ``ch``: (16, 7) [alpha, alpha^2, shift,
    zh_pat0..3] — bundled uploads."""
    beta_d, gamma_d = bg[:, 0:1], bg[:, 1:2]
    k1_d, k2_d = bg[:, 2:3], bg[:, 3:4]
    alpha_d, alpha2_d, shift_d = ch[:, 0:1], ch[:, 1:2], ch[:, 2:3]
    zh_pat_d = ch[:, 3:7]
    (
        a4, b4, c4, z4, ql4, qr4, qo4, qm4, qc4, s14, s24, s34, pi4, l04,
    ) = (ev4[:, i] for i in range(14))
    zw4 = jnp.roll(z4, -4, axis=1)  # z(omega*x) on the coset (omega = w4^4)
    big_n = a4.shape[-1]
    xs4 = P.scale_poly(x_pows4, shift_d)
    gamma4 = _bcast_col(gamma_d, a4)

    def lin4(w4_, ids4):
        return F.add(F.add(w4_, P.scale_poly(ids4, beta_d), FR), gamma4, FR)

    gate = F.add(
        F.add(
            F.add(F.mont_mul(ql4, a4, FR), F.mont_mul(qr4, b4, FR), FR),
            F.add(
                F.mont_mul(qo4, c4, FR),
                F.mont_mul(qm4, F.mont_mul(a4, b4, FR), FR),
                FR,
            ),
            FR,
        ),
        F.add(qc4, pi4, FR),
        FR,
    )
    perm_pos = F.mont_mul(
        F.mont_mul(
            F.mont_mul(lin4(a4, xs4), lin4(b4, P.scale_poly(xs4, k1_d)), FR),
            lin4(c4, P.scale_poly(xs4, k2_d)),
            FR,
        ),
        z4,
        FR,
    )
    perm_neg = F.mont_mul(
        F.mont_mul(
            F.mont_mul(lin4(a4, s14), lin4(b4, s24), FR), lin4(c4, s34), FR
        ),
        zw4,
        FR,
    )
    one4 = F.one_mont(FR, (big_n,))
    l1term = P.scale_poly(F.mont_mul(l04, F.sub(z4, one4, FR), FR), alpha2_d)
    # gnark v0.8 sign convention: + alpha*(Z(wX)*g - Z(X)*f).
    numer = F.add(
        gate,
        F.add(P.scale_poly(F.sub(perm_neg, perm_pos, FR), alpha_d), l1term, FR),
        FR,
    )
    zh_inv4 = jnp.tile(zh_pat_d, (1, n))  # period-4 Z_H^{-1} pattern
    return F.mont_mul(numer, zh_inv4, FR)


def _gather_wires(assignment: jax.Array, idx: np.ndarray) -> jax.Array:
    return jnp.take(assignment, jnp.asarray(idx), axis=1)


@functools.partial(jax.jit, static_argnames=("big_n",))
def _stack_pad_kernel(polys: tuple, big_n: int) -> jax.Array:
    """Zero-pad K polynomials to big_n and stack on axis 1 — ONE
    dispatch (the eager per-poly pads were ~13 ms relay dispatches
    each; round 3 stacks 14 of them)."""
    return jnp.stack(
        [jnp.pad(p, ((0, 0), (0, big_n - p.shape[1]))) for p in polys], axis=1
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def _split3_kernel(t_c: jax.Array, chunk: int):
    """The three quotient chunks in one dispatch."""
    return (
        t_c[:, :chunk],
        t_c[:, chunk : 2 * chunk],
        t_c[:, 2 * chunk : 3 * chunk],
    )


@jax.jit
def _evals_pack_kernel(polys: tuple, zz: jax.Array, z_poly: jax.Array):
    """All zeta openings + z(omega*zeta) as ONE dispatch returning one
    (16, P+1) array: stack/pad the polynomials in-trace, one batched
    Horner, plus the shifted evaluation — the eager eval_many path cost
    a dispatch per pad/slice (~13 ms each on the relay host)."""
    z, zw = zz[:, 0:1], zz[:, 1:2]
    n = max(p.shape[-1] for p in polys)
    stacked = jnp.stack(
        [jnp.pad(p, ((0, 0), (0, n - p.shape[-1]))) for p in polys], axis=1
    )
    evals = P.horner_states(stacked, z)[:, :, 0]  # (16, P)
    zwv = P.horner_states(z_poly, zw)[:, :1]
    return jnp.concatenate([evals, zwv], axis=1)


@jax.jit
def _open_quotients_kernel(polys: tuple, weights: jax.Array, zz: jax.Array, z_poly: jax.Array):
    """Round 5's device tail in ONE dispatch: fold the opened
    polynomials with the challenge powers, divide by (X - zeta) and
    (X - zeta*omega). Returns the two quotient coefficient arrays
    (inputs to the stacked commit kernel — no readback in between)."""
    z, zw = zz[:, 0:1], zz[:, 1:2]
    n = max(p.shape[-1] for p in polys)
    stacked = jnp.stack(
        [jnp.pad(p, ((0, 0), (0, n - p.shape[-1]))) for p in polys], axis=1
    )
    folded = P._lincomb_stacked(stacked, weights)
    q_fold = P.horner_states(folded, z)[:, 1:]
    q_zw = P.horner_states(z_poly, zw)[:, 1:]
    return q_fold, q_zw


class _TransformOps:
    """NTT/commit dispatch: single-chip kernels, or the sharded
    four-step NTT + distributed Pippenger when a mesh is supplied.

    The distributed paths compute the *same* natural-order results as
    the single-chip kernels, so proof bytes are identical for a given
    blinding seed regardless of the mesh (tested in
    tests/test_parallel.py). Transforms whose size does not split over
    the mesh (n < D^2) transparently fall back to single-chip.
    """

    def __init__(self, mesh=None):
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import dist_ntt  # noqa: PLC0415

            self._dn = dist_ntt
            self._n_dev = mesh.devices.size

    def _dist_ok(self, n: int) -> bool:
        return self.mesh is not None and self._dn.can_distribute(n, self._n_dev)

    @staticmethod
    def _mxu_ok(n: int) -> bool:
        """Route single-chip transforms through the MXU four-step
        kernel on TPU (ops/mxu_ntt). Both kernels compute the exact
        same field elements, so proof bytes are path-independent
        (tests/test_mxu_ntt.py). NOIRTPU_NTT_IMPL=scan|mxu overrides.

        Routing is backed by round-5 clean-memory v5e measurements
        (warm, M elems/s, mxu vs scan): 2^16 1.90 vs 1.66, 2^18 1.92
        vs 0.98, 2^20 1.12 vs 0.63, 2^22 0.57 vs ~0.3 — the MXU path
        wins at every size in its 256..2^24 support range. (The r4
        bench reading that showed scan ahead at 2^20 was a
        memory-pressure artifact: the NTT was timed with the 2^22
        MSM's ~1.5 GB still resident; bench.py now orders NTT sections
        first and records warm AND cold times.)"""
        mode = os.environ.get("NOIRTPU_NTT_IMPL", "auto")
        if mode == "scan":
            return False
        if n < 256 or n > (1 << 24):  # two-level four-step limit
            return False
        if mode == "mxu":
            return True
        global _PLATFORM
        if _PLATFORM is None:
            try:
                _PLATFORM = jax.devices()[0].platform
            except Exception:  # noqa: BLE001
                _PLATFORM = "unknown"
        return _PLATFORM == "tpu"

    def intt(self, evals: jax.Array, domain: N.Domain) -> jax.Array:
        # Device-dispatch counter: mesh and single-chip proves must
        # issue the SAME number of transform/commit dispatches (the
        # round-2 mesh path silently unstacked batched transforms into
        # per-column dispatches; tests/test_parallel.py asserts
        # equality via these counters).
        metrics.count("prove.dispatch.transform")
        if self._dist_ok(evals.shape[-1]):
            # four_step transforms along the last axis with any batch
            # axes in the middle — batched polys stay ONE dispatch.
            return self._dn.four_step(evals, self.mesh, inverse=True)
        if self._mxu_ok(evals.shape[-1]):
            from ..ops import mxu_ntt  # noqa: PLC0415

            return mxu_ntt.ntt_mxu(evals, inverse=True)
        return N.intt(evals, domain)

    def coset_ntt(self, coeffs: jax.Array, shift: int, domain: N.Domain) -> jax.Array:
        metrics.count("prove.dispatch.transform")
        n = coeffs.shape[-1]
        if self._dist_ok(n):
            scaled = N._scale_vec(coeffs, N._CosetScale.get(shift, n, False))
            return self._dn.four_step(scaled, self.mesh)
        if self._mxu_ok(n):
            from ..ops import mxu_ntt  # noqa: PLC0415

            scaled = N._scale_vec(coeffs, N._CosetScale.get(shift, n, False))
            return mxu_ntt.ntt_mxu(scaled)
        return N.coset_ntt(coeffs, shift, domain)

    def coset_intt(self, evals: jax.Array, shift: int, domain: N.Domain) -> jax.Array:
        metrics.count("prove.dispatch.transform")
        n = evals.shape[-1]
        if self._dist_ok(n):
            coeffs = self._dn.four_step(evals, self.mesh, inverse=True)
            return N._scale_vec(coeffs, N._CosetScale.get(shift, n, True))
        if self._mxu_ok(n):
            from ..ops import mxu_ntt  # noqa: PLC0415

            coeffs = mxu_ntt.ntt_mxu(evals, inverse=True)
            return N._scale_vec(coeffs, N._CosetScale.get(shift, n, True))
        return N.coset_intt(evals, shift, domain)

    def commit(self, srs, coeffs: jax.Array):
        metrics.count("prove.dispatch.commit")
        return kzg.commit_ints(srs, coeffs, mesh=self.mesh)

    def commit_many(self, srs, coeff_list: list) -> list:
        """K commitments, ONE blocking readback (kzg.commit_many_ints).
        Counted as K commit dispatches to keep the mesh/single-chip
        dispatch-parity assertions meaningful."""
        metrics.count("prove.dispatch.commit", len(coeff_list))
        return kzg.commit_many_ints(srs, coeff_list, mesh=self.mesh)


def _coset_evals(coeffs: jax.Array, big_n: int, domain4: N.Domain, ops: _TransformOps) -> jax.Array:
    padded = jnp.pad(coeffs, ((0, 0), (0, big_n - coeffs.shape[1])))
    return ops.coset_ntt(padded, QUOTIENT_SHIFT, domain4)


def prove(
    pk: ProvingKey,
    assignment_ints: list,
    rng_seed: bytes | None = None,
    mesh=None,
    protocol: str = "expanded",
):
    """Generate a PLONK proof for the cs-variable assignment.

    ``assignment_ints``: host ints, publics first (lowering order).
    ``rng_seed``: optional 32-byte seed for deterministic blinding
    (None = os.urandom — fresh randomness per proof, like gnark's
    randomized prover; BASELINE.md bit-exactness caveat).
    ``mesh``: optional jax.sharding.Mesh — shards every NTT (four-step
    all_to_all decomposition) and every KZG commitment MSM (distributed
    bucket accumulation) across the mesh devices. Proof bytes match the
    single-chip path for the same seed.
    ``protocol``: "expanded" (our 15-opening layout, keys.Proof) or
    "gnark" (gnark v0.8 linearized openings + gnark transcript,
    formats.gnark.GnarkProof — see plonk/gnark_protocol.py).
    """
    with metrics.phase("plonk.prove"), metrics.profiler_trace("prove"):
        metrics.count("prove.calls")
        metrics.gauge("prove.domain_n", pk.n)
        return _prove_impl(
            pk, assignment_ints, rng_seed, _TransformOps(mesh), protocol
        )


def _prove_impl(
    pk: ProvingKey,
    assignment_ints: list,
    rng_seed: bytes | None,
    ops: _TransformOps,
    protocol: str = "expanded",
):
    n = pk.n
    domain = N.Domain.get(n)
    big_n = 4 * n
    domain4 = N.Domain.get(big_n)
    omega = domain.w_int

    if len(assignment_ints) != pk.nb_vars:
        raise ProvingError(
            f"assignment length {len(assignment_ints)} != nb_vars {pk.nb_vars}"
        )
    publics = [v % R for v in assignment_ints[: pk.nb_public]]

    seed = rng_seed if rng_seed is not None else os.urandom(32)
    blind_state = [seed, 0]

    def draw_blind():
        import hashlib

        blind_state[1] += 1
        return (
            int.from_bytes(
                hashlib.sha256(blind_state[0] + blind_state[1].to_bytes(4, "big")).digest(),
                "big",
            )
            % R
        )

    assignment = F.from_ints(assignment_ints, FR)

    # ---- Round 1: wire polynomials ------------------------------------
    # One gather + ONE batched INTT for all three wires (dispatch
    # latency on the relay host makes per-poly calls expensive).
    wires_idx = np.stack([pk.wire_a, pk.wire_b, pk.wire_c])  # (3, n)
    wires_e = jnp.take(assignment, jnp.asarray(wires_idx), axis=1)  # (16, 3, n)
    wa_e, wb_e, wc_e = wires_e[:, 0], wires_e[:, 1], wires_e[:, 2]

    with metrics.phase("round1.wires"):
        wires_c = ops.intt(wires_e, domain)  # (16, 3, n)
        # Same draw order as the former per-wire calls (a1,a2,b1,...),
        # so proof bytes for a given seed are unchanged.
        wires_b = _blind_batch(
            wires_c, n, [[draw_blind(), draw_blind()] for _ in range(3)]
        )
        a_c, b_c, c_c = wires_b[:, 0], wires_b[:, 1], wires_b[:, 2]

        com_a, com_b, com_c = ops.commit_many(pk.srs, [a_c, b_c, c_c])
    sanitize.check_field(wires_b, R, "prove.round1.wires")

    if protocol == "gnark":
        from . import gnark_protocol as GP

        if pk.vk is None:
            raise ProvingError("gnark protocol requires pk.vk (public data binding)")
        ts = None
        gts = GP.GnarkTranscript(("gamma", "beta", "alpha", "zeta"))
        GP.bind_public_data(gts, "gamma", pk.vk, publics)
        # gnark order: gamma FIRST (bound to public data + LRO), then
        # beta chained with no extra bindings (bn254/plonk prove.go).
        gamma = GP.derive_randomness(gts, "gamma", (com_a, com_b, com_c))
        beta = GP.derive_randomness(gts, "beta")
    elif protocol == "expanded":
        if pk.vk is None:
            raise ProvingError("expanded protocol requires pk.vk (vk binding)")
        ts = Transcript("noirtpu-plonk-v2")
        ts.absorb(b"n", pk.n.to_bytes(8, "big"))
        # Bind the circuit: selector + sigma commitment digests (the
        # gnark transcript does this via bindPublicData; v1 omitted it
        # — challenges did not commit to the vk).
        for label, pt in zip(
            (b"vk_ql", b"vk_qr", b"vk_qo", b"vk_qm", b"vk_qc",
             b"vk_s1", b"vk_s2", b"vk_s3"),
            pk.vk.commitment_list(),
        ):
            ts.absorb_point(label, pt)
        for p in publics:
            ts.absorb_felt(b"public", p)
        ts.absorb_point(b"a", com_a)
        ts.absorb_point(b"b", com_b)
        ts.absorb_point(b"c", com_c)
        beta = ts.challenge(b"beta")
        gamma = ts.challenge(b"gamma")
    else:
        raise ProvingError(f"unknown proof protocol {protocol!r}")

    # ---- Round 2: permutation grand product ---------------------------
    xs = domain.x_powers()  # omega^i (host-generated, cached)
    bg = F.from_ints([beta, gamma, K1, K2], FR)  # one bundled upload
    with metrics.phase("round2.grand_product"):
        z_evals = _z_evals_kernel(
            wa_e, wb_e, wc_e, xs,
            pk.s1_evals, pk.s2_evals, pk.s3_evals,
            bg,
        )
        z_c = _blind(
            ops.intt(z_evals, domain), n, [draw_blind(), draw_blind(), draw_blind()]
        )
        # Through commit_many even for K=1: same packed single-readback
        # path (and the Pallas window join on TPU).
        (com_z,) = ops.commit_many(pk.srs, [z_c])
    sanitize.check_field(z_c, R, "prove.round2.z")
    if protocol == "gnark":
        alpha = GP.derive_randomness(gts, "alpha", (com_z,))
    else:
        ts.absorb_point(b"z", com_z)
        alpha = ts.challenge(b"alpha")

    # ---- Round 3: quotient --------------------------------------------
    # PI polynomial: +pub_i at row i, else 0 (gnark's completed-qk
    # contribution — the qL=-1 placeholder rows carry -pub_i, setup.py).
    pi_evals = F.from_ints(
        [p % R for p in publics] + [0] * (n - len(publics)), FR
    )
    pi_c = ops.intt(pi_evals, domain)

    # L0 = (1/n) * sum X^j.
    n_inv = pow(n, -1, R)
    l0_c = F.from_ints([n_inv] * n, FR)

    # ALL 15 coset transforms as ONE batched dispatch: zero-pad each
    # coefficient vector to 4n, stack on axis 1, one coset NTT.
    coset_in = (
        a_c, b_c, c_c, z_c,
        pk.ql, pk.qr, pk.qo, pk.qm, pk.qc,
        pk.s1, pk.s2, pk.s3,
        pi_c, l0_c,
    )
    stacked = _stack_pad_kernel(coset_in, big_n)  # (16, 14, 4n)
    ev4 = ops.coset_ntt(stacked, QUOTIENT_SHIFT, domain4)

    # Z_H^{-1} on the coset (period-4 pattern, host scalars).
    g_n = pow(QUOTIENT_SHIFT, n, R)
    i4 = pow(domain4.w_int, n, R)
    zh_pat = []
    for j in range(4):
        v = (g_n * pow(i4, j, R) - 1) % R
        if v == 0:
            raise ProvingError("quotient coset intersects the domain")
        zh_pat.append(pow(v, -1, R))

    ch = F.from_ints(
        [alpha, alpha * alpha % R, QUOTIENT_SHIFT] + zh_pat, FR
    )  # one bundled upload
    t4 = _quotient_kernel(ev4, domain4.x_powers(), bg, ch, n=n)
    t_c = ops.coset_intt(t4, QUOTIENT_SHIFT, domain4)  # degree <= 2n+4

    chunk = n + 2
    t0_c, t1_c, t2_c = _split3_kernel(t_c, chunk)
    with metrics.phase("round3.quotient"):
        com_t0, com_t1, com_t2 = ops.commit_many(pk.srs, [t0_c, t1_c, t2_c])
    sanitize.check_field(t_c, R, "prove.round3.quotient")
    if protocol == "gnark":
        zeta = GP.derive_randomness(gts, "zeta", (com_t0, com_t1, com_t2))
        with metrics.phase("round45.gnark_openings"):
            return GP.finish_prove(
                pk,
                ops,
                publics,
                beta,
                gamma,
                alpha,
                zeta,
                com_a,
                com_b,
                com_c,
                com_z,
                (com_t0, com_t1, com_t2),
                a_c,
                b_c,
                c_c,
                z_c,
                (t0_c, t1_c, t2_c),
            )
    ts.absorb_point(b"t0", com_t0)
    ts.absorb_point(b"t1", com_t1)
    ts.absorb_point(b"t2", com_t2)
    zeta = ts.challenge(b"zeta")

    # ---- Round 4: evaluations -----------------------------------------
    zz = F.from_ints([zeta, zeta * omega % R], FR)  # one bundled upload

    opened = {
        "a": a_c,
        "b": b_c,
        "c": c_c,
        "z": z_c,
        "s1": pk.s1,
        "s2": pk.s2,
        "s3": pk.s3,
        "ql": pk.ql,
        "qr": pk.qr,
        "qo": pk.qo,
        "qm": pk.qm,
        "qc": pk.qc,
        "t0": t0_c,
        "t1": t1_c,
        "t2": t2_c,
    }
    polys = [opened[k] for k in ZETA_OPENING_LABELS]
    with metrics.phase("round4.evals"):
        # ONE dispatch for all 15 zeta openings + z(zeta*omega), ONE
        # host transfer for all 16 values (previously: eager pads and
        # per-poly slices at ~13 ms each plus per-value readbacks).
        all_vals = F.to_ints(_evals_pack_kernel(tuple(polys), zz, z_c), FR)
        evals, z_omega_val = all_vals[:-1], all_vals[-1]

    for label, v in zip(ZETA_OPENING_LABELS, evals):
        ts.absorb_felt(label.encode(), v)
    ts.absorb_felt(b"z_omega", z_omega_val)
    nu = ts.challenge(b"nu")

    # ---- Round 5: opening proofs --------------------------------------
    with metrics.phase("round5.open"):
        # ONE device dispatch builds both opening quotients, one more
        # commits them, one readback returns both points (kzg.
        # batch_open_at re-evaluated every polynomial and read every
        # value back — round 4 already produced them).
        weights = F.from_ints(
            [pow(nu, i, R) for i in range(len(polys))], FR
        ).reshape(16, len(polys), 1)
        q_fold, q_zw = _open_quotients_kernel(tuple(polys), weights, zz, z_c)
        w_zeta, w_zeta_omega = ops.commit_many(pk.srs, [q_fold, q_zw])

    return Proof(
        a=com_a,
        b=com_b,
        c=com_c,
        z=com_z,
        t0=com_t0,
        t1=com_t1,
        t2=com_t2,
        evals=evals,
        z_omega=z_omega_val,
        w_zeta=w_zeta,
        w_zeta_omega=w_zeta_omega,
    )
