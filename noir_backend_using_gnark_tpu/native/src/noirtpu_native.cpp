// noirtpu_native: the C++ runtime layer of the TPU Noir backend.
//
// The reference keeps its circuit runtime in native code — Rust for the
// acvm Backend glue (src/backend.rs) and Go for ACIR handling, witness
// building and codecs (gnark_backend_ffi/acir/*, backend/common.go,
// internal/backend/helpers.go). This library is the TPU framework's
// native equivalent: the host-side hot paths that are NOT TPU compute —
// witness solving (the acvm pwg fixpoint over arithmetic opcodes),
// ACIR->PLONK gate-table lowering (BuildSparseR1CS semantics,
// backend/plonk/sparse_r1cs.go:18-107), gate-satisfaction checking, and
// the big-endian felt wire codec (serialize.rs:10-47 /
// helpers.go:13-33). The TPU compute path (NTT/MSM/KZG/PLONK kernels)
// stays in JAX/XLA — this file feeds it packed arrays.
//
// ABI: plain C functions over packed little-endian 4x64-bit limb felts
// (canonical, not Montgomery) and 32-bit index arrays, so Python binds
// with ctypes + numpy with zero copies.
//
// Build: g++ -O3 -shared -fPIC (see ../build.py). No dependencies
// beyond the C++17 standard library and __uint128_t.

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

extern "C" {

// ---------------------------------------------------------------------------
// BN254 Fr arithmetic: 4x64-bit limbs, Montgomery form internally.
// Constants match gnark-crypto's fr.Element parameterization.
// ---------------------------------------------------------------------------

static const u64 FR_MOD[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                              0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 FR_N0 = 0xc2e1f593efffffffULL;  // -r^{-1} mod 2^64
static const u64 FR_R[4] = {0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL,
                            0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL};
static const u64 FR_R2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                             0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};

struct Fr {
  u64 l[4];
};

static inline bool fr_is_zero(const Fr &a) {
  return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}

static inline bool fr_gte_mod(const Fr &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.l[i] > FR_MOD[i]) return true;
    if (a.l[i] < FR_MOD[i]) return false;
  }
  return true;  // equal
}

static inline void fr_sub_mod_inplace(Fr &a) {
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.l[i] - FR_MOD[i] - borrow;
    a.l[i] = (u64)d;
    borrow = (u64)(d >> 64) & 1;
  }
}

static inline Fr fr_add(const Fr &a, const Fr &b) {
  Fr r;
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.l[i] + b.l[i] + carry;
    r.l[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  // a, b < p < 2^254 so no carry out of 2^256; reduce once if >= p.
  if (carry || fr_gte_mod(r)) fr_sub_mod_inplace(r);
  return r;
}

static inline Fr fr_sub(const Fr &a, const Fr &b) {
  Fr r;
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.l[i] - b.l[i] - borrow;
    r.l[i] = (u64)d;
    borrow = (u64)(d >> 64) & 1;
  }
  if (borrow) {
    u64 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.l[i] + FR_MOD[i] + carry;
      r.l[i] = (u64)s;
      carry = (u64)(s >> 64);
    }
  }
  return r;
}

// CIOS Montgomery multiplication (the same algorithm gnark-crypto
// generates for fr.Element.Mul, re-derived over __uint128_t).
static inline Fr fr_mont_mul(const Fr &a, const Fr &b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    // t += a[i] * b
    u64 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a.l[i] * b.l[j] + t[j] + carry;
      t[j] = (u64)s;
      carry = (u64)(s >> 64);
    }
    u128 s4 = (u128)t[4] + carry;
    t[4] = (u64)s4;
    u64 t5 = (u64)(s4 >> 64);  // < 2, folded into the shift below

    // m = t[0] * n0 mod 2^64 ; t += m * p ; t >>= 64
    u64 m = t[0] * FR_N0;
    u128 s = (u128)m * FR_MOD[0] + t[0];
    carry = (u64)(s >> 64);
    for (int j = 1; j < 4; ++j) {
      s = (u128)m * FR_MOD[j] + t[j] + carry;
      t[j - 1] = (u64)s;
      carry = (u64)(s >> 64);
    }
    s = (u128)t[4] + carry;
    t[3] = (u64)s;
    t[4] = t5 + (u64)(s >> 64);
  }
  Fr r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || fr_gte_mod(r)) fr_sub_mod_inplace(r);
  return r;
}

static inline Fr fr_to_mont(const Fr &a) {
  Fr r2 = {{FR_R2[0], FR_R2[1], FR_R2[2], FR_R2[3]}};
  return fr_mont_mul(a, r2);
}

static inline Fr fr_from_mont(const Fr &a) {
  Fr one = {{1, 0, 0, 0}};
  return fr_mont_mul(a, one);
}

// Fermat inversion a^{p-2} in Montgomery form (0 -> 0). Square-and-
// multiply over the fixed exponent; ~380 muls — plenty fast host-side.
static inline Fr fr_mont_inv(const Fr &a) {
  if (fr_is_zero(a)) return a;
  // exponent = p - 2
  u64 e[4];
  u64 borrow = 0;
  static const u64 TWO[4] = {2, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)FR_MOD[i] - TWO[i] - borrow;
    e[i] = (u64)d;
    borrow = (u64)(d >> 64) & 1;
  }
  Fr result = {{FR_R[0], FR_R[1], FR_R[2], FR_R[3]}};  // 1 in Montgomery
  Fr base = a;
  for (int limb = 0; limb < 4; ++limb) {
    u64 bits = e[limb];
    for (int i = 0; i < 64; ++i) {
      if (bits & 1) result = fr_mont_mul(result, base);
      base = fr_mont_mul(base, base);
      bits >>= 1;
    }
  }
  return result;
}

static inline Fr fr_neg(const Fr &a) {
  if (fr_is_zero(a)) return a;
  Fr p = {{FR_MOD[0], FR_MOD[1], FR_MOD[2], FR_MOD[3]}};
  return fr_sub(p, a);
}

static inline Fr fr_load(const u64 *src) {
  Fr r;
  std::memcpy(r.l, src, 32);
  return r;
}

static inline void fr_store(u64 *dst, const Fr &a) { std::memcpy(dst, a.l, 32); }

// ---------------------------------------------------------------------------
// Witness solver: the acvm pwg fixpoint over arithmetic opcodes.
//
// Packed circuit layout (all felts canonical 4x64 LE limbs):
//   mul terms   : mt_off[n_ops+1]; mt_coeff[(nm)*4]; mt_a[nm]; mt_b[nm]
//   linear terms: lt_off[n_ops+1]; lt_coeff[(nl)*4]; lt_var[nl]
//   constants   : qc[n_ops*4]
// Witness state: values[n_wit*4] (index 0 unused; ACIR witnesses are
// 1-based), known[n_wit] in {0,1}; op_done[n_ops] in {0,1}.
//
// Implements exactly acir/solver.py::_solve_arithmetic: per gate,
// accumulate known terms into the constant, collect net coefficients of
// unknowns; solve when one (nonzero-coefficient) unknown remains; check
// residual when none remain. Unknowns with net coefficient 0 are
// unconstrained. Iterates to a fixed point.
//
// Returns: number of arithmetic opcodes still unsolved (>= 0), or -1 on
// an unsatisfied fully-determined gate (err_op = its index), or -2 if a
// gate references witness index >= n_wit.
// ---------------------------------------------------------------------------

long long noirtpu_solve_arithmetic(
    long long n_ops, const long long *mt_off, const u64 *mt_coeff,
    const uint32_t *mt_a, const uint32_t *mt_b, const long long *lt_off,
    const u64 *lt_coeff, const uint32_t *lt_var, const u64 *qc,
    long long n_wit, u64 *values, uint8_t *known, uint8_t *op_done,
    long long *err_op) {
  // Unknown-term scratch: a gate has at most a handful of terms; cap
  // generously and fall back to "stuck" beyond it (acvm gates after the
  // width-3 lowering never exceed this).
  constexpr int MAX_UNKNOWNS = 64;
  uint32_t uvar[MAX_UNKNOWNS];
  Fr ucoeff[MAX_UNKNOWNS];

  bool progress = true;
  long long remaining = 0;
  while (progress) {
    progress = false;
    remaining = 0;
    for (long long op = 0; op < n_ops; ++op) {
      if (op_done[op]) continue;
      Fr cst = fr_to_mont(fr_load(qc + 4 * op));
      int n_unknown = 0;
      bool stuck = false;

      for (long long t = mt_off[op]; t < mt_off[op + 1]; ++t) {
        uint32_t wa = mt_a[t], wb = mt_b[t];
        if (wa >= n_wit || wb >= n_wit) { *err_op = op; return -2; }
        bool ka = known[wa], kb = known[wb];
        Fr coeff = fr_to_mont(fr_load(mt_coeff + 4 * t));
        if (ka && kb) {
          // coeff_m * a_m = (c*a)_m, then *_m b_m = (c*a*b)_m: the
          // Montgomery form is preserved across chained fr_mont_mul.
          Fr prod = fr_mont_mul(
              fr_mont_mul(coeff, fr_to_mont(fr_load(values + 4 * wa))),
              fr_to_mont(fr_load(values + 4 * wb)));
          cst = fr_add(cst, prod);
        } else if (ka || kb) {
          uint32_t unk = ka ? wb : wa;
          uint32_t knw = ka ? wa : wb;
          Fr c = fr_mont_mul(coeff, fr_to_mont(fr_load(values + 4 * knw)));
          // merge into unknown list
          int k = 0;
          for (; k < n_unknown; ++k)
            if (uvar[k] == unk) { ucoeff[k] = fr_add(ucoeff[k], c); break; }
          if (k == n_unknown) {
            if (n_unknown == MAX_UNKNOWNS) { stuck = true; }
            else { uvar[n_unknown] = unk; ucoeff[n_unknown] = c; ++n_unknown; }
          }
        } else {
          stuck = true;
        }
      }
      for (long long t = lt_off[op]; t < lt_off[op + 1]; ++t) {
        uint32_t v = lt_var[t];
        if (v >= n_wit) { *err_op = op; return -2; }
        Fr coeff = fr_to_mont(fr_load(lt_coeff + 4 * t));
        if (known[v]) {
          cst = fr_add(cst, fr_mont_mul(coeff, fr_to_mont(fr_load(values + 4 * v))));
        } else {
          int k = 0;
          for (; k < n_unknown; ++k)
            if (uvar[k] == v) { ucoeff[k] = fr_add(ucoeff[k], coeff); break; }
          if (k == n_unknown) {
            if (n_unknown == MAX_UNKNOWNS) { stuck = true; }
            else { uvar[n_unknown] = v; ucoeff[n_unknown] = coeff; ++n_unknown; }
          }
        }
      }

      if (stuck) { ++remaining; continue; }

      // Drop unknowns whose net coefficient cancelled to zero.
      int live = -1, n_live = 0;
      for (int k = 0; k < n_unknown; ++k)
        if (!fr_is_zero(ucoeff[k])) { live = k; ++n_live; }

      if (n_live == 0) {
        if (!fr_is_zero(cst)) { *err_op = op; return -1; }
        op_done[op] = 1;
        progress = true;
      } else if (n_live == 1) {
        Fr val = fr_mont_mul(fr_neg(cst), fr_mont_inv(ucoeff[live]));
        fr_store(values + 4 * uvar[live], fr_from_mont(val));
        known[uvar[live]] = 1;
        op_done[op] = 1;
        progress = true;
      } else {
        ++remaining;
      }
    }
  }
  return remaining;
}

// ---------------------------------------------------------------------------
// Gate-satisfaction check (lowering.py::check_satisfied, debug tier).
// Writes indices of violated gates into bad_out (capacity n_gates);
// returns the count.
// ---------------------------------------------------------------------------

long long noirtpu_check_satisfied(
    long long n_gates, const u64 *ql, const u64 *qr, const u64 *qo,
    const u64 *qm, const u64 *qc, const int32_t *wa, const int32_t *wb,
    const int32_t *wc, long long n_vars, const u64 *assignment,
    long long *bad_out) {
  long long n_bad = 0;
  for (long long g = 0; g < n_gates; ++g) {
    Fr a = fr_to_mont(fr_load(assignment + 4 * wa[g]));
    Fr b = fr_to_mont(fr_load(assignment + 4 * wb[g]));
    Fr c = fr_to_mont(fr_load(assignment + 4 * wc[g]));
    Fr v = fr_to_mont(fr_load(qc + 4 * g));
    v = fr_add(v, fr_mont_mul(fr_to_mont(fr_load(ql + 4 * g)), a));
    v = fr_add(v, fr_mont_mul(fr_to_mont(fr_load(qr + 4 * g)), b));
    v = fr_add(v, fr_mont_mul(fr_to_mont(fr_load(qo + 4 * g)), c));
    v = fr_add(v, fr_mont_mul(fr_to_mont(fr_load(qm + 4 * g)), fr_mont_mul(a, b)));
    if (!fr_is_zero(v)) bad_out[n_bad++] = g;
  }
  return n_bad;
}

// ---------------------------------------------------------------------------
// ACIR -> PLONK gate-table lowering (BuildSparseR1CS /
// handleArithmeticOpcode semantics, sparse_r1cs.go:44-107): per packed
// arithmetic opcode, emit (qL,qR,qO,qM,qC, xa,xb,xc). index_map maps
// 1-based ACIR witness index -> cs variable (int32, missing -> 0).
// Returns 0 on success, -(op+1) if an opcode has > 3 linear terms.
// ---------------------------------------------------------------------------

long long noirtpu_lower_plonk(
    long long n_ops, const long long *mt_off, const u64 *mt_coeff,
    const uint32_t *mt_a, const uint32_t *mt_b, const long long *lt_off,
    const u64 *lt_coeff, const uint32_t *lt_var, const u64 *qc_in,
    long long n_wit, const int32_t *index_map,
    u64 *ql, u64 *qr, u64 *qo, u64 *qm, u64 *qc_out,
    int32_t *xa, int32_t *xb, int32_t *xc) {
  auto map_idx = [&](uint32_t w) -> int32_t {
    return (w < n_wit) ? index_map[w] : 0;
  };
  static const u64 ZERO[4] = {0, 0, 0, 0};
  for (long long op = 0; op < n_ops; ++op) {
    std::memcpy(ql + 4 * op, ZERO, 32);
    std::memcpy(qr + 4 * op, ZERO, 32);
    std::memcpy(qo + 4 * op, ZERO, 32);
    std::memcpy(qm + 4 * op, ZERO, 32);
    std::memcpy(qc_out + 4 * op, qc_in + 4 * op, 32);
    int32_t a = 0, b = 0, c = 0;

    if (mt_off[op + 1] > mt_off[op]) {
      long long t = mt_off[op];  // only mul_terms[0] (sparse_r1cs.go:49-55)
      std::memcpy(qm + 4 * op, mt_coeff + 4 * t, 32);
      a = map_idx(mt_a[t]);
      b = map_idx(mt_b[t]);
    }
    long long nl = lt_off[op + 1] - lt_off[op];
    long long t0 = lt_off[op];
    if (nl == 1) {
      std::memcpy(qo + 4 * op, lt_coeff + 4 * t0, 32);
      c = map_idx(lt_var[t0]);
    } else if (nl == 2) {
      std::memcpy(ql + 4 * op, lt_coeff + 4 * t0, 32);
      a = map_idx(lt_var[t0]);
      std::memcpy(qr + 4 * op, lt_coeff + 4 * (t0 + 1), 32);
      b = map_idx(lt_var[t0 + 1]);
    } else if (nl == 3) {
      std::memcpy(ql + 4 * op, lt_coeff + 4 * t0, 32);
      a = map_idx(lt_var[t0]);
      std::memcpy(qr + 4 * op, lt_coeff + 4 * (t0 + 1), 32);
      b = map_idx(lt_var[t0 + 1]);
      std::memcpy(qo + 4 * op, lt_coeff + 4 * (t0 + 2), 32);
      c = map_idx(lt_var[t0 + 2]);
    } else if (nl > 3) {
      return -(op + 1);
    }
    xa[op] = a;
    xb[op] = b;
    xc[op] = c;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Felt wire codec (serialize.rs:10-47 / helpers.go:13-33): 4x64 LE limb
// felts <-> 32-byte big-endian blobs. Vector framing (u32 BE count
// prefix) is handled by the Python binding.
// ---------------------------------------------------------------------------

void noirtpu_felts_to_be(long long n, const u64 *limbs, uint8_t *out) {
  for (long long i = 0; i < n; ++i) {
    const u64 *f = limbs + 4 * i;
    uint8_t *o = out + 32 * i;
    for (int limb = 0; limb < 4; ++limb) {
      u64 v = f[3 - limb];
      for (int bb = 0; bb < 8; ++bb) o[limb * 8 + bb] = (uint8_t)(v >> (56 - 8 * bb));
    }
  }
}

// BE bytes -> limbs, reducing mod r like gnark Element.SetBytes
// (helpers.go:13-22). Reduction: value < 2^256 < 6p, so subtract p up
// to 5 times.
void noirtpu_felts_from_be(long long n, const uint8_t *in, u64 *limbs) {
  for (long long i = 0; i < n; ++i) {
    const uint8_t *o = in + 32 * i;
    Fr v;
    for (int limb = 0; limb < 4; ++limb) {
      u64 acc = 0;
      for (int bb = 0; bb < 8; ++bb) acc = (acc << 8) | o[(3 - limb) * 8 + bb];
      v.l[limb] = acc;
    }
    while (fr_gte_mod(v)) fr_sub_mod_inplace(v);
    fr_store(limbs + 4 * i, v);
  }
}

// ---------------------------------------------------------------------------
// Batch field ops on canonical 4x64 felts (host-side utility tier used
// by setup/key building; the device path uses ops/field.py).
// ---------------------------------------------------------------------------

void noirtpu_fr_batch_mul(long long n, const u64 *a, const u64 *b, u64 *out) {
  for (long long i = 0; i < n; ++i)
    fr_store(out + 4 * i,
             fr_from_mont(fr_mont_mul(fr_to_mont(fr_load(a + 4 * i)),
                                      fr_to_mont(fr_load(b + 4 * i)))));
}

void noirtpu_fr_batch_add(long long n, const u64 *a, const u64 *b, u64 *out) {
  for (long long i = 0; i < n; ++i)
    fr_store(out + 4 * i, fr_add(fr_load(a + 4 * i), fr_load(b + 4 * i)));
}

void noirtpu_fr_batch_inv(long long n, const u64 *a, u64 *out) {
  for (long long i = 0; i < n; ++i)
    fr_store(out + 4 * i,
             fr_from_mont(fr_mont_inv(fr_to_mont(fr_load(a + 4 * i)))));
}

void noirtpu_fr_batch_sub(long long n, const u64 *a, const u64 *b, u64 *out) {
  for (long long i = 0; i < n; ++i)
    fr_store(out + 4 * i, fr_sub(fr_load(a + 4 * i), fr_load(b + 4 * i)));
}

// out[i] = base^i * scale (canonical); the running-product form of the
// per-index pow() chains in Groth16 setup (h_query powers, Lagrange
// numerators) — 2 Montgomery muls per element instead of a modexp.
void noirtpu_fr_powers(long long n, const u64 *base, const u64 *scale,
                       u64 *out) {
  Fr base_m = fr_to_mont(fr_load(base));
  Fr acc_m = fr_to_mont(fr_load(scale));
  for (long long i = 0; i < n; ++i) {
    fr_store(out + 4 * i, fr_from_mont(acc_m));
    acc_m = fr_mont_mul(acc_m, base_m);
  }
}

// ---------------------------------------------------------------------------
// Sparse R1CS kernels (Groth16 host side — backend/groth16/r1cs.go
// semantics, vectorized). Rows are CSR: indptr[n_rows+1] (i64),
// idx[nnz] (u32 variable indices), coeff[nnz*4] canonical felts.
//
// Both kernels use the "one-sided Montgomery" trick: convert one
// operand stream to Montgomery form once, then mont_mul(raw, mont)
// yields the CANONICAL product directly (mont_mul divides by R), so
// the inner loop is one mul + one add per nonzero with no per-term
// form conversions.
// ---------------------------------------------------------------------------

// out[r] = sum_j coeff[j] * w[idx[j]] for j in [indptr[r], indptr[r+1]).
// w canonical; out canonical, or Montgomery (device form) if out_mont.
// Returns -1 if any idx >= n_w, else 0.
long long noirtpu_spmv_fr(long long n_rows, const long long *indptr,
                          const uint32_t *idx, const u64 *coeff,
                          long long n_w, const u64 *w, u64 *out,
                          int out_mont) {
  Fr *w_m = new Fr[n_w];
  for (long long i = 0; i < n_w; ++i) w_m[i] = fr_to_mont(fr_load(w + 4 * i));
  long long rc = 0;
  for (long long r = 0; r < n_rows; ++r) {
    Fr acc = {{0, 0, 0, 0}};
    for (long long j = indptr[r]; j < indptr[r + 1]; ++j) {
      if (idx[j] >= (uint64_t)n_w) {
        rc = -1;
        break;
      }
      acc = fr_add(acc, fr_mont_mul(fr_load(coeff + 4 * j), w_m[idx[j]]));
    }
    if (rc) break;
    fr_store(out + 4 * r, out_mont ? fr_to_mont(acc) : acc);
  }
  delete[] w_m;
  return rc;
}

// QAP accumulation: out[idx[j]] += coeff[j] * x[r] (the transpose
// walk of _qap_evals_at_tau). x canonical per row; out pre-zeroed
// canonical, length n_out. Returns -1 on an out-of-range idx.
long long noirtpu_spmv_t_fr(long long n_rows, const long long *indptr,
                            const uint32_t *idx, const u64 *coeff,
                            const u64 *x, long long n_out, u64 *out) {
  for (long long r = 0; r < n_rows; ++r) {
    Fr x_m = fr_to_mont(fr_load(x + 4 * r));
    for (long long j = indptr[r]; j < indptr[r + 1]; ++j) {
      if (idx[j] >= (uint64_t)n_out) return -1;
      Fr cur = fr_load(out + 4 * idx[j]);
      fr_store(out + 4 * idx[j],
               fr_add(cur, fr_mont_mul(fr_load(coeff + 4 * j), x_m)));
    }
  }
  return 0;
}

int noirtpu_abi_version() { return 1; }

}  // extern "C"
