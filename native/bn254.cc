// BN254 host-side compute core: Montgomery field arithmetic, Pippenger MSM,
// radix-2 NTT, fixed-base SRS generation.
//
// TPU-native framework companion: the JAX digit-array kernels carry the
// on-chip compute path; this module is the HOST fallback the CPU-backend
// prover routes its hot polynomial ops through (the reference gets the same
// from its external halo2_proofs backend's multicore FFT + Pippenger —
// SURVEY.md §2.3 item 1).  Exact same math (R = 2^256 Montgomery), so byte
// layouts interconvert with the (n, 32) uint8 digit arrays by pointer cast
// on little-endian hosts.
//
// All constants below are re-derived from the curve parameters
// (crypto/params.py); nothing is copied from the reference.

#include <cstdint>
#include <cstring>
#include <vector>

typedef uint64_t u64;
typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// Field parameters (derived: see crypto/params.py; R = 2^256)
// ---------------------------------------------------------------------------
static const u64 Q_P[4]   = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL, 0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 Q_INV    = 0x87d20782e4866389ULL;
static const u64 Q_R2[4]  = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL, 0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
static const u64 Q_ONE[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
static const u64 R_P[4]   = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL, 0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 R_INV    = 0xc2e1f593efffffffULL;
static const u64 R_R2[4]  = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL, 0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};
static const u64 R_ONE[4] = {0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL, 0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL};
// G1 generator (1, 2) in Montgomery form over Fq
static const u64 G1X[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
static const u64 G1Y[4] = {0xa6ba871b8b1e1b3aULL, 0x14f1d651eb8e167bULL, 0xccdd46def0f28c58ULL, 0x1c14ef83340fbe5eULL};

struct Fp {
  const u64 *p, *r2, *one;
  u64 inv;
};
static const Fp FQ = {Q_P, Q_R2, Q_ONE, Q_INV};
static const Fp FR = {R_P, R_R2, R_ONE, R_INV};

// ---------------------------------------------------------------------------
// 4-limb Montgomery arithmetic (SOS: full 512-bit product, then reduce)
// ---------------------------------------------------------------------------
static inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

static inline void cond_sub(u64 a[4], const u64 p[4]) {
  if (geq(a, p)) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
      u128 cur = (u128)a[i] - p[i] - (u64)borrow;
      a[i] = (u64)cur;
      borrow = (cur >> 64) ? 1 : 0;
    }
  }
}

static inline void fadd(const Fp &f, u64 out[4], const u64 a[4], const u64 b[4]) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 cur = (u128)a[i] + b[i] + (u64)carry;
    out[i] = (u64)cur;
    carry = cur >> 64;
  }
  // p < 2^254 so a+b < 2^255: no overflow out of 4 limbs
  cond_sub(out, f.p);
}

static inline void fsub(const Fp &f, u64 out[4], const u64 a[4], const u64 b[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 cur = (u128)a[i] - b[i] - (u64)borrow;
    out[i] = (u64)cur;
    borrow = (cur >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 cur = (u128)out[i] + f.p[i] + (u64)carry;
      out[i] = (u64)cur;
      carry = cur >> 64;
    }
  }
}

static inline void fmul(const Fp &f, u64 out[4], const u64 a[4], const u64 b[4]) {
  u64 t[8] = {0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a[i] * b[j] + t[i + j] + (u64)carry;
      t[i + j] = (u64)cur;
      carry = cur >> 64;
    }
    t[i + 4] = (u64)carry;
  }
  // Montgomery reduction of the 512-bit t; total value stays < 2^512
  for (int i = 0; i < 4; ++i) {
    u64 m = t[i] * f.inv;
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)m * f.p[j] + t[i + j] + (u64)carry;
      t[i + j] = (u64)cur;
      carry = cur >> 64;
    }
    for (int l = i + 4; carry && l < 8; ++l) {
      u128 cur = (u128)t[l] + (u64)carry;
      t[l] = (u64)cur;
      carry = cur >> 64;
    }
  }
  for (int i = 0; i < 4; ++i) out[i] = t[i + 4];
  cond_sub(out, f.p);
}

static inline void fsqr(const Fp &f, u64 out[4], const u64 a[4]) { fmul(f, out, a, a); }

static inline void fdbl(const Fp &f, u64 out[4], const u64 a[4]) { fadd(f, out, a, a); }

static inline bool fis0(const u64 a[4]) { return !(a[0] | a[1] | a[2] | a[3]); }

static inline bool feq(const u64 a[4], const u64 b[4]) {
  return a[0] == b[0] && a[1] == b[1] && a[2] == b[2] && a[3] == b[3];
}

static inline void fcpy(u64 out[4], const u64 a[4]) { memcpy(out, a, 32); }

static inline void fset0(u64 out[4]) { memset(out, 0, 32); }

// out = a^e mod p (a Montgomery; e plain 4-limb)
static void fpow(const Fp &f, u64 out[4], const u64 a[4], const u64 e[4]) {
  u64 base[4], acc[4];
  fcpy(base, a);
  fcpy(acc, f.one);
  for (int limb = 0; limb < 4; ++limb) {
    u64 bits = e[limb];
    for (int b = 0; b < 64; ++b) {
      if ((bits >> b) & 1) fmul(f, acc, acc, base);
      fsqr(f, base, base);
    }
  }
  fcpy(out, acc);
}

// Montgomery inverse via Fermat (p - 2 exponent)
static void finv(const Fp &f, u64 out[4], const u64 a[4]) {
  u64 e[4];
  memcpy(e, f.p, 32);
  // p - 2 (p is odd, > 2; no borrow past limb 0 unless p[0] < 2, not the case)
  e[0] -= 2;
  fpow(f, out, a, e);
}

static inline void to_mont(const Fp &f, u64 out[4], const u64 a[4]) { fmul(f, out, a, f.r2); }

static inline void from_mont(const Fp &f, u64 out[4], const u64 a[4]) {
  static const u64 ONE_PLAIN[4] = {1, 0, 0, 0};
  fmul(f, out, a, ONE_PLAIN);
}

// ---------------------------------------------------------------------------
// G1 Jacobian arithmetic over Fq (y^2 = x^3 + 3); infinity <=> Z == 0
// ---------------------------------------------------------------------------
struct Jac {
  u64 X[4], Y[4], Z[4];
};

static inline void jac_set_inf(Jac &p) {
  fcpy(p.X, Q_ONE);
  fcpy(p.Y, Q_ONE);
  fset0(p.Z);
}

static inline bool jac_is_inf(const Jac &p) { return fis0(p.Z); }

// p = 2p (dbl-2009-l for a=0)
static void jac_dbl(Jac &p) {
  if (jac_is_inf(p)) return;
  u64 A[4], B[4], C[4], D[4], E[4], F2[4], t[4];
  fsqr(FQ, A, p.X);                 // A = X^2
  fsqr(FQ, B, p.Y);                 // B = Y^2
  fsqr(FQ, C, B);                   // C = B^2
  fadd(FQ, t, p.X, B);
  fsqr(FQ, t, t);
  fsub(FQ, t, t, A);
  fsub(FQ, t, t, C);
  fdbl(FQ, D, t);                   // D = 2((X+B)^2 - A - C)
  fdbl(FQ, E, A);
  fadd(FQ, E, E, A);                // E = 3A
  fsqr(FQ, F2, E);                  // F = E^2
  u64 X3[4], Y3[4], Z3[4];
  fdbl(FQ, t, D);
  fsub(FQ, X3, F2, t);              // X3 = F - 2D
  fmul(FQ, Z3, p.Y, p.Z);
  fdbl(FQ, Z3, Z3);                 // Z3 = 2YZ
  fsub(FQ, t, D, X3);
  fmul(FQ, t, E, t);
  u64 c8[4];
  fdbl(FQ, c8, C);
  fdbl(FQ, c8, c8);
  fdbl(FQ, c8, c8);                 // 8C
  fsub(FQ, Y3, t, c8);              // Y3 = E(D - X3) - 8C
  fcpy(p.X, X3);
  fcpy(p.Y, Y3);
  fcpy(p.Z, Z3);
}

// p += (x2, y2) affine (madd-2007-bl), edge-complete
static void jac_add_mixed(Jac &p, const u64 x2[4], const u64 y2[4]) {
  if (jac_is_inf(p)) {
    fcpy(p.X, x2);
    fcpy(p.Y, y2);
    fcpy(p.Z, Q_ONE);
    return;
  }
  u64 Z1Z1[4], U2[4], S2[4], H[4], HH[4], I[4], J[4], rr[4], V[4], t[4];
  fsqr(FQ, Z1Z1, p.Z);
  fmul(FQ, U2, x2, Z1Z1);
  fmul(FQ, S2, y2, p.Z);
  fmul(FQ, S2, S2, Z1Z1);
  fsub(FQ, H, U2, p.X);             // H = U2 - X1
  fsub(FQ, rr, S2, p.Y);            // r' = S2 - Y1 (halved form below uses 2r)
  if (fis0(H)) {
    if (fis0(rr)) { jac_dbl(p); return; }
    jac_set_inf(p);
    return;
  }
  fdbl(FQ, rr, rr);                 // r = 2(S2 - Y1)
  fsqr(FQ, HH, H);
  fdbl(FQ, I, HH);
  fdbl(FQ, I, I);                   // I = 4HH
  fmul(FQ, J, H, I);                // J = H*I
  fmul(FQ, V, p.X, I);              // V = X1*I
  u64 X3[4], Y3[4], Z3[4];
  fsqr(FQ, X3, rr);
  fsub(FQ, X3, X3, J);
  fdbl(FQ, t, V);
  fsub(FQ, X3, X3, t);              // X3 = r^2 - J - 2V
  fsub(FQ, t, V, X3);
  fmul(FQ, t, rr, t);
  u64 yj[4];
  fmul(FQ, yj, p.Y, J);
  fdbl(FQ, yj, yj);
  fsub(FQ, Y3, t, yj);              // Y3 = r(V - X3) - 2*Y1*J
  fadd(FQ, Z3, p.Z, H);
  fsqr(FQ, Z3, Z3);
  fsub(FQ, Z3, Z3, Z1Z1);
  fsub(FQ, Z3, Z3, HH);             // Z3 = (Z1+H)^2 - Z1Z1 - HH
  fcpy(p.X, X3);
  fcpy(p.Y, Y3);
  fcpy(p.Z, Z3);
}

// p += q, both Jacobian (add-2007-bl), edge-complete
static void jac_add(Jac &p, const Jac &q) {
  if (jac_is_inf(q)) return;
  if (jac_is_inf(p)) { p = q; return; }
  u64 Z1Z1[4], Z2Z2[4], U1[4], U2[4], S1[4], S2[4], H[4], I[4], J[4], rr[4], V[4], t[4];
  fsqr(FQ, Z1Z1, p.Z);
  fsqr(FQ, Z2Z2, q.Z);
  fmul(FQ, U1, p.X, Z2Z2);
  fmul(FQ, U2, q.X, Z1Z1);
  fmul(FQ, S1, p.Y, q.Z);
  fmul(FQ, S1, S1, Z2Z2);
  fmul(FQ, S2, q.Y, p.Z);
  fmul(FQ, S2, S2, Z1Z1);
  fsub(FQ, H, U2, U1);
  fsub(FQ, rr, S2, S1);
  if (fis0(H)) {
    if (fis0(rr)) { jac_dbl(p); return; }
    jac_set_inf(p);
    return;
  }
  fdbl(FQ, rr, rr);                 // r = 2(S2 - S1)
  fdbl(FQ, t, H);
  fsqr(FQ, I, t);                   // I = (2H)^2
  fmul(FQ, J, H, I);
  fmul(FQ, V, U1, I);
  u64 X3[4], Y3[4], Z3[4];
  fsqr(FQ, X3, rr);
  fsub(FQ, X3, X3, J);
  fdbl(FQ, t, V);
  fsub(FQ, X3, X3, t);
  fsub(FQ, t, V, X3);
  fmul(FQ, t, rr, t);
  u64 sj[4];
  fmul(FQ, sj, S1, J);
  fdbl(FQ, sj, sj);
  fsub(FQ, Y3, t, sj);
  fadd(FQ, Z3, p.Z, q.Z);
  fsqr(FQ, Z3, Z3);
  fsub(FQ, Z3, Z3, Z1Z1);
  fsub(FQ, Z3, Z3, Z2Z2);
  fmul(FQ, Z3, Z3, H);
  fcpy(p.X, X3);
  fcpy(p.Y, Y3);
  fcpy(p.Z, Z3);
}

// Batch Jacobian -> affine (Montgomery coords); infinity flagged per entry.
static void jac_batch_affine(const Jac *pts, int64_t n, u64 *out_x, u64 *out_y,
                             uint8_t *valid) {
  std::vector<u64> pref(4 * (n + 1));
  fcpy(&pref[0], Q_ONE);
  for (int64_t i = 0; i < n; ++i) {
    const u64 *z = jac_is_inf(pts[i]) ? Q_ONE : pts[i].Z;
    fmul(FQ, &pref[4 * (i + 1)], &pref[4 * i], z);
  }
  u64 inv[4];
  finv(FQ, inv, &pref[4 * n]);
  for (int64_t i = n - 1; i >= 0; --i) {
    if (jac_is_inf(pts[i])) {
      if (valid) valid[i] = 0;
      fset0(out_x + 4 * i);
      fset0(out_y + 4 * i);
      continue;
    }
    if (valid) valid[i] = 1;
    u64 zinv[4], zinv2[4], zinv3[4];
    fmul(FQ, zinv, inv, &pref[4 * i]);
    fmul(FQ, inv, inv, pts[i].Z);
    fsqr(FQ, zinv2, zinv);
    fmul(FQ, zinv3, zinv2, zinv);
    fmul(FQ, out_x + 4 * i, pts[i].X, zinv2);
    fmul(FQ, out_y + 4 * i, pts[i].Y, zinv3);
  }
}

// ---------------------------------------------------------------------------
// Pippenger MSM
// ---------------------------------------------------------------------------
static inline int scalar_window(const u64 s[4], int w, int c) {
  int bit = w * c;
  int limb = bit >> 6, off = bit & 63;
  u64 v = s[limb] >> off;
  if (off + c > 64 && limb + 1 < 4) v |= s[limb + 1] << (64 - off);
  return (int)(v & ((1ULL << c) - 1));
}

extern "C" void zkevm_bn254_msm(
    const uint8_t *px, const uint8_t *py,  // n*32 bytes each, Montgomery affine
    const uint8_t *zmask,                  // n bytes; 0 => skip (infinity), may be NULL
    const uint8_t *scalars,                // ncols * n * 32 bytes LE
    int scalars_mont,                      // 1 => scalars in Montgomery form
    int64_t n, int64_t ncols,
    uint8_t *out                           // ncols * 65: x(32) y(32) valid(1), PLAIN affine
) {
  const u64 *X = (const u64 *)px;
  const u64 *Y = (const u64 *)py;
  int c = 13;
  if (n < (1 << 12)) c = 10;
  if (n < (1 << 8)) c = 6;
  int nw = (256 + c - 1) / c;
  int64_t nbuckets = (int64_t)1 << c;
  std::vector<Jac> buckets(nbuckets);
  std::vector<u64> sc(4 * n);
  std::vector<Jac> results(ncols);

  for (int64_t col = 0; col < ncols; ++col) {
    const u64 *src = (const u64 *)(scalars + col * n * 32);
    for (int64_t i = 0; i < n; ++i) {
      if (scalars_mont) {
        from_mont(FR, &sc[4 * i], src + 4 * i);
      } else {
        memcpy(&sc[4 * i], src + 4 * i, 32);
      }
    }
    Jac acc;
    jac_set_inf(acc);
    for (int w = nw - 1; w >= 0; --w) {
      for (int b = 0; b < c; ++b) jac_dbl(acc);
      for (int64_t b = 1; b < nbuckets; ++b) jac_set_inf(buckets[b]);
      for (int64_t i = 0; i < n; ++i) {
        if (zmask && !zmask[i]) continue;
        int d = scalar_window(&sc[4 * i], w, c);
        if (d) jac_add_mixed(buckets[d], X + 4 * i, Y + 4 * i);
      }
      Jac running, sum;
      jac_set_inf(running);
      jac_set_inf(sum);
      for (int64_t b = nbuckets - 1; b >= 1; --b) {
        jac_add(running, buckets[b]);
        jac_add(sum, running);
      }
      jac_add(acc, sum);
    }
    results[col] = acc;
  }
  std::vector<u64> ax(4 * ncols), ay(4 * ncols);
  std::vector<uint8_t> valid(ncols);
  jac_batch_affine(results.data(), ncols, ax.data(), ay.data(), valid.data());
  for (int64_t col = 0; col < ncols; ++col) {
    u64 xp[4], yp[4];
    from_mont(FQ, xp, &ax[4 * col]);
    from_mont(FQ, yp, &ay[4 * col]);
    memcpy(out + col * 65, xp, 32);
    memcpy(out + col * 65 + 32, yp, 32);
    out[col * 65 + 64] = valid[col];
  }
}

// ---------------------------------------------------------------------------
// Fixed-base SRS generation: [tau^i]G for i < n (Montgomery affine out)
// ---------------------------------------------------------------------------
extern "C" void zkevm_bn254_srs_gen(
    int64_t n, const uint8_t tau_bytes[32],  // plain LE, already mod r
    uint8_t *out_x, uint8_t *out_y           // n*32 bytes each, Montgomery affine
) {
  // 8-bit windowed table: win[w][j-1] = (j << (8w)) * G, affine Montgomery
  const int W = 32, B = 255;
  std::vector<Jac> jtab(W * B);
  {
    Jac cur;
    fcpy(cur.X, G1X);
    fcpy(cur.Y, G1Y);
    fcpy(cur.Z, Q_ONE);
    for (int w = 0; w < W; ++w) {
      Jac acc = cur;
      for (int j = 0; j < B; ++j) {
        jtab[w * B + j] = acc;
        if (j + 1 < B) jac_add(acc, cur);
      }
      if (w + 1 < W) {
        for (int d = 0; d < 8; ++d) jac_dbl(cur);
      }
    }
  }
  std::vector<u64> tx(4 * W * B), ty(4 * W * B);
  jac_batch_affine(jtab.data(), W * B, tx.data(), ty.data(), nullptr);
  jtab.clear();
  jtab.shrink_to_fit();

  // tau powers in Fr (Montgomery running product, converted per point)
  u64 tau_m[4], s_m[4];
  to_mont(FR, tau_m, (const u64 *)tau_bytes);
  fcpy(s_m, FR.one);  // tau^0 = 1
  std::vector<Jac> pts(n);
  for (int64_t i = 0; i < n; ++i) {
    u64 s[4];
    from_mont(FR, s, s_m);
    Jac acc;
    jac_set_inf(acc);
    const uint8_t *sb = (const uint8_t *)s;
    for (int w = 0; w < W; ++w) {
      int d = sb[w];
      if (d) jac_add_mixed(acc, &tx[4 * (w * B + d - 1)], &ty[4 * (w * B + d - 1)]);
    }
    pts[i] = acc;
    fmul(FR, s_m, s_m, tau_m);
  }
  jac_batch_affine(pts.data(), n, (u64 *)out_x, (u64 *)out_y, nullptr);
}

// ---------------------------------------------------------------------------
// Radix-2 NTT over Fr (in-place, batched columns)
// ---------------------------------------------------------------------------
extern "C" void zkevm_fr_ntt(
    uint8_t *data,                    // ncols * n * 32 bytes, Montgomery, in-place
    int64_t k, int64_t ncols,
    const uint8_t omega_bytes[32],    // plain LE: 2^k-th root for THIS direction
    const uint8_t pre_base[32],       // plain LE: coeff i *= pre^i before (1 = skip)
    const uint8_t post_base[32],      // plain LE: out i *= post_base^i * post_const
    const uint8_t post_const[32]      // plain LE (1 = identity)
) {
  int64_t n = (int64_t)1 << k;
  u64 om[4];
  to_mont(FR, om, (const u64 *)omega_bytes);

  // twiddle table W[i] = omega^i (Montgomery) for i < n/2
  int64_t half = n >> 1;
  std::vector<u64> tw(4 * (half > 0 ? half : 1));
  fcpy(&tw[0], FR.one);
  for (int64_t i = 1; i < half; ++i) fmul(FR, &tw[4 * i], &tw[4 * (i - 1)], om);

  static const u64 ONE_PLAIN[4] = {1, 0, 0, 0};
  u64 preb[4], postb[4], postc[4];
  memcpy(preb, pre_base, 32);
  memcpy(postb, post_base, 32);
  memcpy(postc, post_const, 32);
  bool do_pre = !feq(preb, ONE_PLAIN);
  bool do_post = !feq(postb, ONE_PLAIN) || !feq(postc, ONE_PLAIN);

  // bit-reversal index table
  std::vector<int64_t> rev(n);
  rev[0] = 0;
  for (int64_t i = 1; i < n; ++i) rev[i] = (rev[i >> 1] >> 1) | ((i & 1) << (k - 1));

  std::vector<u64> pre_scale, post_scale;
  if (do_pre) {
    pre_scale.resize(4 * n);
    u64 pm[4];
    to_mont(FR, pm, preb);
    fcpy(&pre_scale[0], FR.one);
    for (int64_t i = 1; i < n; ++i)
      fmul(FR, &pre_scale[4 * i], &pre_scale[4 * (i - 1)], pm);
  }
  if (do_post) {
    post_scale.resize(4 * n);
    u64 pm[4], pc[4];
    to_mont(FR, pm, postb);
    to_mont(FR, pc, postc);
    fcpy(&post_scale[0], pc);
    for (int64_t i = 1; i < n; ++i)
      fmul(FR, &post_scale[4 * i], &post_scale[4 * (i - 1)], pm);
  }

  for (int64_t col = 0; col < ncols; ++col) {
    u64 *d = (u64 *)(data + col * n * 32);
    if (do_pre) {
      for (int64_t i = 0; i < n; ++i) fmul(FR, d + 4 * i, d + 4 * i, &pre_scale[4 * i]);
    }
    // bitrev permute
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = rev[i];
      if (j > i) {
        u64 t[4];
        fcpy(t, d + 4 * i);
        fcpy(d + 4 * i, d + 4 * j);
        fcpy(d + 4 * j, t);
      }
    }
    // DIT butterflies; stage s: blocks of m = 2^s, twiddle stride n/m
    for (int64_t s = 1; s <= k; ++s) {
      int64_t m = (int64_t)1 << s;
      int64_t mh = m >> 1;
      int64_t stride = n / m;
      for (int64_t blk = 0; blk < n; blk += m) {
        for (int64_t j = 0; j < mh; ++j) {
          u64 *lo = d + 4 * (blk + j);
          u64 *hi = d + 4 * (blk + j + mh);
          u64 t[4];
          fmul(FR, t, hi, &tw[4 * (j * stride)]);
          fsub(FR, hi, lo, t);
          fadd(FR, lo, lo, t);
        }
      }
    }
    if (do_post) {
      for (int64_t i = 0; i < n; ++i) fmul(FR, d + 4 * i, d + 4 * i, &post_scale[4 * i]);
    }
  }
}

// ---------------------------------------------------------------------------
// Batched polynomial evaluation: out[q] = sum_i coeffs[q][i] * x^i
// (coeffs Montgomery; x plain LE; out plain LE)
// ---------------------------------------------------------------------------
extern "C" void zkevm_fr_eval_poly_batch(
    const uint8_t *coeffs,  // nq * n * 32, Montgomery
    int64_t nq, int64_t n,
    const uint8_t x_bytes[32],
    uint8_t *out            // nq * 32, plain
) {
  u64 xm[4];
  to_mont(FR, xm, (const u64 *)x_bytes);
  const u64 *C = (const u64 *)coeffs;
  u64 *O = (u64 *)out;
  for (int64_t q = 0; q < nq; ++q) {
    const u64 *c = C + (size_t)q * n * 4;
    u64 acc[4];
    fcpy(acc, c + (n - 1) * 4);
    for (int64_t i = n - 2; i >= 0; --i) {
      u64 t[4];
      fmul(FR, t, acc, xm);
      fadd(FR, acc, t, c + 4 * i);
    }
    from_mont(FR, O + 4 * q, acc);  // coeffs were Montgomery: result plain
  }
}

// ---------------------------------------------------------------------------
// Power table: out[i] = base^i for i < n (base plain LE; out Montgomery)
// ---------------------------------------------------------------------------
extern "C" void zkevm_fr_powers(const uint8_t base_bytes[32], int64_t n,
                                uint8_t *out) {
  u64 *o = (u64 *)out;
  u64 bm[4];
  to_mont(FR, bm, (const u64 *)base_bytes);
  if (n <= 0) return;
  fcpy(&o[0], FR.one);
  for (int64_t i = 1; i < n; ++i) fmul(FR, &o[4 * i], &o[4 * (i - 1)], bm);
}

// ---------------------------------------------------------------------------
// Columnwise postfix-program evaluator over Fr — the prover's quotient
// pass.  The host serializes the y-folded constraint system (gates +
// permutation + lookup + logUp formulas, with challenges folded into
// constants) into a flat op stream; this evaluates it over all n rows of
// the extended domain in one sweep of native Montgomery arithmetic.
// Ops (3 x int32 each): [code, a, b]
//   0 PUSH_COL  a=col index, b=row shift   (reads col[(i + b) mod n])
//   1 PUSH_CONST a=const index
//   2 ADD   3 MUL   4 NEG                  (stack ops)
//   5 TEE   a=tmp index                    (copy top of stack into tmp)
//   6 PUSH_TMP a=tmp index
//   7 EMIT  a=y const index                (acc = acc * y + pop; 1st: pop)
//   8 FIN   a=col index (1/t values)       (out = acc * col)
// ---------------------------------------------------------------------------
extern "C" int zkevm_fr_eval_quotient(
    const uint8_t *cols,   // ncols * n * 32 bytes, Montgomery
    int64_t ncols, int64_t n,
    const uint8_t *consts, // nconsts * 32 bytes, Montgomery
    int64_t nconsts,
    const int32_t *prog, int64_t nops,
    int64_t ntmps, int64_t max_stack,
    uint8_t *out           // n * 32 bytes
) {
  const u64 *C = (const u64 *)cols;
  const u64 *K = (const u64 *)consts;
  u64 *O = (u64 *)out;
  std::vector<u64> stack((size_t)max_stack * n * 4);
  std::vector<u64> tmps((size_t)(ntmps > 0 ? ntmps : 1) * n * 4);
  std::vector<u64> acc(n * 4);
  bool acc_live = false;
  int64_t sp = 0;
  for (int64_t pc = 0; pc < nops; ++pc) {
    int32_t op = prog[3 * pc], a = prog[3 * pc + 1], b = prog[3 * pc + 2];
    switch (op) {
      case 0: {  // PUSH_COL
        if (sp >= max_stack) return -1;
        u64 *dst = &stack[(size_t)sp * n * 4];
        const u64 *src = C + (size_t)a * n * 4;
        int64_t sh = ((int64_t)b % n + n) % n;
        int64_t head = n - sh;
        memcpy(dst, src + sh * 4, (size_t)head * 32);
        if (sh) memcpy(dst + head * 4, src, (size_t)sh * 32);
        ++sp;
        break;
      }
      case 1: {  // PUSH_CONST (broadcast)
        if (sp >= max_stack) return -1;
        u64 *dst = &stack[(size_t)sp * n * 4];
        const u64 *kv = K + (size_t)a * 4;
        for (int64_t i = 0; i < n; ++i) fcpy(dst + 4 * i, kv);
        ++sp;
        break;
      }
      case 2: {  // ADD
        if (sp < 2) return -2;
        u64 *x = &stack[(size_t)(sp - 2) * n * 4];
        u64 *y = &stack[(size_t)(sp - 1) * n * 4];
        for (int64_t i = 0; i < n; ++i)
          fadd(FR, x + 4 * i, x + 4 * i, y + 4 * i);
        --sp;
        break;
      }
      case 3: {  // MUL
        if (sp < 2) return -2;
        u64 *x = &stack[(size_t)(sp - 2) * n * 4];
        u64 *y = &stack[(size_t)(sp - 1) * n * 4];
        for (int64_t i = 0; i < n; ++i)
          fmul(FR, x + 4 * i, x + 4 * i, y + 4 * i);
        --sp;
        break;
      }
      case 4: {  // NEG
        if (sp < 1) return -2;
        u64 *x = &stack[(size_t)(sp - 1) * n * 4];
        u64 zero[4] = {0, 0, 0, 0};
        for (int64_t i = 0; i < n; ++i)
          fsub(FR, x + 4 * i, zero, x + 4 * i);
        break;
      }
      case 5: {  // TEE
        if (sp < 1 || a >= ntmps) return -3;
        memcpy(&tmps[(size_t)a * n * 4],
               &stack[(size_t)(sp - 1) * n * 4], (size_t)n * 32);
        break;
      }
      case 6: {  // PUSH_TMP
        if (sp >= max_stack || a >= ntmps) return -3;
        memcpy(&stack[(size_t)sp * n * 4], &tmps[(size_t)a * n * 4],
               (size_t)n * 32);
        ++sp;
        break;
      }
      case 7: {  // EMIT
        if (sp < 1) return -2;
        u64 *v = &stack[(size_t)(sp - 1) * n * 4];
        if (!acc_live) {
          memcpy(acc.data(), v, (size_t)n * 32);
          acc_live = true;
        } else {
          const u64 *yv = K + (size_t)a * 4;
          for (int64_t i = 0; i < n; ++i) {
            u64 t[4];
            fmul(FR, t, &acc[4 * i], yv);
            fadd(FR, &acc[4 * i], t, v + 4 * i);
          }
        }
        --sp;
        break;
      }
      case 8: {  // FIN
        const u64 *tinv = C + (size_t)a * n * 4;
        for (int64_t i = 0; i < n; ++i)
          fmul(FR, O + 4 * i, &acc[4 * i], tinv + 4 * i);
        return 0;
      }
      default:
        return -4;
    }
  }
  return -5;  // no FIN
}

// ---------------------------------------------------------------------------
// Batched field inverse over Fr (Montgomery in/out); 0 -> 0
// ---------------------------------------------------------------------------
extern "C" void zkevm_fr_batch_inv(uint8_t *data, int64_t n) {
  u64 *d = (u64 *)data;
  std::vector<u64> pref(4 * (n + 1));
  fcpy(&pref[0], FR.one);
  for (int64_t i = 0; i < n; ++i) {
    const u64 *v = fis0(d + 4 * i) ? FR.one : d + 4 * i;
    fmul(FR, &pref[4 * (i + 1)], &pref[4 * i], v);
  }
  u64 inv[4];
  finv(FR, inv, &pref[4 * n]);
  for (int64_t i = n - 1; i >= 0; --i) {
    if (fis0(d + 4 * i)) continue;
    u64 vi[4];
    fmul(FR, vi, inv, &pref[4 * i]);
    fmul(FR, inv, inv, d + 4 * i);
    fcpy(d + 4 * i, vi);
  }
}
