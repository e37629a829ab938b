"""KZG polynomial commitments over BN254 + SHPLONK multiopen.

TPU-native equivalent of the reference backend's `ParamsKZG` SRS and the
SHPLONK (BDFG21) multiopen prover/verifier inside external halo2_proofs
(SURVEY.md §2.3 item 1: "KZG `ParamsKZG` SRS ... SHPLONK (Bdfg21) multiopen
prover/verifier"; used by every bench via `create_proof::<KZG, ProverSHPLONK>`
reference circuit-benchmarks/src/evm_circuit.rs:82-99).

Design (TPU-first, documented divergences from halo2):
  * Commitments are MSMs of COEFFICIENT-form polynomials against the
    monomial SRS.  halo2 commits Lagrange-form columns against a
    transformed Lagrange SRS; here a column is iNTT'd first (one cheap
    batched transform) so a single SRS basis serves everything.
  * Polynomial division never runs coefficient-sequential: quotients like
    (f(X) - r(X)) / Z_S(X) are computed in EVALUATION form on a coset
    (where Z_S has no zeros) — pointwise mul by precomputed inverse evals,
    then coset iNTT.  Fully parallel on device.
  * Multiopen is BDFG21 "scheme 2" with two witness commitments:
      h(X)  = sum_k gamma^k (g_k(X) - r_k(X)) / Z_{S_k}(X),      W1 = [h]
      L(X)  = sum_k gamma^k Z_{S_k}(u)^{-1} (g_k(X) - r_k(u)) - h(X)
      W2 = [L(X)/(X-u)]
    verifier re-assembles C_L from the commitments and checks
      e(W2, [s]_2) = e(C_L + u*W2, [1]_2).
    Same asymptotics and transcript SHAPE as halo2's ProverSHPLONK (one
    challenge, one commitment, one challenge, one commitment), but not
    byte-identical to the Rust fork.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.curve import (
    G1,
    g1_from_affine_ints,
    g1_generator,
    g1_scalar_mul,
    g1_to_affine_ints,
    host_g1_add,
    host_g1_mul,
)
from ..crypto.field import fr
from ..crypto.params import FQ_MODULUS, FR_MODULUS
from ..crypto import pairing as pr
from .ntt import coset_intt, coset_ntt
from .msm import msm

F = fr()
R = FR_MODULUS


# ---------------------------------------------------------------------------
# SRS
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class Srs:
    """Powers-of-tau SRS: [tau^i]G1 for i < n, plus [1]G2 and [tau]G2.

    `g1_powers` lives on device as a Jacobian batch ready for MSM; the G2
    side stays host-side (ints) — it is only touched by the verifier's two
    pairings.  Mirrors halo2 `ParamsKZG` (reference benches call
    `ParamsKZG::setup(degree)`, circuit-benchmarks/src/evm_circuit.rs:69).
    """

    k: int
    g1_powers: G1  # (n, 32) coords, Montgomery Fq digits
    g2: tuple  # ((x0,x1),(y0,y1)) ints
    s_g2: tuple

    @classmethod
    def unsafe_setup(cls, k: int, tau: int | None = None) -> "Srs":
        """Test-only SRS with a known tau (like halo2's setup from a seeded
        rng).  G1 powers are built HOST-side — tau^i scalars then one
        bigint double-and-add per point (~0.2 ms each) — because the
        device ladder on the CPU backend took ~25 min at k=14 and hours
        at k=18 (the r4 BENCH_STATE18 killer); the result is identical,
        already in the affine layout (z in {0, mont(1)}) the MSM grid's
        6-mul kernel requires."""
        n = 1 << k
        tau = tau if tau is not None else 0xC0FFEE ^ (k << 32)
        tau %= R
        from ..crypto import hostcore

        if hostcore.available():
            # native fixed-base windowed gen: ~1 s at k=16 vs ~2 min for the
            # per-point Python ladder (the r4 BENCH_STATE blocker)
            from ..crypto.field import fq as _fq

            xs, ys = hostcore.srs_gen(n, tau)
            one = _fq().ONE_MONT
            zs = np.broadcast_to(one, (n, 32)).copy()
            g1_powers = G1(
                jax.device_put(xs), jax.device_put(ys), jax.device_put(zs)
            )
            s_g2 = pr.g2_scalar_mul(pr.G2_GENERATOR, tau)
            return cls(k=k, g1_powers=g1_powers, g2=pr.G2_GENERATOR, s_g2=s_g2)

        from ..crypto.curve import _hj_add_mixed, _hj_double, _hj_to_affine
        from ..crypto.params import FQ_MODULUS as Q_, G1_GEN

        def jmul(s: int):  # Jacobian ladder: no per-add inversions
            acc = (1, 1, 0)
            for bit in bin(s)[2:]:
                acc = _hj_double(acc, Q_)
                if bit == "1":
                    acc = _hj_add_mixed(acc, G1_GEN, Q_)
            return _hj_to_affine(acc, Q_)

        pts = []
        s = 1
        for _ in range(n):
            pts.append(jmul(s))
            s = s * tau % R
        g1_powers = g1_from_affine_ints(pts)
        g1_powers = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a)), g1_powers
        )
        s_g2 = pr.g2_scalar_mul(pr.G2_GENERATOR, tau)
        return cls(k=k, g1_powers=G1(*g1_powers), g2=pr.G2_GENERATOR, s_g2=s_g2)

    def commit(self, coeffs) -> G1:
        """coeffs: (m, 32) u8 MONTGOMERY digit array, m <= n -> one point."""
        m = coeffs.shape[0]
        plain = F.from_mont(coeffs)  # MSM scalars are plain LE bytes
        pts = G1(self.g1_powers.x[:m], self.g1_powers.y[:m], self.g1_powers.z[:m])
        # SRS powers are pairwise-distinct affine points -> fast kernels
        return msm(pts, plain, distinct=True)

    def _host_powers(self) -> list:
        """Affine int pairs of the G1 powers (cached; one device sync)."""
        cached = getattr(self, "_host_powers_cache", None)
        if cached is None:
            cached = g1_to_affine_ints(self.g1_powers)
            self._host_powers_cache = cached
        return cached

    def _native_parts(self):
        """(px, py, zmask) numpy views of the G1 powers for the native MSM
        (cached — one device sync)."""
        cached = getattr(self, "_native_parts_cache", None)
        if cached is None:
            px = np.asarray(self.g1_powers.x)
            py = np.asarray(self.g1_powers.y)
            zm = np.any(np.asarray(self.g1_powers.z) != 0, axis=-1).astype(
                np.uint8
            )
            cached = (px, py, zm)
            self._native_parts_cache = cached
        return cached

    def commit_affine(self, coeffs):
        """coeffs -> affine (x, y) int pair (None = infinity).

        On the CPU backend the device MSM's fixed bucket machinery costs
        tens of seconds regardless of size; commits route to the native C++
        Pippenger (native/bn254.cc, ~0.9 s/column at k=16 vs ~16 s for the
        Python bigint path).  The TPU backend always uses the device path."""
        return self.commit_many(coeffs[None])[0]

    def commit_many(self, coeff_cols) -> list:
        """(c, m, 32) stacked Montgomery coefficient columns -> list of c
        affine points (host ints).  One batched native MSM on CPU; device
        MSMs per column on TPU."""
        import jax as _jax

        m = coeff_cols.shape[-2]
        if _jax.default_backend() == "cpu" and m <= (1 << 22):
            from ..crypto import hostcore

            if hostcore.available():
                px, py, zm = self._native_parts()
                return hostcore.msm(
                    px[:m], py[:m], zm[:m], np.asarray(coeff_cols),
                    scalars_mont=True,
                )
            from ..crypto.curve import host_msm
            from ..crypto.field import fr as _fr

            Fr = _fr()
            rinv = pow(Fr.R, -1, Fr.modulus)
            out = []
            for ci in range(coeff_cols.shape[0]):
                raw = np.asarray(coeff_cols[ci]).tobytes()
                scalars = [
                    int.from_bytes(raw[32 * i : 32 * i + 32], "little")
                    * rinv % Fr.modulus
                    for i in range(m)
                ]
                out.append(host_msm(self._host_powers()[:m], scalars))
            return out
        return [
            g1_to_affine_ints(self.commit(coeff_cols[i]))[0]
            for i in range(coeff_cols.shape[0])
        ]


# ---------------------------------------------------------------------------
# host-side scalar helpers (transcript-adjacent, tiny data)
# ---------------------------------------------------------------------------
def host_eval_poly(coeffs_int: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs_int):
        acc = (acc * x + c) % R
    return acc


def lagrange_interpolate(points: list[int], values: list[int]) -> list[int]:
    """Coefficients of the unique poly of degree < len(points) through
    (points[i], values[i]).  Host ints; point sets are tiny (<= 3)."""
    m = len(points)
    coeffs = [0] * m
    for i in range(m):
        # numerator poly prod_{j!=i} (X - x_j), denominator prod (x_i - x_j)
        num = [1]
        denom = 1
        for j in range(m):
            if j == i:
                continue
            num = poly_mul_linear(num, (-points[j]) % R)
            denom = denom * (points[i] - points[j]) % R
        scale = values[i] * pow(denom, -1, R) % R
        for d in range(len(num)):
            coeffs[d] = (coeffs[d] + num[d] * scale) % R
    return coeffs


def poly_mul_linear(coeffs: list[int], c: int) -> list[int]:
    """coeffs(X) * (X + c), host ints."""
    out = [0] * (len(coeffs) + 1)
    for i, a in enumerate(coeffs):
        out[i] = (out[i] + a * c) % R
        out[i + 1] = (out[i + 1] + a) % R
    return out


def vanishing_poly(points: list[int]) -> list[int]:
    out = [1]
    for p in points:
        out = poly_mul_linear(out, (-p) % R)
    return out


# ---------------------------------------------------------------------------
# device-side poly utilities
# ---------------------------------------------------------------------------
def eval_at(coeffs, x_int: int) -> int:
    """Evaluate a (m, 32) Montgomery coefficient array at a host scalar.

    One device mul pass against the power table + log-depth add tree."""
    return eval_batch(coeffs[None], x_int)[0]


def eval_batch(stack, x_int: int) -> list[int]:
    """Evaluate a (q, m, 32) batch of Montgomery coefficient arrays at ONE
    host scalar: q results in a single device pass (power table built by
    log-doubling, broadcast mul, log-depth add tree).  Replaces the
    per-query `eval_at` loop the prover used (VERDICT r2 W3).  On the
    CPU backend large batches route to the native Horner
    (native/bn254.cc) — the digit-array mul is ~150x native there."""
    m = stack.shape[-2]
    import jax as _jax

    if (m >= (1 << 10) and _jax.default_backend() == "cpu"
            and not isinstance(stack, _jax.core.Tracer)):
        from ..crypto import hostcore

        if hostcore.available():
            return hostcore.eval_poly_batch(np.asarray(stack), x_int)
    pw = F.power_table(x_int, m)
    terms = F.mul(stack, pw)
    s = _tree_sum_rows(terms)
    out = np.asarray(F.from_mont(s)).reshape(-1, 32)
    return [F.to_int(row) for row in out]


@jax.jit
def _tree_sum(x):
    m = x.shape[0]
    pot = 1 << (m - 1).bit_length() if m > 1 else 1
    if pot != m:
        x = jnp.concatenate([x, jnp.zeros((pot - m, 32), x.dtype)])
        m = pot
    while m > 1:
        half = m // 2
        x = F._add(x[:half], x[half:])
        m = half
    return x[0]


@jax.jit
def _tree_sum_rows(x):
    """(..., m, 32) -> (..., 32) log-depth field sum over axis -2."""
    m = x.shape[-2]
    pot = 1 << (m - 1).bit_length() if m > 1 else 1
    if pot != m:
        pad = jnp.zeros(x.shape[:-2] + (pot - m, 32), x.dtype)
        x = jnp.concatenate([x, pad], axis=-2)
        m = pot
    while m > 1:
        half = m // 2
        x = F._add(x[..., :half, :], x[..., half:, :])
        m = half
    return x[..., 0, :]


def divide_by_vanishing_coset(num_coeffs, zs_points: list[int], k: int):
    """(num(X)) / prod(X - p) computed on the coset g*H of size 2^k.

    `num_coeffs`: (n, 32) Montgomery coeffs of a poly DIVISIBLE by Z_S.
    Returns (n, 32) coeffs of the quotient (top |S| coeffs are zero)."""
    from .domain import domain
    from ..crypto.params import FR_GENERATOR

    n = 1 << k
    assert num_coeffs.shape[0] == n
    evals = coset_ntt(num_coeffs, k)
    # Z_S on the coset, host ints -> inverse evals (tiny |S| work per row
    # done host-side in numpy-int? n rows x |S| muls: do on device instead)
    dom = domain(k)
    zs_inv = _coset_vanishing_inv(tuple(zs_points), k)
    out = F.mul(evals, jnp.asarray(zs_inv))
    return coset_intt(out, k)


def _coset_vanishing_inv(zs_points: tuple, k: int):
    """Montgomery digits of 1 / Z_S(g*omega^i) for i < 2^k, built on device:
    power table of omega (log-doubling), shift by g, subtract each point,
    product over |S| <= 3 factors, one batched inverse."""
    from .domain import domain
    from ..crypto.params import FR_GENERATOR

    dom = domain(k)
    xs = F.mul(
        F.power_table(dom.omega, dom.n),
        jnp.asarray(F.from_int(FR_GENERATOR % R * F.R % R)),
    )
    acc = F.ones_mont((dom.n,))
    for p in zs_points:
        pm = jnp.asarray(F.from_int(p % R * F.R % R))
        acc = F.mul(acc, F.sub(xs, jnp.broadcast_to(pm, xs.shape)))
    return F.batch_inv(acc, axis=0)


# ---------------------------------------------------------------------------
# SHPLONK multiopen
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class Query:
    """One opening claim: poly (coeff form, device) evaluated at point."""

    poly: object  # (n, 32) Montgomery coeffs
    point: int  # host int
    eval: int  # host int (already written to transcript by caller)
    commitment: tuple  # affine ints (for the verifier-side struct)


def _group_by_point_set(queries: list[Query]):
    """Group query indices by the SET of points their poly is opened at."""
    by_poly: dict[int, list[int]] = {}
    for qi, q in enumerate(queries):
        by_poly.setdefault(id(q.poly), []).append(qi)
    groups: dict[frozenset, list[list[int]]] = {}
    for qis in by_poly.values():
        pts = frozenset(queries[qi].point for qi in qis)
        groups.setdefault(pts, []).append(qis)
    return groups


def shplonk_open(srs: Srs, queries: list[Query], transcript) -> None:
    """Prover side.  Appends W1, W2 to the transcript."""
    k = srs.k
    n = 1 << k
    gamma = transcript.squeeze_challenge()

    groups = _group_by_point_set(queries)
    # build h(X) = sum_k gamma^{c_k} (g_k - r_k) / Z_{S_k}
    h = F.zeros((n,))
    c = 0
    group_data = []  # (points, [(weight, query-indices of one poly)...])
    for pts, polys in groups.items():
        pts_l = sorted(pts)
        merged = F.zeros((n,))
        r_vals: dict[int, int] = {p: 0 for p in pts_l}
        members = []
        for qis in polys:
            w = pow(gamma, c, R)
            c += 1
            poly = queries[qis[0]].poly
            wm = jnp.asarray(F.from_int(w * F.R % R))
            merged = F.add(merged, F.mul(poly, wm))
            evals = {queries[qi].point: queries[qi].eval for qi in qis}
            for p in pts_l:
                r_vals[p] = (r_vals[p] + w * evals[p]) % R
            members.append((w, qis))
        # r_k(X): interpolation through (p, r_vals[p])
        r_coeffs = lagrange_interpolate(pts_l, [r_vals[p] for p in pts_l])
        r_dev = jnp.asarray(
            F.from_ints([v * F.R % R for v in r_coeffs] + [0] * (n - len(r_coeffs)))
        )
        num = F.sub(merged, r_dev)
        hk = divide_by_vanishing_coset(num, pts_l, k)
        h = F.add(h, hk)
        group_data.append((pts_l, members, merged, r_vals))

    w1 = srs.commit_affine(h)
    transcript.write_point(w1)
    u = transcript.squeeze_challenge()

    # L(X) = sum_k gamma^{c_k} Z_{S_k}(u)^{-1} (g_k(X) - r_k(u)) - h(X)
    L = F.mul(h, jnp.asarray(F.from_int((R - 1) * F.R % R)))
    for pts_l, members, merged, r_vals in group_data:
        zs_u = 1
        for p in pts_l:
            zs_u = zs_u * (u - p) % R
        zinv = pow(zs_u, -1, R)
        r_coeffs = lagrange_interpolate(pts_l, [r_vals[p] for p in pts_l])
        r_u = host_eval_poly(r_coeffs, u)
        # subtract r_u from the constant coefficient, scale by zinv
        const = F.sub(
            merged[0:1], jnp.asarray(F.from_int(r_u * F.R % R))[None]
        )
        shifted = jnp.concatenate([const, merged[1:]], axis=0)
        zin_m = jnp.asarray(F.from_int(zinv * F.R % R))
        L = F.add(L, F.mul(shifted, zin_m))

    # W2 = [ L(X) / (X - u) ]
    w2_poly = divide_by_vanishing_coset(L, [u], k)
    w2 = srs.commit_affine(w2_poly)
    transcript.write_point(w2)


@dataclasses.dataclass
class VerifierQuery:
    commitment: tuple | None  # affine ints, or None => scalar claim only
    point: int
    eval: int
    # group id: queries with the same `poly_id` belong to one polynomial
    poly_id: int


def shplonk_verify(srs_g2, queries: list[VerifierQuery], transcript) -> bool:
    """Verifier side.  `srs_g2` = (g2, s_g2) host ints.  Reads W1, W2.

    Assembles C_L = sum_k gamma^k Z_{S_k}(u)^{-1} ([g_k] - [r_k(u)]*G) - W1
    and checks e(W2, [s]_2 - u*[1]_2) = e(-C_L, [1]_2) via a 2-pairing
    product (host pairings; verifier cost is negligible, SURVEY.md §6)."""
    g2, s_g2 = srs_g2
    gamma = transcript.squeeze_challenge()

    by_poly: dict[int, list[VerifierQuery]] = {}
    order: list[int] = []
    for q in queries:
        if q.poly_id not in by_poly:
            order.append(q.poly_id)
        by_poly.setdefault(q.poly_id, []).append(q)
    groups: dict[frozenset, list[list[VerifierQuery]]] = {}
    gorder = []
    for pid in order:
        qs = by_poly[pid]
        pts = frozenset(q.point for q in qs)
        if pts not in groups:
            gorder.append(pts)
        groups.setdefault(pts, []).append(qs)

    w1 = transcript.read_point()
    u = transcript.squeeze_challenge()

    # accumulate C_L as (point, scalar) pairs evaluated host-side
    acc = None  # running G1 point (affine ints / None)
    const_scalar = 0  # multiple of G (generator) to subtract
    c = 0
    for pts in gorder:
        pts_l = sorted(pts)
        zs_u = 1
        for p in pts_l:
            zs_u = zs_u * (u - p) % R
        zinv = pow(zs_u, -1, R)
        for qs in groups[pts]:
            w = pow(gamma, c, R)
            c += 1
            evals = {q.point: q.eval for q in qs}
            r_coeffs = lagrange_interpolate(pts_l, [evals[p] for p in pts_l])
            r_u = host_eval_poly(r_coeffs, u)
            scal = w * zinv % R
            acc = host_g1_add(acc, host_g1_mul(qs[0].commitment, scal))
            const_scalar = (const_scalar + scal * r_u) % R
    from ..crypto.params import G1_GEN

    acc = host_g1_add(acc, host_g1_mul(G1_GEN, (R - const_scalar) % R))
    acc = host_g1_add(acc, host_g1_mul(w1, R - 1))  # - W1

    w2 = transcript.read_point()
    # check e(W2, s_g2) * e(u*W2 + C_L, -g2) == 1
    #   <=>  W2 * (s - u) == C_L
    lhs_pt = host_g1_add(host_g1_mul(w2, u), acc)
    neg = lambda p: None if p is None else (p[0], (-p[1]) % FQ_MODULUS)
    return pr.pairing_product_is_one(
        [(w2, s_g2), (neg(lhs_pt), g2)]
    )
