"""MXU-native NTT: four-step decomposition with DFT passes as u8 matmuls.

Replaces the butterfly-stage NTT (poly/ntt.py) on the single-chip hot path.
The radix-2 ladder is HBM-bound on TPU (~19 Mbutterflies/s at k=18: every
stage re-streams the whole poly through unfused digit arithmetic).  This
module trades FLOPs for locality the MXU way:

  * n = n1*n2 (four-step / Bailey).  Each pass applies an n_i-point DFT to
    all columns AT ONCE as ONE u8 matrix multiply on the MXU, with the
    digit-convolution folded into the matrix: the DFT matrix W (Montgomery
    digits) is expanded host-side into a digit-Toeplitz block matrix
    What[(i,d),(k,d1)] = digits(W[i,k])[d-d1], so

        T[(i,d), j] = sum_{k,d1} What[(i,d),(k,d1)] * digits(x[k,j])[d1]

    is the full 63-digit convolution column of the field products, already
    summed over digit pairs — ONE (63r x 32r) @ (32r x m) matmul per pass.
  * Exactness: u8 x u8 -> int32 MXU accumulation; worst case
    32r * 255^2 < 2^31 for r <= 1024, so every T digit is exact.
  * Montgomery REDC of T runs as the usual constant-Toeplitz matmuls +
    branch-free carry canonicalisation (crypto/field.py), batched over the
    whole matrix.
  * Scale factors fold into the constant matrices: the coset scale
    g^j = (g^{n2})^{j1} * g^{j2} folds into pass-1 columns + twiddle
    columns (forward), g^{-i} = g^{-i1} * (g^{-n1})^{i2} into twiddle rows
    + pass-2 rows (inverse), and 1/n into the inverse pass-2 matrix — so
    coset (extended-domain) NTTs cost exactly a plain NTT.

Identity (j = j1*n2 + j2, i = i1 + n1*i2):
    A[i] = sum_{j2} w^{i1 j2} w_{n2}^{i2 j2} ( sum_{j1} x[j1,j2] w_{n1}^{i1 j1} )

This is the TPU-idiomatic replacement for the reference's multicore
`best_fft` in external halo2_proofs (SURVEY.md §2.3 item 1, §2.4
"Sharded NTT" — the sharded path composes these passes per shard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.field import ND, fr
from ..crypto.params import (
    FR_GENERATOR,
    FR_MODULUS,
    FR_ROOT_OF_UNITY,
    FR_TWO_ADICITY,
    to_digits,
)

F = fr()
P = FR_MODULUS
G_COSET = FR_GENERATOR  # coset generator, matches poly/domain.py
MAX_RADIX_K = 10  # int32 accumulator exactness bound (r <= 1024)


def _split_k(k: int) -> tuple[int, int]:
    k1 = k // 2
    k2 = k - k1
    assert k2 <= MAX_RADIX_K, f"k={k} > {2 * MAX_RADIX_K}: use the 3-pass path"
    return k1, k2


def _split_k3(k: int) -> tuple[int, int]:
    """k > 2*MAX_RADIX_K: balanced (ka, kb) with the kb part handled by the
    two-pass core — balanced keeps the DFT matrices small (k=22 as
    (8,7,7) needs 132+33+33 MB vs (2,10,10)'s 2x2.1 GB)."""
    ka = k // 3
    kb = k - ka
    assert ka <= MAX_RADIX_K and kb <= 2 * MAX_RADIX_K, (
        f"k={k} > {3 * MAX_RADIX_K} needs 4 passes"
    )
    return ka, kb


def _omega(k: int, inverse: bool) -> int:
    w = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), P)
    return pow(w, P - 2, P) if inverse else w


def _pows(base: int, r: int) -> list[int]:
    out, acc = [], 1
    for _ in range(r):
        out.append(acc)
        acc = acc * base % P
    return out


@functools.cache
def _pass_matrix(r_k: int, w: int, col_scale: int, row_scale: int,
                 scale_all: int) -> np.ndarray:
    """(63r, 32r) u8 digit-Toeplitz matrix of
    W[i,k] = w^{ik} * col_scale^k * row_scale^i * scale_all * 2^16
    (Montgomery; the 2^16 pre-compensates the wide REDC, see _redc)."""
    r = 1 << r_k
    wpow = _pows(w, r)
    cpow = _pows(col_scale % P, r)
    rpow = _pows(row_scale % P, r)
    R_ = F.R
    wdig = np.zeros((r, r, ND), np.uint8)
    for i in range(r):
        ri = rpow[i] * (scale_all % P) % P * R_ % P * SHIFT16 % P
        for kk in range(r):
            wdig[i, kk] = to_digits(wpow[(i * kk) % r] * cpow[kk] % P * ri % P)
    # digit-Toeplitz expansion
    out = np.zeros((r, 63, r, 32), np.uint8)
    wt = np.transpose(wdig, (0, 2, 1))  # (r, 32, r)
    for d1 in range(32):
        out[:, d1 : d1 + 32, :, d1] = wt
    return out.reshape(r * 63, r * 32)


@functools.cache
def _twiddle_table(k: int, inverse: bool, col_scale: int, row_scale: int) -> np.ndarray:
    """(n1, n2, 32) Montgomery digits of
    w^{i1*j2} * col_scale^{j2} * row_scale^{i1}."""
    k1, k2 = _split_k(k)
    n1, n2 = 1 << k1, 1 << k2
    w = _omega(k, inverse)
    rpow = _pows(row_scale % P, n1)
    cpow = _pows(col_scale % P, n2)
    out = np.zeros((n1, n2, ND), np.uint8)
    R_ = F.R
    for i1 in range(n1):
        wi_pows = _pows(pow(w, i1, P), n2)
        ri = rpow[i1] * R_ % P
        for j2 in range(n2):
            out[i1, j2] = to_digits(wi_pows[j2] * cpow[j2] % P * ri % P)
    return out


# Wide REDC: an r-term accumulated product sum T < r*p^2 violates the
# standard REDC bound T < 2^256 * p as soon as r > 2^256/p ~ 5, so the DFT
# passes reduce with R' = 2^(8*RED_D) = 2^272 instead: T < 2^272 * p holds
# up to r = 2^18.  The extra 2^-16 factor is pre-compensated by baking
# 2^16 into the DFT matrices (SHIFT16 below), so outputs remain plain
# Montgomery form: sum(x*W)*R.
RED_D = 34
SHIFT16 = 1 << 16
_NPINV272 = (-pow(P, -1, 1 << (8 * RED_D))) % (1 << (8 * RED_D))


@functools.cache
def _redc34_consts():
    np_dig = [(_NPINV272 >> (8 * i)) & 0xFF for i in range(RED_D)]
    np_toep = np.zeros((RED_D, RED_D), np.float32)
    for i in range(RED_D):
        row = np_dig[: RED_D - i]
        np_toep[i, i : i + len(row)] = row
    p_dig = to_digits(P)
    p_toep = np.zeros((RED_D, RED_D + ND - 1), np.float32)
    for i in range(RED_D):
        p_toep[i, i : i + ND] = p_dig
    return np_toep, p_toep


def _redc(t32):
    """(..., 63) int32 exact digit sums (T < 2^272 * p) -> (..., 32) u8:
    T * 2^-272 mod p, canonical."""
    from ..crypto.field import _canon, _conv_const

    np_toep, p_toep = _redc34_consts()
    width = RED_D + ND  # 66 digits: T + m*p < 2^273 * p < 2^528
    t = _canon(t32, width, passes=4)  # digits < 2^31: one extra split pass
    m = _conv_const(t[..., :RED_D], np_toep)
    m = _canon(m, RED_D, passes=3)
    mp = _conv_const(m, p_toep)  # (..., 65)
    res = t + jnp.concatenate(
        [mp, jnp.zeros(mp.shape[:-1] + (width - mp.shape[-1],), jnp.int32)],
        axis=-1,
    )
    res = _canon(res, width, passes=3)[..., RED_D:]
    return F._cond_sub_p(res).astype(jnp.uint8)


def _use_pallas() -> bool:
    """Fused VMEM REDC/twiddle kernels: default on TPU (validated against
    the jnp path across all variants); ZKEVM_TPU_PALLAS=0 disables."""
    import os

    import jax as _jax

    if os.environ.get("ZKEVM_TPU_PALLAS", "1") == "0":
        return False
    try:
        # "axon" is the remote-TPU tunnel backend: devices are real TPU
        # chips (Mosaic works through remote_compile), so pallas stays on
        return _jax.default_backend() in ("tpu", "axon")
    except Exception:
        # backend init failure (e.g. TPU tunnel down) must not propagate
        # out of a capability probe — callers fall back to the jnp path
        return False


@functools.cache
def _redc34_consts_i32():
    np_toep, p_toep = _redc34_consts()
    # plain numpy: small enough to bake as jit constants (13 KB); device
    # arrays here would leak tracers out of the cache when first touched
    # inside a trace
    return np_toep.astype(np.int32), p_toep.astype(np.int32)


def _dft_pass(x, what, pallas: bool):
    """x: (r, m, 32) u8 -> (r, m, 32) u8 DFT over axis 0 via one matmul;
    the wide REDC runs as a fused VMEM kernel on TPU."""
    r, m, _ = x.shape
    xs = jnp.transpose(x, (0, 2, 1)).reshape(r * ND, m)
    t = jax.lax.dot_general(
        what, xs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # (63r, m)
    t = jnp.transpose(t.reshape(r, 63, m), (0, 2, 1))  # (r, m, 63)
    if pallas:
        from ..ops.pallas_field import redc34

        rows = r * m
        blk = 256 if rows % 256 == 0 else rows
        np34, p34 = _redc34_consts_i32()
        out = redc34(t.reshape(rows, 63), np34, p34, blk=blk)
        return out.reshape(r, m, ND)
    return _redc(t)


@functools.cache
def _gens(k: int, inverse: bool, coset: bool) -> tuple[int, int, int]:
    """(col_gen, row_gen, scale_all) folding coset + 1/n into the
    constants: W_total[i,j] = w^{ij} col_gen^j row_gen^i scale_all."""
    g_inv = pow(G_COSET, P - 2, P)
    col_gen = G_COSET if (coset and not inverse) else 1
    row_gen = g_inv if (coset and inverse) else 1
    scale_all = pow(1 << k, P - 2, P) if inverse else 1
    return col_gen, row_gen, scale_all


def _consts2_np(k: int, inverse: bool, col_gen: int, row_gen: int,
                scale_all: int):
    """Two-pass constants for W[i,j] = w^{ij} col^j row^i scale (host)."""
    k1, k2 = _split_k(k)
    n1, n2 = 1 << k1, 1 << k2
    w = _omega(k, inverse)
    w1 = _pass_matrix(k1, pow(w, n2, P), pow(col_gen, n2, P), 1, 1)
    tw = _twiddle_table(k, inverse, col_gen, row_gen)
    w2 = _pass_matrix(k2, pow(w, n1, P), 1, pow(row_gen, n1, P), scale_all)
    return w1, tw, w2


def _device_consts(k: int, inverse: bool, coset: bool):
    """Upload the pass matrices + twiddle table once per config.  They are
    jit ARGUMENTS, not closure constants: baking ~0.5 GB of DFT matrix into
    the HLO blows up compile payloads (and recompiles per program)."""
    import jax as _jax

    col_gen, row_gen, scale_all = _gens(k, inverse, coset)
    w1, tw, w2 = _consts2_np(k, inverse, col_gen, row_gen, scale_all)
    return (_jax.device_put(w1), _jax.device_put(tw), _jax.device_put(w2))


@functools.cache
def _ab_tables(ka: int, kb: int, inverse: bool, col_gen: int, row_gen: int):
    """Outer twiddle factors of the 3-pass path, factored small:
    T[i1, j'] = row_gen^{i1} * b_{i1}^{j'} with b_{i1} = w^{i1} * col_gen,
    split over j' = j1'*nb2 + j2' into Tb[i1, j1'] (carrying row_gen^{i1})
    and Tc[i1, j2']."""
    k = ka + kb
    w = _omega(k, inverse)
    kb1, kb2 = _split_k(kb)
    na, nb1, nb2 = 1 << ka, 1 << kb1, 1 << kb2
    tb = np.zeros((na, nb1, ND), np.uint8)
    tc = np.zeros((na, nb2, ND), np.uint8)
    R_ = F.R
    for i1 in range(na):
        b = pow(w, i1, P) * col_gen % P
        bb = pow(b, nb2, P)
        acc = pow(row_gen, i1, P)
        for j in range(nb1):
            tb[i1, j] = to_digits(acc * R_ % P)
            acc = acc * bb % P
        acc = 1
        for j in range(nb2):
            tc[i1, j] = to_digits(acc * R_ % P)
            acc = acc * b % P
    return tb, tc


def _device_consts3(k: int, inverse: bool, coset: bool):
    """3-pass (k > 2*MAX_RADIX_K) constants: outer DFT matrix + factored
    outer twiddles + the inner two-pass set (w of order 2^kb is exactly
    _omega(kb): w_global^{na} = root^(2^(S-k) * 2^ka))."""
    import jax as _jax

    ka, kb = _split_k3(k)
    na = 1 << ka
    col_gen, row_gen, scale_all = _gens(k, inverse, coset)
    w = _omega(k, inverse)
    wa = _pass_matrix(ka, pow(w, 1 << kb, P), pow(col_gen, 1 << kb, P), 1, 1)
    tb, tc = _ab_tables(ka, kb, inverse, col_gen, row_gen)
    w1, tw, w2 = _consts2_np(kb, inverse, 1, pow(row_gen, na, P), scale_all)
    return tuple(_jax.device_put(a) for a in (wa, tb, tc, w1, tw, w2))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _ntt_mxu_jit(x, w1, tw, w2, k: int, pallas: bool = False):
    return _two_pass_body(x, w1, tw, w2, k, pallas)


def _two_pass_body(x, w1, tw, w2, k: int, pallas: bool = False):
    k1, k2 = _split_k(k)
    n1, n2 = 1 << k1, 1 << k2
    batch = x.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    y = x.reshape(b, n1, n2, ND)
    # pass 1: DFT_{n1} over j1
    y = jnp.transpose(y, (1, 0, 2, 3)).reshape(n1, b * n2, ND)
    y = _dft_pass(y, w1, pallas).reshape(n1, b, n2, ND)
    # twiddle
    if pallas:
        from ..ops.pallas_field import mont_mul_mxu

        rows = n1 * b * n2
        blk = 256 if rows % 256 == 0 else rows
        tw_full = jnp.broadcast_to(
            tw[:, None, :, :], (n1, b, n2, ND)
        ).reshape(rows, ND)
        y = mont_mul_mxu(y.reshape(rows, ND), tw_full, blk=blk)
        y = y.reshape(n1, b, n2, ND)
    else:
        y = F._mul(y, tw[:, None, :, :])
    # pass 2: DFT_{n2} over j2
    y = jnp.transpose(y, (2, 1, 0, 3)).reshape(n2, b * n1, ND)
    y = _dft_pass(y, w2, pallas).reshape(n2, b, n1, ND)  # [i2, b, i1]
    # natural order: out[j] with j = i1 + n1*i2  (i1 minor)
    return jnp.transpose(y, (1, 0, 2, 3)).reshape(*batch, n1 * n2, ND)


@functools.partial(jax.jit, static_argnums=(7, 8))
def _ntt_mxu3_jit(x, wa, tb, tc, w1, tw, w2, k: int, pallas: bool = False):
    """3-pass four-step: outer DFT_{na} + factored twiddles, then the
    two-pass core over the trailing 2^kb axis (k up to 3*MAX_RADIX_K)."""
    ka, kb = _split_k3(k)
    kb1, kb2 = _split_k(kb)
    na, nb = 1 << ka, 1 << kb
    nb1, nb2 = 1 << kb1, 1 << kb2
    batch = x.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    y = x.reshape(b, na, nb, ND)
    # pass A: DFT_{na} over j1
    y = jnp.transpose(y, (1, 0, 2, 3)).reshape(na, b * nb, ND)
    y = _dft_pass(y, wa, pallas)
    # outer twiddles T[i1, j'] = row^{i1} b_{i1}^{j'}, factored over
    # (j1', j2') to keep the tables tiny
    y = y.reshape(na, b, nb1, nb2, ND)
    y = F._mul(y, tb[:, None, :, None, :])
    y = F._mul(y, tc[:, None, None, :, :])
    # inner two-pass over the trailing nb axis, batched over (na, b)
    y = _two_pass_body(y.reshape(na, b, nb, ND), w1, tw, w2, kb, pallas)
    # natural order: i = i1 + na*i' (i1 minor)
    y = jnp.transpose(y, (1, 2, 0, 3))  # (b, nb, na, ND)
    return y.reshape(*batch, na * nb, ND)


def _ntt_mxu_impl(x, k: int, inverse: bool, coset: bool):
    if k <= 2 * MAX_RADIX_K:
        w1, tw, w2 = _device_consts(k, inverse, coset)
        return _ntt_mxu_jit(x, w1, tw, w2, k, _use_pallas())
    consts = _device_consts3(k, inverse, coset)
    return _ntt_mxu3_jit(x, *consts, k, _use_pallas())


# ---------------------------------------------------------------------------
# public API (mirrors poly/ntt.py)
# ---------------------------------------------------------------------------
def _k_of(x, k):
    k = k if k is not None else int(x.shape[-2]).bit_length() - 1
    assert x.shape[-2] == 1 << k
    return k


def ntt_mxu(x, k: int | None = None):
    """coeffs -> evals at H (natural order)."""
    return _ntt_mxu_impl(x, _k_of(x, k), False, False)


def intt_mxu(x, k: int | None = None):
    """evals at H -> coeffs."""
    return _ntt_mxu_impl(x, _k_of(x, k), True, False)


def coset_ntt_mxu(x, k: int | None = None):
    """coeffs -> evals on the coset gH."""
    return _ntt_mxu_impl(x, _k_of(x, k), False, True)


def coset_intt_mxu(x, k: int | None = None):
    """evals on gH -> coeffs."""
    return _ntt_mxu_impl(x, _k_of(x, k), True, True)
