"""Pallas TPU kernels for BN254 field ops and NTT butterfly stages.

Why: the jnp compute path executes each Montgomery mul / carry-canon as
~12 separate HBM passes (XLA does not fuse through the concatenate-based
Kogge-Stone shifts), so a field add costs ~3ms and an NTT stage ~27ms at
n=2^18 on one chip.  These kernels keep a row-block resident in VMEM and
run the entire butterfly (twiddle mul + add/sub + all carry passes) in
one HBM round trip.

The in-kernel math reuses the exact digit algorithms from crypto/field.py
(one data*data convolution as an MXU matmul; the two constant-operand
convolutions as Toeplitz matmuls; branch-free carry canonicalisation), so
correctness is pinned by the same tests as the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto.field import MASK, ND, M_FULL2, Fp, fr

F = fr()

BLK = 512  # rows per block: outer product (BLK, 1024) f32 = 2 MB VMEM


def _shl(x, s: int):
    if s == 0:
        return x
    return jnp.concatenate([jnp.zeros_like(x[..., :s]), x[..., :-s]], axis=-1)


def _canon(x, width: int, passes: int = 3):
    """Same algorithm as field._canon (docs there), but pure int32
    arithmetic (no bool-register casts — Mosaic rejects them): the OR in
    the Kogge-Stone combine becomes ADD (generate/propagate are disjoint
    per digit), AND becomes multiply."""
    k = x.shape[-1]
    if width > k:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (width - k,), x.dtype)], axis=-1
        )
    elif width < k:
        x = x[..., :width]
    for _ in range(passes):
        x = (x & MASK) + _shl(x >> 8, 1)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    g = jnp.where(x > MASK, one, zero)
    p = jnp.where(x == MASK, one, zero)
    s = 1
    while s < width:
        g = g + p * _shl(g, s)
        p = p * _shl(p, s)
        s <<= 1
    return (x + _shl(g, 1)) & MASK


def _conv_block(a32, b32):
    """(B, 32) x (B, 32) int32 -> (B, 63) digit convolution as 32 shifted
    multiply-adds — 2D-only ops (Mosaic rejects the 3D outer reshape);
    products <= 510^2 and sums < 2^23 stay exact in int32."""
    B = a32.shape[0]
    acc = None
    for i in range(ND):
        prod = a32[:, i : i + 1] * b32  # (B, 32)
        parts = []
        if i:
            parts.append(jnp.zeros((B, i), jnp.int32))
        parts.append(prod)
        if ND - 1 - i:
            parts.append(jnp.zeros((B, ND - 1 - i), jnp.int32))
        term = jnp.concatenate(parts, axis=1)
        acc = term if acc is None else acc + term
    return acc


def _conv_const_block(a32, const_row, out_width: int):
    """(B, 32) int32 conv against a (1, 32) digit-vector operand,
    truncated to out_width digits.  All-integer shifted MACs (the MXU f32
    path is not exact under Mosaic's bf16 pass decomposition, and Mosaic
    rejects closed-over vector constants — the vector arrives via a ref)."""
    B = a32.shape[0]
    acc = None
    for i in range(ND):
        lo = i
        hi = min(i + ND, out_width)
        if hi <= lo:
            break
        prod = a32[:, i : i + 1] * const_row[:, : hi - lo]
        parts = []
        if lo:
            parts.append(jnp.zeros((B, lo), jnp.int32))
        parts.append(prod)
        if out_width - hi:
            parts.append(jnp.zeros((B, out_width - hi), jnp.int32))
        term = jnp.concatenate(parts, axis=1)
        acc = term if acc is None else acc + term
    return acc


def _mont_mul_block(a32, b32, np_row, p_row, pcomp):
    """(BLK, 32) int32 x int32 -> (BLK, 32) int32 Montgomery product < p."""
    t = _conv_block(a32, b32)
    t = _canon(t, 2 * ND)
    m = _conv_const_block(t[:, :ND], np_row, ND)
    m = _canon(m, ND)
    mp = _conv_const_block(m, p_row, 2 * ND - 1)
    res = t + jnp.concatenate(
        [mp, jnp.zeros((mp.shape[0], 1), jnp.int32)], axis=-1
    )
    res = _canon(res, 2 * ND)[:, ND:]
    return _cond_sub_p(res, pcomp)


def _cond_sub_p(c, pcomp):
    s = c + pcomp
    s = _canon(s, ND + 1, passes=1)
    ge = s[:, ND : ND + 1]  # 0 or 1
    return ge * s[:, :ND] + (1 - ge) * c


def _add_block(a32, b32, pcomp):
    c = _canon(a32 + b32, ND + 1, passes=1)[:, :ND]
    return _cond_sub_p(c, pcomp)


def _one_at_0(shape):
    """[1, 0, ..., 0] broadcast to shape — built from iota in-kernel
    (Mosaic rejects closed-over vector constants)."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(col == 0, jnp.ones(shape, jnp.int32), jnp.zeros(shape, jnp.int32))


def _sub_block(a32, b32, pdig, pcomp):
    c = a32 + (MASK - b32) + pdig + _one_at_0(a32.shape)
    c = _canon(c, ND, passes=2)
    return _cond_sub_p(c, pcomp)


def _const_specs():
    """BlockSpecs for the replicated (1, 32) digit-vector operands
    (NPINV_DIGITS, P_DIGITS, PCOMP_DIGITS)."""
    one = pl.BlockSpec((1, ND), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [one, one, one]


def _const_args(f: Fp):
    return (
        f.NPINV_DIGITS[None, :].astype(np.int32),
        f.P_DIGITS[None, :].astype(np.int32),
        f.PCOMP_DIGITS[None, :].astype(np.int32),
    )


def _mul_kernel(a_ref, b_ref, np_ref, pd_ref, pc_ref, o_ref):
    o_ref[:] = _mont_mul_block(
        a_ref[:], b_ref[:], np_ref[:], pd_ref[:], pc_ref[:]
    )


@functools.partial(jax.jit, static_argnums=(2,))
def mont_mul(a, b, field: Fp | None = None):
    """(n, 32) u8 Montgomery mul via one fused VMEM kernel per block.

    I/O crosses the kernel boundary as int32 (Mosaic's u8 vector support
    is limited); the cheap casts run in XLA outside."""
    f = field or F
    n = a.shape[0]
    assert n % BLK == 0, n
    row = pl.BlockSpec((BLK, ND), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((n, ND), jnp.int32),
        grid=(n // BLK,),
        in_specs=[row, row] + _const_specs(),
        out_specs=row,
    )(a.astype(jnp.int32), b.astype(jnp.int32), *_const_args(f))
    return out.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# fused butterfly stage: out_lo = lo + hi*tw, out_hi = lo - hi*tw
# ---------------------------------------------------------------------------
def _butterfly_kernel(lo_ref, hi_ref, tw_ref, np_ref, pd_ref, pc_ref,
                      olo_ref, ohi_ref):
    lo = lo_ref[:]
    pc = pc_ref[:]
    pd = pd_ref[:]
    t = _mont_mul_block(hi_ref[:], tw_ref[:], np_ref[:], pd, pc)
    olo_ref[:] = _add_block(lo, t, pc)
    ohi_ref[:] = _sub_block(lo, t, pd, pc)


@functools.partial(jax.jit, static_argnums=(3,))
def butterfly_stage(lo, hi, tw, field: Fp | None = None):
    """One radix-2 DIT stage over paired row arrays.

    lo, hi: (rows, 32) u8 — already laid out so row r of lo pairs with row
    r of hi; tw: (rows, 32) u8 twiddles (pre-broadcast by the caller).
    Returns (lo + hi*tw, lo - hi*tw)."""
    f = field or F
    n = lo.shape[0]
    blk = min(BLK, n)
    assert n % blk == 0
    spec = pl.BlockSpec((blk, ND), lambda i: (i, 0), memory_space=pltpu.VMEM)
    olo, ohi = pl.pallas_call(
        _butterfly_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, ND), jnp.int32),
            jax.ShapeDtypeStruct((n, ND), jnp.int32),
        ),
        grid=(n // blk,),
        in_specs=[spec, spec, spec] + _const_specs(),
        out_specs=(spec, spec),
    )(
        lo.astype(jnp.int32), hi.astype(jnp.int32), tw.astype(jnp.int32),
        *_const_args(f),
    )
    return olo.astype(jnp.uint8), ohi.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# MXU-exact kernels: every convolution is a bf16 x bf16 -> f32 dot with
# operands <= 255 (EXACT on the MXU; Mosaic's f32 HIGHEST is NOT exact
# in-kernel — probed).  Values above 255 are split into 8-bit halves.
# ---------------------------------------------------------------------------
def _dot_u8(a32, m32):
    """(B, K) x (K, N) int32 with all entries <= 255 -> exact int32."""
    return jax.lax.dot_general(
        a32.astype(jnp.bfloat16), m32.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _dot_split(vals32, m32):
    """(B, K) int32 (entries < 2^16) x 0/255 matrix -> exact int32 via
    8-bit half splits."""
    hi = vals32 >> 8
    lo = vals32 & MASK
    return _dot_u8(hi, m32) * 256 + _dot_u8(lo, m32)


def _redc34_kernel(t_ref, np_ref, p_ref, pc_ref, o_ref):
    """(BLK, 63) int32 exact digit sums (T < 2^272*p) -> (BLK, 32) int32
    canonical T * 2^-272 mod p (the NTT-side wide REDC, see ntt_mxu._redc)."""
    t = _canon(t_ref[:], 66, passes=4)
    m = _dot_u8(t[:, :34], np_ref[:])
    m = _canon(m, 34, passes=3)
    mp = _dot_u8(m, p_ref[:])  # (BLK, 65)
    res = t + jnp.concatenate(
        [mp, jnp.zeros((mp.shape[0], 1), jnp.int32)], axis=1
    )
    res = _canon(res, 66, passes=3)[:, 34:]
    o_ref[:] = _cond_sub_p(res, pc_ref[:])


def redc34(t32, np34_toep, p34_toep, blk: int = 256):
    """(rows, 63) int32 -> (rows, 32) uint8, fused VMEM wide-REDC."""
    rows = t32.shape[0]
    assert rows % blk == 0, rows
    spec_in = pl.BlockSpec((blk, 63), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((blk, ND), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cnp = pl.BlockSpec((34, 34), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cp = pl.BlockSpec((34, 65), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cpc = pl.BlockSpec((1, ND), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _redc34_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, ND), jnp.int32),
        grid=(rows // blk,),
        in_specs=[spec_in, cnp, cp, cpc],
        out_specs=spec_out,
    )(t32, np34_toep, p34_toep, F.PCOMP_DIGITS[None, :].astype(np.int32))
    return out.astype(jnp.uint8)


def _mont_mul_mxu_kernel(a_ref, b_ref, erep_ref, etile_ref, mfull_ref,
                         np_ref, p_ref, pc_ref, o_ref):
    """Montgomery product via MXU dots: outer-product digit pairs (split
    into 8-bit halves) against the 0/1 anti-diagonal matrix, then REDC
    with constant-Toeplitz dots.  The (BLK, 1024) digit-pair expansion is
    built with 0/1 expansion matmuls (explicit semantics; pltpu.repeat
    layouts are not what we need)."""
    a = a_ref[:]
    b = b_ref[:]
    blk = a.shape[0]
    a_rep = _dot_u8(a, erep_ref[:])  # [i, 32j+k] = a[i, j]
    b_tile = _dot_u8(b, etile_ref[:])  # [i, 32j+k] = b[i, k]
    prod = a_rep * b_tile  # <= 255^2
    t = _dot_split(prod, mfull_ref[:])  # (BLK, 63) exact
    t = _canon(t, 2 * ND, passes=3)
    m = _dot_u8(t[:, :ND], np_ref[:])
    m = _canon(m, ND, passes=3)
    mp = _dot_u8(m, p_ref[:])  # (BLK, 63)
    res = t + jnp.concatenate(
        [mp, jnp.zeros((blk, 1), jnp.int32)], axis=1
    )
    res = _canon(res, 2 * ND, passes=3)[:, ND:]
    o_ref[:] = _cond_sub_p(res, pc_ref[:])


@functools.cache
def _expansion_mats():
    """E_rep[j, 32j+k] = 1 (a_rep) and E_tile[k, 32j+k] = 1 (b_tile)."""
    erep = np.zeros((ND, ND * ND), np.int32)
    etile = np.zeros((ND, ND * ND), np.int32)
    for j in range(ND):
        for k in range(ND):
            erep[j, ND * j + k] = 1
            etile[k, ND * j + k] = 1
    return erep, etile


def mont_mul_mxu(a, b, blk: int = 256):
    """(rows, 32) u8 x u8 Montgomery mul, one fused VMEM+MXU kernel."""
    rows = a.shape[0]
    assert rows % blk == 0, rows
    row = pl.BlockSpec((blk, ND), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ce = pl.BlockSpec((ND, ND * ND), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cm = pl.BlockSpec((ND * ND, 63), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cnp = pl.BlockSpec((ND, ND), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cp = pl.BlockSpec((ND, 63), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cpc = pl.BlockSpec((1, ND), lambda i: (0, 0), memory_space=pltpu.VMEM)
    erep, etile = _expansion_mats()
    mfull = M_FULL2.astype(np.int32)
    np_t = F.NPINV_TOEP.astype(np.int32)
    p_t = F.P_TOEP.astype(np.int32)
    out = pl.pallas_call(
        _mont_mul_mxu_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, ND), jnp.int32),
        grid=(rows // blk,),
        in_specs=[row, row, ce, ce, cm, cnp, cp, cpc],
        out_specs=row,
    )(
        a.astype(jnp.int32), b.astype(jnp.int32), erep, etile, mfull, np_t,
        p_t, F.PCOMP_DIGITS[None, :].astype(np.int32),
    )
    return out.astype(jnp.uint8)
