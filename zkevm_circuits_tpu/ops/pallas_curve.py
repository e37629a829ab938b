"""Fused Pallas TPU kernels for BN254 G1 Jacobian add/double.

Why: an MSM is ~tens of Montgomery muls per point-add; executed as
separate jnp ops each mul materialises its (B, 1024) digit outer product
plus ~10 carry-canon passes through HBM (~250 KB of traffic per add per
element) — measured 0.02 Mpoints/s on-chip in round 3, ~100x off the
BASELINE.md north star.  These kernels run the ENTIRE complete add
(23 Montgomery muls + all carries + the branch-free selection ladder) in
one VMEM round trip: HBM traffic per add drops to the coordinate I/O
(~1.2 KB/element as int32).

Compute mix per Montgomery mul (see `_mont_mul_hyb`):
  * data x data digit convolution on the VPU as 32 shifted MACs (these
    are the *true* 32x32 schoolbook MACs — a dense-matmul encoding would
    pay a 63x waste on the output dimension);
  * both constant-operand REDC convolutions as dense Toeplitz matmuls on
    the MXU via exact bf16 x bf16 -> f32 dots (operands <= 255);
  * carry canonicalisation (Kogge-Stone) on the VPU.

The EC formulas mirror crypto/curve.py `g1_add`/`g1_double` (complete,
branch-free, a=0 Jacobian — EFD add-2007-bl / dbl-2009-l shapes), so the
same test vectors pin both paths.  Replaces the multicore Pippenger inner
loop of the reference's external halo2_proofs (SURVEY.md §2.3 item 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto.field import ND, fq
from .pallas_field import _add_block, _canon, _cond_sub_p, _dot_u8, _one_at_0

F = fq()

BLK = 128  # rows per block; every grid level reuses this one kernel shape.
# 256 rows overflow VMEM (17.9M > 16M scoped limit: ~23 muls of live
# (B, 63) int32 intermediates) — measured on v5e; 128 leaves headroom.


# ---------------------------------------------------------------------------
# in-kernel field core
# ---------------------------------------------------------------------------
def _conv_data(a32, b32):
    """(B, 32) x (B, 32) int32 -> (B, 63) digit convolution, VPU shifted
    MACs.  Canonical inputs (digits <= 255): products <= 255^2, column
    sums < 2^22 — exact in int32."""
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


def _mont_mul_hyb(a32, b32, np_ref, p_ref, pc):
    """(B, 32) int32 canonical x canonical -> (B, 32) canonical Montgomery
    product.  Data conv on VPU; REDC const convs as MXU Toeplitz dots
    (np_ref: (32, 32) NPINV Toeplitz, p_ref: (32, 63) P Toeplitz — all
    entries <= 255 so the bf16 dots are exact)."""
    t = _conv_data(a32, b32)
    t = _canon(t, 2 * ND, passes=3)
    m = _dot_u8(t[:, :ND], np_ref)
    m = _canon(m, ND, passes=3)
    mp = _dot_u8(m, p_ref)  # (B, 63)
    res = t + jnp.concatenate(
        [mp, jnp.zeros((mp.shape[0], 1), jnp.int32)], axis=1
    )
    res = _canon(res, 2 * ND, passes=3)[:, ND:]
    return _cond_sub_p(res, pc)


def _sub_blk(a32, b32, pd_row, pc):
    """a - b mod p over (B, 32) canonical int32 (pd_row: (1, 32) digits
    of p broadcast-added; see field._sub for the complement identity)."""
    c = a32 + (255 - b32) + pd_row + _one_at_0(a32.shape)
    c = _canon(c, ND, passes=2)
    return _cond_sub_p(c, pc)


def _is_zero_col(x):
    """(B, 32) -> (B, 1) int32 1 iff the row is all-zero digits."""
    return jnp.where(
        jnp.sum(x, axis=1, keepdims=True) == 0,
        jnp.ones((x.shape[0], 1), jnp.int32),
        jnp.zeros((x.shape[0], 1), jnp.int32),
    )


def _sel(c_col, a, b):
    """Row select: c_col (B, 1) in {0,1} -> c ? a : b."""
    return c_col * a + (1 - c_col) * b


def _dbl_core(x1, y1, z1, np_t, p_t, pd, pc):
    """Complete Jacobian doubling (a=0); infinity (z=0) stays infinity."""
    mul = lambda a, b: _mont_mul_hyb(a, b, np_t, p_t, pc)
    add = lambda a, b: _add_block(a, b, pc)
    sub = lambda a, b: _sub_blk(a, b, pd, pc)
    a = mul(x1, x1)
    b = mul(y1, y1)
    yz = mul(y1, z1)
    c = mul(b, b)
    xb = add(x1, b)
    xb2 = mul(xb, xb)
    d = sub(sub(xb2, a), c)
    d = add(d, d)
    e = add(add(a, a), a)
    f = mul(e, e)
    x3 = sub(f, add(d, d))
    c8 = add(c, c)
    c8 = add(c8, c8)
    c8 = add(c8, c8)
    y3 = sub(mul(e, sub(d, x3)), c8)
    z3 = add(yz, yz)
    return x3, y3, z3


def _add_core(x1, y1, z1, x2, y2, z2, np_t, p_t, pd, pc):
    """Complete Jacobian addition: handles P = Q (doubling), P = -Q
    (infinity) and either operand at infinity, branch-free."""
    mul = lambda a, b: _mont_mul_hyb(a, b, np_t, p_t, pc)
    add = lambda a, b: _add_block(a, b, pc)
    sub = lambda a, b: _sub_blk(a, b, pd, pc)
    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(mul(y1, z2), z2z2)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub(u2, u1)
    r = sub(s2, s1)

    h_zero = _is_zero_col(h)
    r_zero = _is_zero_col(r)
    p_inf = _is_zero_col(z1)
    q_inf = _is_zero_col(z2)

    h2 = add(h, h)
    i = mul(h2, h2)
    rr = add(r, r)
    rr2 = mul(rr, rr)
    j = mul(h, i)
    v = mul(u1, i)
    x3 = sub(sub(rr2, j), add(v, v))
    zs = add(z1, z2)
    zs2 = mul(zs, zs)
    z3 = mul(sub(sub(zs2, z1z1), z2z2), h)
    s1j = mul(s1, j)
    y3 = sub(mul(rr, sub(v, x3)), add(s1j, s1j))

    dx, dy, dz = _dbl_core(x1, y1, z1, np_t, p_t, pd, pc)

    one_m = None  # Montgomery one built only if needed for infinity rows
    same = h_zero * r_zero * (1 - p_inf) * (1 - q_inf)
    oppo = h_zero * (1 - r_zero) * (1 - p_inf) * (1 - q_inf)
    x = _sel(same, dx, x3)
    y = _sel(same, dy, y3)
    z = _sel(same, dz, z3)
    # P = -Q -> infinity (z = 0; x/y values are don't-care but keep them
    # canonical non-garbage: reuse x)
    z = _sel(oppo, jnp.zeros_like(z), z)
    x = _sel(p_inf, x2, x)
    y = _sel(p_inf, y2, y)
    z = _sel(p_inf, z2, z)
    x = _sel(q_inf, x1, x)
    y = _sel(q_inf, y1, y)
    z = _sel(q_inf, z1, z)
    del one_m
    return x, y, z


def _add_core_incomplete(x1, y1, z1, x2, y2, z2, np_t, p_t, pd, pc):
    """Jacobian addition WITHOUT the doubling branch (16 muls vs 23).

    Correct when P != Q or either is infinity; P = -Q yields z3 = 0
    (infinity) which IS correct.  P == Q (both non-infinity) silently
    yields infinity — callers must guarantee distinctness (MSM grid
    reduction over distinct SRS points: operands are sums of disjoint
    nonempty subsets of distinct generic points; a collision implies a
    ~2^-254 event or an adversarially crafted SRS, and the prover only
    proves its own statement)."""
    mul = lambda a, b: _mont_mul_hyb(a, b, np_t, p_t, pc)
    add = lambda a, b: _add_block(a, b, pc)
    sub = lambda a, b: _sub_blk(a, b, pd, pc)
    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(mul(y1, z2), z2z2)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub(u2, u1)
    r = sub(s2, s1)
    p_inf = _is_zero_col(z1)
    q_inf = _is_zero_col(z2)
    h2 = add(h, h)
    i = mul(h2, h2)
    rr = add(r, r)
    rr2 = mul(rr, rr)
    j = mul(h, i)
    v = mul(u1, i)
    x3 = sub(sub(rr2, j), add(v, v))
    zs = add(z1, z2)
    zs2 = mul(zs, zs)
    z3 = mul(sub(sub(zs2, z1z1), z2z2), h)
    s1j = mul(s1, j)
    y3 = sub(mul(rr, sub(v, x3)), add(s1j, s1j))
    x = _sel(p_inf, x2, x3)
    y = _sel(p_inf, y2, y3)
    z = _sel(p_inf, z2, z3)
    x = _sel(q_inf, x1, x)
    y = _sel(q_inf, y1, y)
    z = _sel(q_inf, z1, z)
    return x, y, z


def _add_core_affine(x1, y1, z1f, x2, y2, z2f, np_t, p_t, pd, pc):
    """Both operands affine-or-infinity (6 muls): z1f/z2f are the true z
    coordinate columns, REQUIRED to be either Montgomery one (finite,
    affine) or all-zero (infinity) — the layout of SRS point batches.
    Same distinctness contract as `_add_core_incomplete`; P = -Q
    correctly gives infinity (z3 = 2h = 0)."""
    mul = lambda a, b: _mont_mul_hyb(a, b, np_t, p_t, pc)
    add = lambda a, b: _add_block(a, b, pc)
    sub = lambda a, b: _sub_blk(a, b, pd, pc)
    h = sub(x2, x1)
    r = sub(y2, y1)
    p_inf = _is_zero_col(z1f)
    q_inf = _is_zero_col(z2f)
    h2 = add(h, h)
    i = mul(h2, h2)
    rr = add(r, r)
    rr2 = mul(rr, rr)
    j = mul(h, i)
    v = mul(x1, i)
    x3 = sub(sub(rr2, j), add(v, v))
    z3 = add(h, h)
    s1j = mul(y1, j)
    y3 = sub(mul(rr, sub(v, x3)), add(s1j, s1j))
    x = _sel(p_inf, x2, x3)
    y = _sel(p_inf, y2, y3)
    z = _sel(p_inf, z2f, z3)
    x = _sel(q_inf, x1, x)
    y = _sel(q_inf, y1, y)
    z = _sel(q_inf, z1f, z)
    return x, y, z


# ---------------------------------------------------------------------------
# kernels + host wrappers
# ---------------------------------------------------------------------------
def _add_kernel(ax, ay, az, bx, by, bz, np_t, p_t, pd, pc, ox, oy, oz):
    x, y, z = _add_core(
        ax[:], ay[:], az[:], bx[:], by[:], bz[:],
        np_t[:], p_t[:], pd[:], pc[:],
    )
    ox[:] = x
    oy[:] = y
    oz[:] = z


def _add_kernel_incomplete(ax, ay, az, bx, by, bz, np_t, p_t, pd, pc,
                           ox, oy, oz):
    x, y, z = _add_core_incomplete(
        ax[:], ay[:], az[:], bx[:], by[:], bz[:],
        np_t[:], p_t[:], pd[:], pc[:],
    )
    ox[:] = x
    oy[:] = y
    oz[:] = z


def _add_kernel_affine(ax, ay, az, bx, by, bz, np_t, p_t, pd, pc,
                       ox, oy, oz):
    x, y, z = _add_core_affine(
        ax[:], ay[:], az[:], bx[:], by[:], bz[:],
        np_t[:], p_t[:], pd[:], pc[:],
    )
    ox[:] = x
    oy[:] = y
    oz[:] = z


def _dbl_kernel(ax, ay, az, np_t, p_t, pd, pc, ox, oy, oz):
    x, y, z = _dbl_core(ax[:], ay[:], az[:], np_t[:], p_t[:], pd[:], pc[:])
    ox[:] = x
    oy[:] = y
    oz[:] = z


def _const_args():
    return (
        F.NPINV_TOEP.astype(np.int32)[:, :ND],  # (32, 32)
        F.P_TOEP.astype(np.int32),  # (32, 63)
        F.P_DIGITS[None, :].astype(np.int32),
        F.PCOMP_DIGITS[None, :].astype(np.int32),
    )


def _const_specs():
    c = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [c((ND, ND)), c((ND, 2 * ND - 1)), c((1, ND)), c((1, ND))]


_ADD_KERNELS = {
    "complete": _add_kernel,
    "incomplete": _add_kernel_incomplete,
    "affine": _add_kernel_affine,
}


@functools.partial(jax.jit, static_argnums=(6, 7))
def g1_add_fused(ax, ay, az, bx, by, bz, interpret: bool = False,
                 mode: str = "complete"):
    """(n, 32) u8/int32 coordinate arrays -> Jacobian sum, one fused
    kernel pass.  n must be a multiple of BLK (=128) unless n < BLK and a
    multiple of 8.  `mode`: "complete" (23 muls, handles everything),
    "incomplete" (16 muls, distinct-or-infinity operands), "affine"
    (6 muls, z in {0, mont(1)} + distinct-or-infinity)."""
    n = ax.shape[0]
    blk = BLK if n >= BLK else n
    assert n % blk == 0, n
    row = pl.BlockSpec((blk, ND), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _ADD_KERNELS[mode],
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, ND), jnp.int32) for _ in range(3)
        ),
        grid=(n // blk,),
        in_specs=[row] * 6 + _const_specs(),
        out_specs=(row, row, row),
        interpret=interpret,
    )(
        ax.astype(jnp.int32), ay.astype(jnp.int32), az.astype(jnp.int32),
        bx.astype(jnp.int32), by.astype(jnp.int32), bz.astype(jnp.int32),
        *_const_args(),
    )
    return tuple(o.astype(jnp.uint8) for o in outs)


@functools.partial(jax.jit, static_argnums=(3,))
def g1_double_fused(ax, ay, az, interpret: bool = False):
    n = ax.shape[0]
    blk = BLK if n >= BLK else n
    assert n % blk == 0, n
    row = pl.BlockSpec((blk, ND), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _dbl_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, ND), jnp.int32) for _ in range(3)
        ),
        grid=(n // blk,),
        in_specs=[row] * 3 + _const_specs(),
        out_specs=(row, row, row),
        interpret=interpret,
    )(
        ax.astype(jnp.int32), ay.astype(jnp.int32), az.astype(jnp.int32),
        *_const_args(),
    )
    return tuple(o.astype(jnp.uint8) for o in outs)
