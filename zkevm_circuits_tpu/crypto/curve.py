"""BN254 G1 group ops, vectorized over TPU-friendly digit arrays.

Replaces the curve layer of the reference's external `halo2_proofs` backend
(SURVEY.md §2.3 item 1: G1 curve ops feeding Pippenger MSM).  Points are
Jacobian (X, Y, Z) with each coordinate a Montgomery-form Fq element of
shape ``(..., 32)`` uint8 (see field.py).  Infinity is encoded as Z == 0.

All ops are branch-free (lax.select based) so they vectorize over any batch
shape and are safe inside scans — the property the MSM bucket reductions
rely on.  Formulas are the standard a=0 Jacobian add/double (EFD dbl-2009-l
/ add-2007-bl shapes), re-derived here, not translated from any codebase.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .field import Fp, fq, fr
from .params import G1_GEN, FQ_MODULUS, FR_MODULUS


class G1(NamedTuple):
    """Batch of Jacobian points; coords in Montgomery form, (..., 32) u8."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


F = fq()


def g1_infinity(shape=()) -> G1:
    return G1(F.ones_mont(shape), F.ones_mont(shape), F.zeros(shape))


def g1_from_affine_ints(xy_list) -> G1:
    """Host: list of (x, y) ints (or None for infinity) -> Jacobian batch."""
    xs, ys, zs = [], [], []
    for p in xy_list:
        if p is None:
            xs.append(1)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append(1)
    R = F.R
    q = F.modulus
    to = lambda vals: jnp.asarray(F.from_ints([v * R % q for v in vals]))
    return G1(to(xs), to(ys), to(zs))


def g1_to_affine_ints(p: G1) -> list:
    """Host: Jacobian batch -> list of (x, y) ints or None (infinity)."""
    zinv = F.inv(p.z)
    zinv2 = F.square(zinv)
    zinv3 = F.mul(zinv2, zinv)
    ax = F.from_mont(F.mul(p.x, zinv2))
    ay = F.from_mont(F.mul(p.y, zinv3))
    inf = np.asarray(F.is_zero(p.z)).reshape(-1)
    xs = F.to_ints(np.asarray(ax))
    ys = F.to_ints(np.asarray(ay))
    return [None if i else (x, y) for i, x, y in zip(inf, xs, ys)]


def g1_is_infinity(p: G1):
    return F.is_zero(p.z)


def g1_double(p: G1) -> G1:
    """2P for a=0 curves.  Correct for infinity (Z=0 stays Z=0)."""
    a = F.square(p.x)  # X^2
    b = F.square(p.y)  # Y^2
    c = F.square(b)  # Y^4
    # D = 2((X+B)^2 - A - C)
    d = F.sub(F.sub(F.square(F.add(p.x, b)), a), c)
    d = F.add(d, d)
    e = F.add(F.add(a, a), a)  # 3X^2
    f = F.square(e)
    x3 = F.sub(f, F.add(d, d))
    c8 = F.add(c, c)
    c8 = F.add(c8, c8)
    c8 = F.add(c8, c8)
    y3 = F.sub(F.mul(e, F.sub(d, x3)), c8)
    yz = F.mul(p.y, p.z)
    z3 = F.add(yz, yz)
    return G1(x3, y3, z3)


def g1_add(p: G1, q: G1) -> G1:
    """Complete branch-free Jacobian addition (handles P=Q, ±, infinity)."""
    z1z1 = F.square(p.z)
    z2z2 = F.square(q.z)
    u1 = F.mul(p.x, z2z2)
    u2 = F.mul(q.x, z1z1)
    s1 = F.mul(F.mul(p.y, q.z), z2z2)
    s2 = F.mul(F.mul(q.y, p.z), z1z1)
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)

    h_zero = F.is_zero(h)
    r_zero = F.is_zero(r)
    p_inf = F.is_zero(p.z)
    q_inf = F.is_zero(q.z)

    i = F.square(F.add(h, h))  # (2H)^2
    j = F.mul(h, i)
    rr = F.add(r, r)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.square(rr), j), F.add(v, v))
    s1j = F.mul(s1, j)
    y3 = F.sub(F.mul(rr, F.sub(v, x3)), F.add(s1j, s1j))
    # ((Z1+Z2)^2 - Z1Z1 - Z2Z2) = 2*Z1*Z2
    z3 = F.mul(F.sub(F.sub(F.square(F.add(p.z, q.z)), z1z1), z2z2), h)

    dbl = g1_double(p)
    inf = g1_infinity(h.shape[:-1])

    # selection ladder (later selects override earlier ones):
    same_point = h_zero & r_zero & ~p_inf & ~q_inf
    opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

    def sel(c, a, b):
        return F.select(c, a, b)

    x = sel(same_point, dbl.x, x3)
    y = sel(same_point, dbl.y, y3)
    z = sel(same_point, dbl.z, z3)
    x = sel(opposite, inf.x, x)
    y = sel(opposite, inf.y, y)
    z = sel(opposite, inf.z, z)
    x = sel(p_inf, q.x, x)
    y = sel(p_inf, q.y, y)
    z = sel(p_inf, q.z, z)
    x = sel(q_inf, p.x, x)
    y = sel(q_inf, p.y, y)
    z = sel(q_inf, p.z, z)
    return G1(x, y, z)


def g1_neg(p: G1) -> G1:
    return G1(p.x, F.neg(p.y), p.z)


def g1_select(cond, p: G1, q: G1) -> G1:
    return G1(F.select(cond, p.x, q.x), F.select(cond, p.y, q.y), F.select(cond, p.z, q.z))


def g1_scalar_mul(p: G1, scalar_digits: jnp.ndarray) -> G1:
    """Double-and-add over 256 bits.  scalar_digits: (..., 32) u8 (plain,
    NOT Montgomery — raw little-endian scalar bytes)."""
    import jax

    acc = g1_infinity(p.batch_shape)

    def body2(i, acc):  # bytes MSB-first; bits MSB-first within each byte
        byte = jax.lax.dynamic_index_in_dim(
            scalar_digits, 31 - i, axis=-1, keepdims=False
        ).astype(jnp.int32)

        def bit_step(j, acc):
            acc = g1_double(acc)
            bit = (byte >> (7 - j)) & 1
            added = g1_add(acc, p)
            return g1_select(bit == 1, added, acc)

        return jax.lax.fori_loop(0, 8, bit_step, acc)

    return jax.lax.fori_loop(0, 32, body2, acc)


def g1_generator(shape=()) -> G1:
    pts = g1_from_affine_ints([G1_GEN])
    if shape == ():
        return G1(pts.x[0], pts.y[0], pts.z[0])
    reps = int(np.prod(shape))
    g = g1_from_affine_ints([G1_GEN] * reps)
    return G1(
        g.x.reshape(*shape, 32), g.y.reshape(*shape, 32), g.z.reshape(*shape, 32)
    )


# host-side oracle (pure ints) for tests -----------------------------------
def host_g1_add(p, q, modulus=FQ_MODULUS):
    """Affine int-pair addition oracle; None = infinity."""
    if p is None:
        return q
    if q is None:
        return p
    (x1, y1), (x2, y2) = p, q
    if x1 == x2 and (y1 + y2) % modulus == 0:
        return None
    if p == q:
        lam = (3 * x1 * x1) * pow(2 * y1, -1, modulus) % modulus
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, modulus) % modulus
    x3 = (lam * lam - x1 - x2) % modulus
    y3 = (lam * (x1 - x3) - y1) % modulus
    return (x3, y3)


def host_g1_mul(p, k, modulus=FQ_MODULUS):
    acc = None
    while k:
        if k & 1:
            acc = host_g1_add(acc, p, modulus)
        p = host_g1_add(p, p, modulus)
        k >>= 1
    return acc
