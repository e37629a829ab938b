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


def _mulstack(lhs: list, rhs: list):
    """One batched Montgomery mul over stacked operands (graph-size saver:
    k independent muls cost one einsum pass instead of k).

    Operands may be 'lazy' int32 digit arrays from `_lazy_add` (digits up
    to 510, value < 2p): the convolution stays float32-exact (510^2 * 32 <
    2^24) and REDC's bound holds ((2p)^2 < p * 2^256 for BN254 moduli).
    """
    a = jnp.stack([x.astype(jnp.int32) for x in lhs], axis=0)
    b = jnp.stack([x.astype(jnp.int32) for x in rhs], axis=0)
    out = F._mul(a, b)
    return [out[i] for i in range(len(lhs))]


def _lazy_add(a, b):
    """Digit-wise add WITHOUT carry/reduction: only valid as a direct input
    to _mulstack (see its contract).  Both inputs must be canonical."""
    return a.astype(jnp.int32) + b.astype(jnp.int32)


def g1_double(p: G1) -> G1:
    """2P for a=0 curves.  Correct for infinity (Z=0 stays Z=0)."""
    a, b, yz = _mulstack([p.x, p.y, p.y], [p.x, p.y, p.z])  # X^2, Y^2, YZ
    xb = _lazy_add(p.x, b)  # digits <= 510 — fine for _mulstack
    e = F._add(F._add(a, a), a)  # 3X^2 (canonical: reused additively below)
    c, xb2, f = _mulstack([b, xb, e], [b, xb, e])  # Y^4, (X+B)^2, E^2
    d = F._sub(F._sub(xb2, a), c)
    d = F._add(d, d)
    x3 = F._sub(f, F._add(d, d))
    c8 = F._add(c, c)
    c8 = F._add(c8, c8)
    c8 = F._add(c8, c8)
    (y3a,) = _mulstack([e], [F._sub(d, x3)])
    y3 = F._sub(y3a, c8)
    z3 = F._add(yz, yz)
    return G1(x3, y3, z3)


def g1_add(p: G1, q: G1) -> G1:
    """Complete branch-free Jacobian addition (handles P=Q, ±, infinity)."""
    z1z1, z2z2 = _mulstack([p.z, q.z], [p.z, q.z])
    u1, u2, a1, a2 = _mulstack(
        [p.x, q.x, p.y, q.y], [z2z2, z1z1, q.z, p.z]
    )
    s1, s2 = _mulstack([a1, a2], [z2z2, z1z1])
    h = F._sub(u2, u1)
    r = F._sub(s2, s1)

    h_zero = F.is_zero(h)
    r_zero = F.is_zero(r)
    p_inf = F.is_zero(p.z)
    q_inf = F.is_zero(q.z)

    h2 = _lazy_add(h, h)
    rr = F._add(r, r)  # canonical: feeds both a mul and a later mul by rr
    zs = _lazy_add(p.z, q.z)
    i, rr2, zs2 = _mulstack([h2, rr, zs], [h2, rr, zs])
    j, v = _mulstack([h, u1], [i, i])
    x3 = F._sub(F._sub(rr2, j), F._add(v, v))
    # ((Z1+Z2)^2 - Z1Z1 - Z2Z2) = 2*Z1*Z2
    y3a, s1j, z3 = _mulstack(
        [rr, s1, F._sub(F._sub(zs2, z1z1), z2z2)], [F._sub(v, x3), j, h]
    )
    y3 = F._sub(y3a, F._add(s1j, s1j))

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


def g1_normalize(p: G1) -> G1:
    """Batch-normalize Jacobian points to affine form (z in {0, mont(1)}):
    one batched inversion over the whole batch.  Infinity rows stay
    (1, 1, 0).  Needed by the MSM grid's affine fast path (SRS layout)."""
    import jax

    flat_z = p.z.reshape(-1, 32)
    zinv = F.batch_inv(flat_z, axis=0).reshape(p.z.shape)
    zinv2 = F.square(zinv)
    zinv3 = F.mul(zinv2, zinv)
    inf = F.is_zero(p.z)
    one = jnp.broadcast_to(jnp.asarray(F.ONE_MONT), p.z.shape).astype(jnp.uint8)
    return G1(
        F.select(inf, p.x, F.mul(p.x, zinv2)),
        F.select(inf, p.y, F.mul(p.y, zinv3)),
        F.select(inf, jnp.zeros_like(p.z), one),
    )


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


# host-side Jacobian bigint MSM --------------------------------------------
# Small MSMs (test-sized domains, transcript-adjacent single commits) are
# dominated by fixed bucket-machinery runtime on the device path; a plain
# Python Pippenger over Jacobian int triples beats it by orders of
# magnitude below ~2^14 points on the CPU backend.  (X, Y, Z) with Z == 0
# is infinity.

def _hj_double(p, m):
    X, Y, Z = p
    if Z == 0:
        return p
    A = X * X % m
    B = Y * Y % m
    C = B * B % m
    D = 2 * ((X + B) * (X + B) - A - C) % m
    E = 3 * A % m
    F_ = E * E % m
    X3 = (F_ - 2 * D) % m
    Y3 = (E * (D - X3) - 8 * C) % m
    Z3 = 2 * Y * Z % m
    return (X3, Y3, Z3)


def _hj_add_mixed(p, q_aff, m):
    """Jacobian + affine (x2, y2)."""
    X1, Y1, Z1 = p
    x2, y2 = q_aff
    if Z1 == 0:
        return (x2, y2, 1)
    Z1Z1 = Z1 * Z1 % m
    U2 = x2 * Z1Z1 % m
    S2 = y2 * Z1 * Z1Z1 % m
    H = (U2 - X1) % m
    r = (S2 - Y1) % m
    if H == 0:
        if r == 0:
            return _hj_double(p, m)
        return (1, 1, 0)
    HH = H * H % m
    HHH = H * HH % m
    V = X1 * HH % m
    X3 = (r * r - HHH - 2 * V) % m
    Y3 = (r * (V - X3) - Y1 * HHH) % m
    Z3 = Z1 * H % m
    return (X3, Y3, Z3)


def _hj_add(p, q, m):
    """Jacobian + Jacobian."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    if Z1 == 0:
        return q
    if Z2 == 0:
        return p
    Z1Z1 = Z1 * Z1 % m
    Z2Z2 = Z2 * Z2 % m
    U1 = X1 * Z2Z2 % m
    U2 = X2 * Z1Z1 % m
    S1 = Y1 * Z2 * Z2Z2 % m
    S2 = Y2 * Z1 * Z1Z1 % m
    H = (U2 - U1) % m
    r = (S2 - S1) % m
    if H == 0:
        if r == 0:
            return _hj_double(p, m)
        return (1, 1, 0)
    HH = H * H % m
    HHH = H * HH % m
    V = U1 * HH % m
    X3 = (r * r - HHH - 2 * V) % m
    Y3 = (r * (V - X3) - S1 * HHH) % m
    Z3 = Z1 * Z2 * H % m
    return (X3, Y3, Z3)


def _hj_to_affine(p, m):
    X, Y, Z = p
    if Z == 0:
        return None
    zi = pow(Z, -1, m)
    zi2 = zi * zi % m
    return (X * zi2 % m, Y * zi2 * zi % m)


def host_msm(points_affine: list, scalars: list[int],
             modulus: int = FQ_MODULUS):
    """Pippenger over host ints: points as (x, y) pairs (None = infinity),
    byte windows MSB-first.  Returns (x, y) or None."""
    m = modulus
    pairs = [
        (p, s) for p, s in zip(points_affine, scalars) if p is not None and s
    ]
    acc = (1, 1, 0)
    for w in range(31, -1, -1):
        if acc[2] != 0:
            for _ in range(8):
                acc = _hj_double(acc, m)
        buckets: dict[int, tuple] = {}
        for p, s in pairs:
            d = (s >> (8 * w)) & 255
            if d:
                cur = buckets.get(d)
                buckets[d] = (
                    _hj_add_mixed(cur, p, m) if cur is not None
                    else (p[0], p[1], 1)
                )
        if not buckets:
            continue
        run = (1, 1, 0)
        wsum = (1, 1, 0)
        for d in range(max(buckets), 0, -1):
            b = buckets.get(d)
            if b is not None:
                run = _hj_add(run, b, m)
            wsum = _hj_add(wsum, run, m)
        acc = _hj_add(acc, wsum, m)
    return _hj_to_affine(acc, m)
