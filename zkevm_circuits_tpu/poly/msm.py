"""Pippenger multi-scalar multiplication over BN254 G1, vectorized for TPU.

Replaces the reference backend's multicore MSM (external halo2_proofs
`best_multiexp`; SURVEY.md §2.4 "Sharded Pippenger MSM").  Design:

  * Window size c = 8 bits, aligned with the byte-digit scalar layout, so
    digit extraction is a plain column read — no bit slicing.
  * **Lane-private buckets** (the TPU analogue of GPU thread-private
    buckets): points stream through a lax.scan in blocks of `lanes`;
    each (lane, window) pair owns a private 256-entry bucket array, so a
    step is one conflict-free gather -> wide complete-add -> scatter over
    lanes x 32 windows.  All 32 windows are processed simultaneously as a
    batch axis — there is no window loop.
  * Cross-lane bucket reduction by log-depth halving; bucket weighting
    sum_b b*B_b by an EC suffix scan (Hillis-Steele, one add in the graph);
    final window combine by a Horner lax.scan with an 8x doubling inner
    fori_loop.

Graph size is kept deliberately tiny (~6 complete-add inlines total) —
big-field EC adds are expensive to inline, and XLA compile time scales
with textual op count.  Scalars are (n, 32) uint8 little-endian bytes
(plain, NOT Montgomery).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.curve import G1, g1_add, g1_double, g1_infinity, g1_select
from ..crypto.field import fq

F = fq()
N_WINDOWS = 32
N_BUCKETS = 256  # digits 0..255; bucket 0 is never used by the reduction


def g1_tree_sum(p: G1) -> G1:
    """Sum a (m, ...) batch of points along axis 0 by halving (log depth).

    Graph cost: ceil(log2(m)) complete-add inlines — keep m modest."""
    m = p.x.shape[0]
    pot = 1 << (m - 1).bit_length() if m > 1 else 1
    if pot != m:
        pad = g1_infinity((pot - m, *p.x.shape[1:-1]))
        p = G1(
            jnp.concatenate([p.x, pad.x.astype(p.x.dtype)]),
            jnp.concatenate([p.y, pad.y.astype(p.y.dtype)]),
            jnp.concatenate([p.z, pad.z.astype(p.z.dtype)]),
        )
        m = pot
    while m > 1:
        half = m // 2
        p = g1_add(
            G1(p.x[:half], p.y[:half], p.z[:half]),
            G1(p.x[half:], p.y[half:], p.z[half:]),
        )
        m = half
    return G1(p.x[0], p.y[0], p.z[0])


def _scan_fold(p: G1) -> G1:
    """Fold a (m, ...) batch of points along axis 0 with a sequential
    lax.scan: exactly ONE complete-add inline in the graph (vs log2(m) for
    tree halving).  Work is m wide adds — use where the trailing batch is
    wide enough to keep the VPU busy."""
    init = g1_infinity(p.x.shape[1:-1])

    def fold(acc, lane):
        s = g1_add(G1(*acc), G1(*lane))
        return (s.x, s.y, s.z), None

    (x, y, z), _ = jax.lax.scan(
        fold,
        (init.x.astype(p.x.dtype), init.y.astype(p.y.dtype), init.z.astype(p.z.dtype)),
        (p.x, p.y, p.z),
    )
    return G1(x, y, z)


def _bucket_weighted_sum(buckets: G1) -> G1:
    """sum_b b * B_b over the bucket axis (axis -2 of the batch, size 256).

    Uses the bit decomposition of the weight:  sum_b b*B_b =
    sum_{j<8} 2^j * (sum over buckets with bit j set).  The 8 masked sums
    run as ONE batched log-depth tree (8 add inlines over a (256, 8, W)
    stack, ~2*256*8 adds total), then an 8-step Horner (1 dbl + 1 add
    inline).  O(B) work, tiny graph — vs O(B log B) for a suffix scan."""
    w = buckets.x.shape[:-2]  # window batch dims
    b_idx = jnp.arange(N_BUCKETS)
    bits = ((b_idx[None, :] >> jnp.arange(8)[:, None]) & 1) == 1  # (8, 256)
    inf = g1_infinity((8, *w, N_BUCKETS))
    mask = bits.reshape(8, *([1] * len(w)), N_BUCKETS, 1)

    def masked(coord, infc):
        return jnp.where(mask, coord[None], infc.astype(coord.dtype))

    mx = masked(buckets.x, inf.x)
    my = masked(buckets.y, inf.y)
    mz = masked(buckets.z, inf.z)
    # fold over the bucket axis with a sequential scan: ONE add in the
    # graph (compile-size), 256 steps of an (8, *w)-wide add (runtime-cheap)
    mx = jnp.moveaxis(mx, -2, 0)
    my = jnp.moveaxis(my, -2, 0)
    mz = jnp.moveaxis(mz, -2, 0)
    s = _scan_fold(G1(mx, my, mz))  # (8, *w)

    # Horner over bits, most significant first: acc = 2*acc + S_j
    def horner(j, acc):
        accp = g1_double(G1(*acc))
        i = 6 - j
        out = g1_add(accp, G1(s.x[i], s.y[i], s.z[i]))
        return (out.x, out.y, out.z)

    init = (s.x[7], s.y[7], s.z[7])
    ox, oy, oz = jax.lax.fori_loop(0, 7, horner, init)
    return G1(ox, oy, oz)


def _msm_impl(px, py, pz, scalars_u8, lanes: int):
    n = px.shape[0]
    steps = -(-n // lanes)
    pad = steps * lanes - n
    if pad:
        inf = g1_infinity((pad,))
        px = jnp.concatenate([px, inf.x.astype(px.dtype)])
        py = jnp.concatenate([py, inf.y.astype(py.dtype)])
        pz = jnp.concatenate([pz, inf.z.astype(pz.dtype)])
        scalars_u8 = jnp.concatenate(
            [scalars_u8, jnp.zeros((pad, 32), scalars_u8.dtype)]
        )
    shp = (steps, lanes)
    xs = (
        px.reshape(*shp, 32),
        py.reshape(*shp, 32),
        pz.reshape(*shp, 32),
        scalars_u8.reshape(*shp, 32).astype(jnp.int32),
    )

    acc0 = g1_infinity((lanes, N_WINDOWS, N_BUCKETS))
    lane_i = jnp.arange(lanes)[:, None]
    win_i = jnp.arange(N_WINDOWS)[None, :]

    def step(acc, x):
        ax, ay, az = acc
        bx, by, bz, dig = x  # block: (lanes, 32dig) points, (lanes, 32) digits
        cur = G1(
            ax[lane_i, win_i, dig], ay[lane_i, win_i, dig], az[lane_i, win_i, dig]
        )
        pt = G1(
            jnp.broadcast_to(bx[:, None, :], (lanes, N_WINDOWS, 32)),
            jnp.broadcast_to(by[:, None, :], (lanes, N_WINDOWS, 32)),
            jnp.broadcast_to(bz[:, None, :], (lanes, N_WINDOWS, 32)),
        )
        s = g1_add(cur, pt)
        ax = ax.at[lane_i, win_i, dig].set(s.x)
        ay = ay.at[lane_i, win_i, dig].set(s.y)
        az = az.at[lane_i, win_i, dig].set(s.z)
        return (ax, ay, az), None

    (ax, ay, az), _ = jax.lax.scan(step, (acc0.x, acc0.y, acc0.z), xs)
    buckets = _scan_fold(G1(ax, ay, az))  # reduce lanes -> (32, 256)
    wsum = _bucket_weighted_sum(buckets)  # (32,) window sums

    # Horner from the most significant window down.
    rx, ry, rz = jnp.flip(wsum.x, 0), jnp.flip(wsum.y, 0), jnp.flip(wsum.z, 0)

    def horner(acc, s):
        def dbl(_, q):
            q2 = g1_double(G1(*q))
            return (q2.x, q2.y, q2.z)

        accp = G1(*jax.lax.fori_loop(0, 8, dbl, acc))
        out = g1_add(accp, G1(*s))
        return (out.x, out.y, out.z), None

    (ox, oy, oz), _ = jax.lax.scan(
        horner, (rx[0], ry[0], rz[0]), (rx[1:], ry[1:], rz[1:])
    )
    return ox, oy, oz


@functools.partial(jax.jit, static_argnums=(2,))
def _msm_jit(points: G1, scalars_u8, lanes: int):
    return _msm_impl(points.x, points.y, points.z, scalars_u8, lanes)


# ---------------------------------------------------------------------------
# bucket-grid MSM (the single-chip fast path)
# ---------------------------------------------------------------------------
# Scatter-free Pippenger: per window, argsort the digits and GATHER the
# points into a (256 buckets, S slots) grid padded with infinity — bucket
# sums then reduce by uniform tree halvings (dense vectorized complete
# adds, no scatter, no lane-private bucket arrays).  Each halving level is
# ONE fused Pallas g1_add kernel pass (ops/pallas_curve.py), so the HBM
# traffic per add is coordinate I/O only.  S is the max occupancy of any
# nonzero bucket (one tiny host sync, rounded up to a power of two so jit
# recompiles stay O(log n)); digit-0 points are masked out entirely, so
# zero-heavy scalar vectors (padded polynomials) cost nothing.


def _grid_add(ax, ay, az, bx, by, bz, use_pallas: bool, interpret: bool,
              mode: str = "complete"):
    if use_pallas:
        from ..ops.pallas_curve import g1_add_fused

        return g1_add_fused(ax, ay, az, bx, by, bz, interpret, mode)
    s = g1_add(G1(ax, ay, az), G1(bx, by, bz))
    return s.x, s.y, s.z


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _msm_grid_jit(px, py, pz, idx_all, s_slots: int, use_pallas: bool,
                  interpret: bool = False, distinct: bool = False):
    """px/py/pz: (n+1, 32) u8 with row n = infinity sentinel;
    idx_all: (32, 256, S) int32 HOST-BUILT gather indices (sentinel n for
    empty slots) — building them in numpy removes the 32 device argsorts
    that dominated wall-clock AND compile time."""
    n_win = idx_all.shape[0]
    S = s_slots

    def window_buckets(w, acc):
        idx = jax.lax.dynamic_index_in_dim(idx_all, w, 0, keepdims=False)
        gx = px[idx].reshape(N_BUCKETS * S, 32)
        gy = py[idx].reshape(N_BUCKETS * S, 32)
        gz = pz[idx].reshape(N_BUCKETS * S, 32)
        cur = S
        first = True
        while cur > 1:
            half = cur // 2
            gx = gx.reshape(N_BUCKETS, cur, 32)
            gy = gy.reshape(N_BUCKETS, cur, 32)
            gz = gz.reshape(N_BUCKETS, cur, 32)
            m = N_BUCKETS * half
            # distinct-input mode: level 0 operands are affine SRS points
            # (z in {0, mont(1)}: 6-mul kernel), later levels distinct
            # partial sums (16-mul incomplete kernel).
            mode = ("affine" if first else "incomplete") if distinct \
                else "complete"
            gx, gy, gz = _grid_add(
                gx[:, 0::2].reshape(m, 32), gy[:, 0::2].reshape(m, 32),
                gz[:, 0::2].reshape(m, 32), gx[:, 1::2].reshape(m, 32),
                gy[:, 1::2].reshape(m, 32), gz[:, 1::2].reshape(m, 32),
                use_pallas, interpret, mode,
            )
            cur = half
            first = False
        ax, ay, az = acc
        ax = jax.lax.dynamic_update_index_in_dim(
            ax, gx.reshape(N_BUCKETS, 32), w, 0)
        ay = jax.lax.dynamic_update_index_in_dim(
            ay, gy.reshape(N_BUCKETS, 32), w, 0)
        az = jax.lax.dynamic_update_index_in_dim(
            az, gz.reshape(N_BUCKETS, 32), w, 0)
        return ax, ay, az

    acc0 = g1_infinity((n_win, N_BUCKETS))
    bx, by, bz = jax.lax.fori_loop(
        0, n_win, window_buckets,
        (acc0.x.astype(jnp.uint8), acc0.y.astype(jnp.uint8),
         acc0.z.astype(jnp.uint8)),
    )
    wsum = _bucket_weighted_sum(G1(bx, by, bz))  # (32,) window sums

    rx, ry, rz = jnp.flip(wsum.x, 0), jnp.flip(wsum.y, 0), jnp.flip(wsum.z, 0)

    def horner(acc, s):
        def dbl(_, q):
            q2 = g1_double(G1(*q))
            return (q2.x, q2.y, q2.z)

        accp = G1(*jax.lax.fori_loop(0, 8, dbl, acc))
        out = g1_add(accp, G1(*s))
        return (out.x, out.y, out.z), None

    (ox, oy, oz), _ = jax.lax.scan(
        horner, (rx[0], ry[0], rz[0]), (rx[1:], ry[1:], rz[1:])
    )
    return ox, oy, oz


def _grid_indices_host(scalars_np: np.ndarray):
    """(32, 256, S) gather indices + S, built with numpy (host): per
    window, stable-group point indices by digit; digit-0 and empty slots
    map to the sentinel row n (infinity)."""
    n = scalars_np.shape[0]
    digits = scalars_np.astype(np.int64).T  # (32, n)
    orders = np.argsort(digits, axis=1, kind="stable")
    sorted_d = np.take_along_axis(digits, orders, axis=1)
    # starts[w, b] = first sorted position of digit b in window w
    bvals = np.arange(N_BUCKETS)
    starts = np.stack([
        np.searchsorted(sorted_d[w], bvals) for w in range(digits.shape[0])
    ])
    counts = np.concatenate(
        [starts[:, 1:], np.full((starts.shape[0], 1), n)], axis=1
    ) - starts
    counts[:, 0] = 0  # digit 0 contributes nothing
    maxc = int(counts.max()) if n else 0
    S = 1 << max(3, (maxc - 1).bit_length()) if maxc else 8
    r = np.arange(S)
    pos = np.clip(starts[:, :, None] + r[None, None, :], 0, max(n - 1, 0))
    valid = (r[None, None, :] < counts[:, :, None])
    valid[:, 0, :] = False
    idx = np.where(
        valid, np.take_along_axis(
            orders, pos.reshape(orders.shape[0], -1), axis=1
        ).reshape(pos.shape), n,
    ).astype(np.int32)
    return idx, S


def msm_grid(points: G1, scalars_u8, use_pallas: bool | None = None,
             interpret: bool = False, distinct: bool = False) -> G1:
    """Bucket-grid MSM (eager entry: one host round-trip builds the
    bucket gather indices in numpy).

    distinct=True enables the cheap add kernels (6-mul affine level 0,
    16-mul incomplete above) — REQUIRES all points pairwise distinct and
    affine (z in {0, mont(1)}), the layout of SRS power batches.  The
    default complete kernels have no preconditions."""
    idx, S = _grid_indices_host(np.asarray(scalars_u8))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    inf = g1_infinity((1,))
    px = jnp.concatenate([points.x, inf.x.astype(points.x.dtype)])
    py = jnp.concatenate([points.y, inf.y.astype(points.y.dtype)])
    pz = jnp.concatenate([points.z, inf.z.astype(points.z.dtype)])
    return G1(*_msm_grid_jit(
        px, py, pz, jnp.asarray(idx), S, use_pallas, interpret, distinct
    ))


def default_lanes(n: int) -> int:
    """Pick lane width: wide enough to feed the VPU, small enough that the
    (lanes, 32, 256) private bucket array stays ~100s of MB."""
    return max(1, min(512, 1 << max(0, (n.bit_length() - 4))))


def msm(points: G1, scalars_u8, lanes: int | None = None,
        distinct: bool = False) -> G1:
    """sum_i scalars[i] * points[i] -> single Jacobian point.

    Uses the lane-private scan path everywhere for now.  The bucket-grid
    path (msm_grid: fused Pallas adds, scatter-free reduction) is landed
    and oracle-tested but measured SLOWER end-to-end on-chip at n=2^16 —
    the per-add cost is Montgomery-mul-bound (~24 ns/mul: 9 ns MXU dots
    + 15 ns VPU carry canon, measured), and the grid does 2x the adds of
    the scan.  The ~50x remaining to the 1 Mpoints/s north star lives in
    the mul core (lazy-carry multi-plane dots / K=128-contraction digit
    packing), not the bucket machinery — see NOTES_R5.md.  `distinct` is
    accepted for call-site intent (SRS batches) and forwarded once the
    grid path wins."""
    del distinct
    n = points.x.shape[0]
    lanes = lanes if lanes is not None else default_lanes(n)
    return G1(*_msm_jit(points, scalars_u8, lanes))


def msm_sharded_body(points: G1, scalars_u8, axis_name: str, lanes: int) -> G1:
    """MSM body for shard_map: local Pippenger over this device's slice,
    then an all_gather + log-tree of the D partial results (EC addition is
    not a psum-reducible monoid for XLA; bytes on the wire are negligible —
    one point per device).  SURVEY.md §2.4 'Sharded Pippenger MSM'."""
    local = G1(*_msm_impl(points.x, points.y, points.z, scalars_u8, lanes))
    gx = jax.lax.all_gather(local.x, axis_name)  # (D, 32)
    gy = jax.lax.all_gather(local.y, axis_name)
    gz = jax.lax.all_gather(local.z, axis_name)
    return g1_tree_sum(G1(gx, gy, gz))


def make_sharded_msm(mesh, axis_name: str, lanes: int = 64):
    """natural-sharded points/scalars -> replicated single-point MSM."""
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        lambda px, py, pz, s: msm_sharded_body(G1(px, py, pz), s, axis_name, lanes),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(lambda pts, scal: G1(*fn(pts.x, pts.y, pts.z, scal)))
