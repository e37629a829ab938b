"""Mesh sharding helpers for the prover's hot paths.

The scaling design SURVEY.md §2.4 calls for: row-sharded polynomial
layout over a device mesh, NTT butterfly stages exchanging via all-to-all
(poly/ntt.py `make_sharded_ntt`), MSM bucket partitions reduced with an
all-gather tree (poly/msm.py `make_sharded_msm`), and here:

  * `make_sharded_commit` — commit MANY coefficient columns against a
    row-sharded SRS: data-parallel over columns, row-parallel over the
    mesh, one all-gather of per-device partial points per column.
  * `make_sharded_prefix_product` — the grand-product scans (permutation
    / lookup Z columns) as a row-sharded two-level scan: local inclusive
    scan, all-gather of block totals, broadcast-corrected prefix — the
    psum-style scan collective the reference's rayon loops become.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..crypto.curve import G1, g1_add
from ..crypto.field import fr
from ..poly.msm import _msm_impl, g1_tree_sum

F = fr()


def make_sharded_commit(mesh: Mesh, axis_name: str, lanes: int = 16):
    """(points row-sharded, scalar-columns (c, n, 32) row-sharded on axis 1)
    -> (c,) commitments, replicated."""

    def body(px, py, pz, scal_cols):
        outs = []
        for ci in range(scal_cols.shape[0]):
            local = G1(*_msm_impl(px, py, pz, scal_cols[ci], lanes))
            gx = jax.lax.all_gather(local.x, axis_name)
            gy = jax.lax.all_gather(local.y, axis_name)
            gz = jax.lax.all_gather(local.z, axis_name)
            s = g1_tree_sum(G1(gx, gy, gz))
            outs.append(s)
        return (
            jnp.stack([o.x for o in outs]),
            jnp.stack([o.y for o in outs]),
            jnp.stack([o.z for o in outs]),
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(None, axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(lambda pts, cols: G1(*fn(pts.x, pts.y, pts.z, cols)))


def make_sharded_prefix_product(mesh: Mesh, axis_name: str):
    """Exclusive prefix product of Montgomery field rows, row-sharded.

    Two-level scan: local inclusive associative scan, all-gather of the
    per-device totals, multiply by the exclusive product of preceding
    devices' totals, then shift right globally (done locally using the
    previous device's total chain)."""

    def body(x_local):
        incl = jax.lax.associative_scan(F._mul, x_local, axis=0)
        total = incl[-1]
        totals = jax.lax.all_gather(total, axis_name)  # (D, 32)
        idx = jax.lax.axis_index(axis_name)
        # exclusive product of totals before this device
        def fold(carry, i):
            t, acc = carry
            take = i < idx
            contrib = jnp.where(take, totals[i], F.ones_mont(()))
            acc = F._mul(acc, contrib)
            return (t, acc), None

        (_, offset), _ = jax.lax.scan(
            fold, (totals, F.ones_mont(())), jnp.arange(totals.shape[0])
        )
        incl = F._mul(incl, offset)
        # exclusive shift within the global array: row i gets product of
        # all rows < i; local row 0 takes the offset itself
        shifted = jnp.concatenate([offset[None], incl[:-1]], axis=0)
        return shifted

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)
