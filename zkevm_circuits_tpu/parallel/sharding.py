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

from ..crypto.curve import G1, g1_add, g1_to_affine_ints
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


def make_sharded_prefix_sum(mesh: Mesh, axis_name: str):
    """Exclusive prefix SUM of Montgomery field rows, row-sharded.

    Same two-level structure as `make_sharded_prefix_product` with
    (add, 0) instead of (mul, 1) — the logUp running-sum phi column."""

    def body(x_local):
        incl = jax.lax.associative_scan(F._add, x_local, axis=0)
        total = incl[-1]
        totals = jax.lax.all_gather(total, axis_name)  # (D, 32)
        idx = jax.lax.axis_index(axis_name)

        def fold(carry, i):
            t, acc = carry
            contrib = jnp.where(i < idx, totals[i], F.zeros(()))
            acc = F._add(acc, contrib)
            return (t, acc), None

        (_, offset), _ = jax.lax.scan(
            fold, (totals, F.zeros(())), jnp.arange(totals.shape[0])
        )
        incl = F._add(incl, offset)
        shifted = jnp.concatenate([offset[None], incl[:-1]], axis=0)
        return shifted

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)


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


# ---------------------------------------------------------------------------
# ProverMesh: the bundle of sharded hot ops prove() swaps in
# ---------------------------------------------------------------------------
class ProverMesh:
    """Device-mesh execution context for `plonk.prover.prove(mesh=...)`.

    Replaces the prover's four hot primitives with row-sharded versions
    (SURVEY.md §2.4 "TPU-native equivalents"; the reference backend is
    single-host multicore and has no analogue):

      * iNTT at k and coset NTT/iNTT at k_ext — four-step decomposition,
        3 all_to_alls over ICI per transform (`poly.ntt.make_sharded_ntt`)
      * column commitments — per-device partial Pippenger MSM over a
        row-sharded SRS + all_gather tree reduction
      * permutation / lookup grand products and the logUp running sum —
        two-level scans (local associative_scan + all_gather of totals)

    All ops are exact field arithmetic, so an N-device proof is
    byte-identical to the 1-device proof given the same blinding rng
    (asserted by tests/test_sharded_prove.py).
    """

    def __init__(self, mesh: Mesh, axis_name: str, k: int, k_ext: int,
                 srs, lanes: int = 4):
        from ..poly.domain import domain
        from ..poly.ntt import make_sharded_ntt
        from jax.sharding import AxisType

        # coerce to Auto axis types: jax.make_mesh defaults to Explicit
        # mode, whose strict out-sharding rules reject the prover's eager
        # field ops (scatter in F._sub etc.); Auto = classic GSPMD
        if any(t != AxisType.Auto for t in mesh.axis_types):
            mesh = Mesh(
                mesh.devices, mesh.axis_names,
                axis_types=(AxisType.Auto,) * len(mesh.axis_names),
            )
        self.mesh, self.axis = mesh, axis_name
        self.sh = NamedSharding(mesh, P(axis_name))
        self.k, self.k_ext = k, k_ext
        D = mesh.shape[axis_name]
        assert (1 << k) // D >= D, (
            f"four-step layout needs n/D >= D (k={k}, D={D})"
        )
        self._intt_k = make_sharded_ntt(mesh, axis_name, k, inverse=True)
        self._ntt_ext = make_sharded_ntt(mesh, axis_name, k_ext)
        self._intt_ext = make_sharded_ntt(mesh, axis_name, k_ext, inverse=True)
        self._pprod = make_sharded_prefix_product(mesh, axis_name)
        self._psum = make_sharded_prefix_sum(mesh, axis_name)
        dext = domain(k_ext)
        # plain (unsharded) device arrays: explicit shardings leak into
        # downstream jits that are not in a mesh context ("device
        # assignment 1 != mesh size" errors); jit reshards them per the
        # shard_map in_specs as needed
        self._coset_pw = jnp.asarray(np.asarray(dext.coset_powers))
        self._coset_pw_inv = jnp.asarray(np.asarray(dext.coset_powers_inv))
        self._srs = srs
        n = 1 << k
        self._pts = G1(
            jnp.asarray(np.asarray(srs.g1_powers.x[:n])),
            jnp.asarray(np.asarray(srs.g1_powers.y[:n])),
            jnp.asarray(np.asarray(srs.g1_powers.z[:n])),
        )
        self._commit = make_sharded_commit(mesh, axis_name, lanes=lanes)

    # -- transforms -------------------------------------------------------
    def _map_cols(self, fn, x):
        if x.ndim == 3:
            return jnp.stack([fn(x[i]) for i in range(x.shape[0])])
        return fn(x)

    def intt(self, x, k: int | None = None):
        assert k is None or k == self.k
        return self._map_cols(self._intt_k, x)

    def coset_ntt_ext(self, coeffs):
        """coeffs (.., n_ext, 32) -> evals on g*H_ext."""
        return self._map_cols(
            lambda c: self._ntt_ext(F._mul(c, self._coset_pw)), coeffs
        )

    def coset_intt_ext(self, evals):
        return self._map_cols(
            lambda e: F._mul(self._intt_ext(e), self._coset_pw_inv), evals
        )

    # -- commitments ------------------------------------------------------
    def commit_affine(self, coeffs):
        """(n, 32) Montgomery coeffs -> affine (x, y) int pair.

        CPU backend at test scale routes to the host bigint Pippenger
        (same shortcut as Srs.commit_affine: XLA-CPU takes >10 min to
        compile the SPMD EC bucket graph, and the sharded-MSM kernel is
        already oracle-tested by tests/test_msm.py); the TPU backend
        always uses the per-device partial MSM + all_gather tree."""
        if jax.default_backend() == "cpu" and coeffs.shape[0] <= (1 << 14):
            return self._srs.commit_affine(coeffs)
        plain = F.from_mont(coeffs)
        out = self._commit(self._pts, plain[None])
        return g1_to_affine_ints(out)[0]

    # -- grand products / running sums -------------------------------------
    def exclusive_prefix_product(self, ratio, u: int, n: int):
        row = jnp.arange(n)
        ratio = F.select(row < u, ratio, F.ones_mont((n,)))
        return self._pprod(ratio)

    def exclusive_prefix_sum(self, delta):
        return self._psum(delta)
