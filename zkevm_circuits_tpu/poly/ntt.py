"""Radix-2 NTT / iNTT over BN254 Fr, vectorized for TPU.

Replaces the reference backend's multicore FFT (external halo2_proofs
`best_fft`; SURVEY.md §2.4 "Sharded NTT").  Design:

  * Single-device kernel: decimation-in-time butterflies after a
    bit-reversal gather.  Each of the k stages is one batched modmul over
    n/2 elements plus add/sub — XLA fuses the digit arithmetic; the whole
    transform is ~k fused VPU/MXU passes over the array.
  * Multi-device: four-step (Bailey) decomposition n = n1*n2 — local NTTs
    along the minor axis, twiddle multiply, a single all_to_all transpose
    over the mesh (ICI), local NTTs again.  See `ntt_sharded`.

Data layout: polynomials are (..., n, 32) uint8 digit arrays (Montgomery),
the transform axis is -2, leading axes are batch (columns transform
together — the SuperCircuit has hundreds of columns, SURVEY.md §2.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.field import fr
from .domain import Domain, domain

F = fr()


def _butterfly_stages(x, twiddles, n):
    """Apply DIT butterfly stages. x: (..., n, 32) bit-reversed input."""
    batch = x.shape[:-2]
    for s, tw in enumerate(twiddles, start=1):
        m = 1 << s
        half = m // 2
        xv = x.reshape(*batch, n // m, m, 32)
        lo = xv[..., :half, :]
        hi = xv[..., half:, :]
        t = F._mul(hi, jnp.asarray(tw))  # broadcast (half, 32) over blocks
        x = jnp.concatenate([F._add(lo, t), F._sub(lo, t)], axis=-2)
        x = x.reshape(*batch, n, 32)
    return x


@functools.partial(jax.jit, static_argnums=(1, 2))
def _ntt_impl(x, k: int, inverse: bool):
    dom = domain(k)
    n = dom.n
    x = jnp.take(x, jnp.asarray(dom.bitrev), axis=-2)
    tws = dom.stage_twiddles_inv if inverse else dom.stage_twiddles
    x = _butterfly_stages(x, tws, n)
    if inverse:
        x = F._mul(x, jnp.asarray(dom.n_inv_mont))
    return x


# public transforms route through the MXU four-step path (ntt_mxu.py) for
# k >= MXU_MIN_K — bit-identical results (equality-tested), ~15-25x faster
# on TPU; the radix-2 ladder below stays as the small-k / sharded-local
# kernel and the differential-testing oracle.
MXU_MIN_K = 4

# On the CPU backend, eager transforms at k >= HOST_MIN_K route to the
# native C++ radix-2 core (native/bn254.cc) — bit-identical (oracle-tested,
# tests/test_hostcore.py), ~35x faster than the XLA:CPU digit kernels at
# k=19 and free of per-shape compiles.  TPU backends never take this path.
HOST_MIN_K = 10


def _host_route(x, k: int):
    """Return the hostcore module when the native CPU path applies."""
    if k < HOST_MIN_K or isinstance(x, jax.core.Tracer):
        return None
    if jax.default_backend() != "cpu":
        return None
    from ..crypto import hostcore

    return hostcore if hostcore.available() else None


def ntt(x, k: int | None = None):
    """coeffs -> evals at H (natural order: index i holds p(omega^i))."""
    k = k if k is not None else int(x.shape[-2]).bit_length() - 1
    assert x.shape[-2] == 1 << k
    hc = _host_route(x, k)
    if hc is not None:
        return hc.ntt(np.asarray(x), k)
    if k >= MXU_MIN_K:
        from .ntt_mxu import ntt_mxu

        return ntt_mxu(x, k)
    return _ntt_impl(x, k, False)


def intt(x, k: int | None = None):
    """evals at H -> coeffs."""
    k = k if k is not None else int(x.shape[-2]).bit_length() - 1
    assert x.shape[-2] == 1 << k
    hc = _host_route(x, k)
    if hc is not None:
        return hc.ntt(np.asarray(x), k, inverse=True)
    if k >= MXU_MIN_K:
        from .ntt_mxu import intt_mxu

        return intt_mxu(x, k)
    return _ntt_impl(x, k, True)


def coset_scale(x, k: int, inverse: bool = False):
    """Multiply coefficient i by g^i (or g^-i): maps evals on H to evals on
    gH when composed with ntt: p(g x) coeffs = coeffs_i * g^i."""
    dom = domain(k)
    pw = dom.coset_powers_inv if inverse else dom.coset_powers
    return F._mul(x, jnp.asarray(pw))


def coset_ntt(x, k: int | None = None):
    """coeffs -> evals on the coset g*H."""
    k = k if k is not None else int(x.shape[-2]).bit_length() - 1
    hc = _host_route(x, k)
    if hc is not None:
        return hc.ntt(np.asarray(x), k, coset=True)
    if k >= MXU_MIN_K:
        from .ntt_mxu import coset_ntt_mxu

        return coset_ntt_mxu(x, k)  # coset scale folded into the matrices
    return ntt(coset_scale(x, k), k)


def coset_intt(x, k: int | None = None):
    """evals on g*H -> coeffs."""
    k = k if k is not None else int(x.shape[-2]).bit_length() - 1
    hc = _host_route(x, k)
    if hc is not None:
        return hc.ntt(np.asarray(x), k, inverse=True, coset=True)
    if k >= MXU_MIN_K:
        from .ntt_mxu import coset_intt_mxu

        return coset_intt_mxu(x, k)
    return coset_scale(intt(x, k), k, inverse=True)


# ---------------------------------------------------------------------------
# Four-step (Bailey) NTT: local form and mesh-sharded form
# ---------------------------------------------------------------------------
def _twiddle_matrix(k1: int, k2: int, inverse: bool) -> np.ndarray:
    """(n1, n2) Montgomery digits of omega_n^(i*j) for the four-step fixup."""
    from ..crypto.params import FR_MODULUS, FR_ROOT_OF_UNITY, FR_TWO_ADICITY

    k = k1 + k2
    r = FR_MODULUS
    w = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), r)
    if inverse:
        w = pow(w, r - 2, r)
    Fr_ = fr()
    n1, n2 = 1 << k1, 1 << k2
    rows = []
    for i in range(n1):
        wi = pow(w, i, r)
        acc, row = 1, []
        for _ in range(n2):
            row.append(acc * Fr_.R % r)
            acc = acc * wi % r
        rows.append(row)
    return np.stack([Fr_.from_ints(row) for row in rows])


@functools.cache
def _twiddle_matrix_cached(k1, k2, inverse):
    return _twiddle_matrix(k1, k2, inverse)


def four_step_ntt_local(x, k: int, inverse: bool = False):
    """Reference four-step NTT on a local (n1, n2, 32) matrix view.

    Equivalent to ntt(flat) with coefficient j = j1*n2 + j2 stored at
    [j1, j2]; returns the flat (n, 32) result in natural order.

    Derivation (j = j1*n2 + j2; output split i = i1 + n1*i2):
      A[i] = Σ_{j2} ω^{j2 i1} ω_{n2}^{j2 i2} ( Σ_{j1} a[j1,j2] ω_{n1}^{j1 i1} )
    (1) n1-point NTT down columns  -> C[i1, j2]
    (2) twiddle ω^{i1 j2}
    (3) n2-point NTT along rows    -> A_hat[i1, i2] = A[i1 + n1*i2]
    (4) transpose to natural order.
    """
    n1, n2 = x.shape[0], x.shape[1]
    k1, k2 = n1.bit_length() - 1, n2.bit_length() - 1
    assert k1 + k2 == k
    y = jnp.swapaxes(x, 0, 1)  # (n2, n1, 32)
    y = _ntt_impl(y, k1, inverse)
    y = jnp.swapaxes(y, 0, 1)  # C[i1, j2]
    tw = jnp.asarray(_twiddle_matrix_cached(k1, k2, inverse))
    y = F._mul(y, tw)
    y = _ntt_impl(y, k2, inverse)  # A_hat[i1, i2]
    return jnp.swapaxes(y, 0, 1).reshape(n1 * n2, 32)


def ntt_shard_body(x_local, tw_local, k: int, n_dev: int, axis_name: str,
                   inverse: bool = False):
    """Four-step NTT body to run INSIDE shard_map.

    Global poly (n, 32) natural-contiguous sharded on axis 0 over `n_dev`
    devices; x_local is this device's (L, 32) shard, L = n/D.  Matrix view
    M[j1, j2] with n1 = D rows (one per device), n2 = L: j = j1*L + j2, so
    row j1 IS device j1's shard.

    tw_local: this device's (L/D, D, 32) shard of the global twiddle table
    T[j2, i1] = omega_n^(j2*i1) (Montgomery), sharded on axis 0.

    Steps (see four_step_ntt_local for the math; here n1 = D):
      T1: all_to_all  -> (D, L/D, 32): all j1, my j2-block.
      S2: D-point NTT over j1 -> C[j2_loc, i1].
      S3: twiddle omega^(j2_global * i1).
      S4: all_to_all  -> (L, 32): all j2, my i1 = d.
      S5: L-point NTT over j2 -> A[d + D*i2] for all i2.
      S6: all_to_all + local transpose -> natural-contiguous shard of A.

    Comm: 3 all_to_alls of L*32 bytes per device — the ICI choreography the
    reference never had (its FFT was single-host multicore, SURVEY.md §2.4).
    """
    D = n_dev
    L = x_local.shape[0]
    kD = D.bit_length() - 1
    kL = L.bit_length() - 1
    assert kD + kL == k

    # T1: piece j2-block e -> device e; recv axis stacks source j1.
    y = x_local.reshape(D, L // D, 32)
    y = jax.lax.all_to_all(y, axis_name, split_axis=0, concat_axis=0)
    y = y.reshape(D, L // D, 32)  # [j1, j2_loc]
    # S2: NTT over j1
    y = jnp.swapaxes(y, 0, 1)  # [j2_loc, j1]
    y = _ntt_impl(y, kD, inverse)  # [j2_loc, i1]
    # S3: twiddles for my j2 block
    y = F._mul(y, tw_local)
    # S4: send i1 = e to device e; recv stacks source j2-blocks in order.
    y = jax.lax.all_to_all(y[:, :, None, :], axis_name, split_axis=1, concat_axis=0)
    y = y.reshape(L, 32)  # [j2_global] for my i1 = d
    # S5: NTT over j2
    y = _ntt_impl(y, kL, inverse)  # A[d + D*i2], indexed by i2
    # S6: natural order: send i2-block e to device e; local [i1, i2_loc]
    y = y.reshape(D, L // D, 32)
    y = jax.lax.all_to_all(y, axis_name, split_axis=0, concat_axis=0)
    y = y.reshape(D, L // D, 32)  # [i1, i2_loc]
    y = jnp.swapaxes(y, 0, 1).reshape(L, 32)  # index = i1 + D*i2_loc
    return y


def sharded_ntt_twiddles(k: int, n_dev: int, inverse: bool = False) -> np.ndarray:
    """Global (L, D, 32) twiddle table T[j2, i1] = omega_n^(j2*i1), to be
    passed to shard_map sharded on axis 0."""
    from ..crypto.params import FR_MODULUS, FR_ROOT_OF_UNITY, FR_TWO_ADICITY

    r = FR_MODULUS
    w = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), r)
    if inverse:
        w = pow(w, r - 2, r)
    n = 1 << k
    L, D = n // n_dev, n_dev
    rows = []
    for j2 in range(L):
        wj = pow(w, j2, r)
        acc, row = 1, []
        for _ in range(D):
            row.append(acc * F.R % r)
            acc = acc * wj % r
        rows.append(F.from_ints(row))
    return np.stack(rows)


def make_sharded_ntt(mesh, axis_name: str, k: int, inverse: bool = False):
    """Build a jitted natural->natural sharded NTT over `mesh[axis_name]`."""
    from jax.sharding import PartitionSpec as P

    D = mesh.shape[axis_name]
    if D == 1:
        return jax.jit(lambda x: _ntt_impl(x, k, inverse))
    tw = jnp.asarray(sharded_ntt_twiddles(k, D, inverse))

    def body(x_local, tw_local):
        return ntt_shard_body(x_local, tw_local, k, D, axis_name, inverse)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(lambda x: fn(x, tw))
