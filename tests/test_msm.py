"""Pippenger MSM vs. host double-and-add oracle.

All local-MSM cases share one (n, lanes) shape so the jitted kernel
compiles once (the EC graphs are compile-heavy on CPU).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkevm_circuits_tpu.crypto import curve as cv
from zkevm_circuits_tpu.crypto.params import FR_MODULUS, G1_GEN, to_digits
from zkevm_circuits_tpu.poly.msm import msm, make_sharded_msm, g1_tree_sum

N = 32
LANES = 4


def _oracle(base, scalars):
    want = None
    for p, s in zip(base, scalars):
        want = cv.host_g1_add(want, cv.host_g1_mul(p, s))
    return want


def _run_case(base, scalars):
    pts = cv.g1_from_affine_ints(base)
    sc = jnp.asarray(np.array([to_digits(s) for s in scalars], np.uint8))
    out = cv.g1_to_affine_ints(jax.tree.map(lambda x: x[None], msm(pts, sc, lanes=LANES)))
    assert out[0] == _oracle(base, scalars)


def test_msm_random_and_edges(rng):
    base = [cv.host_g1_mul(G1_GEN, int(rng.integers(1, 1 << 60))) for _ in range(N)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % FR_MODULUS for _ in range(N)]
    scalars[0] = 0  # zero scalar
    scalars[1] = 1
    scalars[2] = FR_MODULUS - 1
    _run_case(base, scalars)
    # duplicate scalars / duplicate points stress bucket collisions (reuses jit)
    s = 0x1234567890ABCDEF1234567890ABCDEF
    _run_case([base[0]] * N, [s] * N)


def test_tree_sum(rng):
    base = [cv.host_g1_mul(G1_GEN, k + 3) for k in range(5)]
    pts = cv.g1_from_affine_ints(base)
    out = cv.g1_to_affine_ints(jax.tree.map(lambda x: x[None], g1_tree_sum(pts)))
    want = None
    for p in base:
        want = cv.host_g1_add(want, p)
    assert out[0] == want


def test_msm_sharded_matches(rng):
    mesh = jax.make_mesh((8,), ("x",))
    base = [cv.host_g1_mul(G1_GEN, int(rng.integers(1, 1 << 60))) for _ in range(N)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % FR_MODULUS for _ in range(N)]
    pts = cv.g1_from_affine_ints(base)
    sc = jnp.asarray(np.array([to_digits(s) for s in scalars], np.uint8))
    fn = make_sharded_msm(mesh, "x", lanes=LANES)
    got = cv.g1_to_affine_ints(jax.tree.map(lambda x: x[None], fn(pts, sc)))
    assert got[0] == _oracle(base, scalars)


@pytest.mark.slow
def test_msm_grid_matches_oracle(rng):
    """Bucket-grid MSM (the TPU fast path, jnp-add flavour) + the fused
    Pallas add kernel in interpret mode vs the host oracle.  Covers zero
    scalars (masked digit-0 buckets), duplicate points (bucket
    collisions -> in-kernel doubling branch) and infinity padding."""
    from zkevm_circuits_tpu.poly.msm import msm_grid

    n = 24
    base = [cv.host_g1_mul(G1_GEN, int(rng.integers(1, 1 << 60)))
            for _ in range(n - 2)]
    base += [base[0], base[1]]  # duplicate points
    scalars = [int.from_bytes(rng.bytes(40), "little") % FR_MODULUS
               for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    pts = cv.g1_from_affine_ints(base)
    sc = jnp.asarray(np.array([to_digits(s) for s in scalars], np.uint8))
    want = _oracle(base, scalars)
    got = msm_grid(pts, sc, use_pallas=False)
    assert cv.g1_to_affine_ints(jax.tree.map(lambda x: x[None], got))[0] \
        == want
    got2 = msm_grid(pts, sc, use_pallas=True, interpret=True)
    assert cv.g1_to_affine_ints(jax.tree.map(lambda x: x[None], got2))[0] \
        == want
