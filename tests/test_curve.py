"""G1 group law vs. a pure-Python affine oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.crypto import curve as cv
from zkevm_circuits_tpu.crypto.params import FR_MODULUS, G1_GEN


def _batch(points):
    return cv.g1_from_affine_ints(points)


def test_generator_on_curve():
    x, y = G1_GEN
    q = cv.FQ_MODULUS
    assert (y * y - x**3 - 3) % q == 0


def test_add_double_vs_oracle():
    # build some multiples of G on the host
    pts = [cv.host_g1_mul(G1_GEN, k) for k in [1, 2, 3, 5, 7, 11, 100, 12345]]
    a = _batch(pts)
    b = _batch(list(reversed(pts)))
    out = cv.g1_to_affine_ints(cv.g1_add(a, b))
    want = [cv.host_g1_add(p, q) for p, q in zip(pts, reversed(pts))]
    assert out == want
    out2 = cv.g1_to_affine_ints(cv.g1_double(a))
    assert out2 == [cv.host_g1_add(p, p) for p in pts]


def test_add_special_cases():
    g = cv.host_g1_mul(G1_GEN, 9)
    neg_g = (g[0], (-g[1]) % cv.FQ_MODULUS)
    pts_a = [g, g, None, g, None]
    pts_b = [g, neg_g, g, None, None]
    out = cv.g1_to_affine_ints(cv.g1_add(_batch(pts_a), _batch(pts_b)))
    want = [cv.host_g1_add(p, q) for p, q in zip(pts_a, pts_b)]
    assert out == want  # includes P+P, P+(-P)=inf, inf+Q, P+inf, inf+inf


def test_scalar_mul():
    ks = [0, 1, 2, 3, (FR_MODULUS - 1), 0xDEADBEEFCAFEBABE]
    g = _batch([G1_GEN] * len(ks))
    from zkevm_circuits_tpu.crypto.params import to_digits

    scal = jnp.asarray(np.array([to_digits(k) for k in ks], np.uint8))
    out = cv.g1_to_affine_ints(cv.g1_scalar_mul(g, scal))
    want = [cv.host_g1_mul(G1_GEN, k) for k in ks]
    assert out == want
