"""KZG SRS + SHPLONK multiopen round-trip tests (tiny k; compile-bound)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R, G1_GEN
from zkevm_circuits_tpu.crypto.curve import g1_to_affine_ints, host_g1_mul
from zkevm_circuits_tpu.poly.kzg import (
    Query,
    Srs,
    VerifierQuery,
    eval_at,
    host_eval_poly,
    shplonk_open,
    shplonk_verify,
)
from zkevm_circuits_tpu.poly.transcript import Blake2bReader, Blake2bTranscript

F = fr()
K = 3
N = 1 << K


@pytest.fixture(scope="module")
def srs():
    return Srs.unsafe_setup(K, tau=123456789)


def _rand_poly(rng, n=N):
    vals = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
    mont = F.from_ints([v * F.R % R for v in vals])
    return vals, jnp.asarray(mont)


def test_commit_matches_tau_eval(srs, rng):
    vals, poly = _rand_poly(rng)
    c = g1_to_affine_ints(srs.commit(poly))[0]
    expect = host_g1_mul(G1_GEN, host_eval_poly(vals, 123456789))
    assert c == expect


def test_eval_at(srs, rng):
    vals, poly = _rand_poly(rng)
    x = 0xDEADBEEF
    assert eval_at(poly, x) == host_eval_poly(vals, x)


def test_shplonk_roundtrip(srs, rng):
    # two polys opened at shared point x, one also at a second point wx
    vals_a, pa = _rand_poly(rng)
    vals_b, pb = _rand_poly(rng)
    x, wx = 0x1234, 0x5678
    ca = g1_to_affine_ints(srs.commit(pa))[0]
    cb = g1_to_affine_ints(srs.commit(pb))[0]

    ea_x = host_eval_poly(vals_a, x)
    eb_x = host_eval_poly(vals_b, x)
    eb_wx = host_eval_poly(vals_b, wx)

    t = Blake2bTranscript()
    for e in (ea_x, eb_x, eb_wx):
        t.write_scalar(e)
    queries = [
        Query(pa, x, ea_x, ca),
        Query(pb, x, eb_x, cb),
        Query(pb, wx, eb_wx, cb),
    ]
    shplonk_open(srs, queries, t)
    proof = bytes(t.proof)

    rd = Blake2bReader(proof)
    ea_x_r = rd.read_scalar()
    eb_x_r = rd.read_scalar()
    eb_wx_r = rd.read_scalar()
    vq = [
        VerifierQuery(ca, x, ea_x_r, poly_id=0),
        VerifierQuery(cb, x, eb_x_r, poly_id=1),
        VerifierQuery(cb, wx, eb_wx_r, poly_id=1),
    ]
    assert shplonk_verify((srs.g2, srs.s_g2), vq, rd)

    # corrupted eval must fail
    rd2 = Blake2bReader(proof)
    rd2.read_scalar(), rd2.read_scalar(), rd2.read_scalar()
    vq_bad = [
        VerifierQuery(ca, x, (ea_x_r + 1) % R, poly_id=0),
        VerifierQuery(cb, x, eb_x_r, poly_id=1),
        VerifierQuery(cb, wx, eb_wx_r, poly_id=1),
    ]
    assert not shplonk_verify((srs.g2, srs.s_g2), vq_bad, rd2)
