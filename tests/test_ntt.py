"""NTT/iNTT vs. naive host DFT; coset transforms; sharded four-step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS
from zkevm_circuits_tpu.poly import ntt as nttmod
from zkevm_circuits_tpu.poly.domain import domain

F = fr()
R = FR_MODULUS


def _host_dft(coeffs, omega, r=R):
    n = len(coeffs)
    return [sum(coeffs[j] * pow(omega, i * j % n, r) for j in range(n)) % r for i in range(n)]


def _rand_poly(rng, k):
    return [int.from_bytes(rng.bytes(40), "little") % R for _ in range(1 << k)]


def test_ntt_vs_naive(rng):
    k = 4
    dom = domain(k)
    coeffs = _rand_poly(rng, k)
    x = F.to_mont(jnp.asarray(F.from_ints(coeffs)))
    evals = F.to_ints(F.from_mont(nttmod.ntt(x)))
    assert evals == _host_dft(coeffs, dom.omega)


def test_intt_roundtrip(rng):
    k = 8
    coeffs = _rand_poly(rng, k)
    x = F.to_mont(jnp.asarray(F.from_ints(coeffs)))
    back = nttmod.intt(nttmod.ntt(x))
    assert F.to_ints(F.from_mont(back)) == coeffs


def test_ntt_batched(rng):
    k = 5
    dom = domain(k)
    polys = [_rand_poly(rng, k) for _ in range(3)]
    x = F.to_mont(jnp.asarray(np.stack([F.from_ints(p) for p in polys])))
    evals = nttmod.ntt(x)
    for i, p in enumerate(polys):
        assert F.to_ints(F.from_mont(evals[i])) == _host_dft(p, dom.omega)


def test_coset_roundtrip_and_values(rng):
    from zkevm_circuits_tpu.crypto.params import FR_GENERATOR

    k = 4
    dom = domain(k)
    coeffs = _rand_poly(rng, k)
    x = F.to_mont(jnp.asarray(F.from_ints(coeffs)))
    ev = nttmod.coset_ntt(x)
    # p(g * omega^i)
    want = [
        sum(c * pow(FR_GENERATOR * pow(dom.omega, i, R) % R, j, R) for j, c in enumerate(coeffs)) % R
        for i in range(1 << k)
    ]
    assert F.to_ints(F.from_mont(ev)) == want
    back = nttmod.coset_intt(ev)
    assert F.to_ints(F.from_mont(back)) == coeffs


def test_four_step_local_matches(rng):
    k = 8
    coeffs = _rand_poly(rng, k)
    x = F.to_mont(jnp.asarray(F.from_ints(coeffs)))
    want = np.asarray(nttmod.ntt(x))
    n1 = 8
    got = np.asarray(nttmod.four_step_ntt_local(x.reshape(n1, (1 << k) // n1, 32), k))
    assert (got == want).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_sharded_ntt_matches(rng, inverse):
    k = 9  # n=512, 8 devices -> L=64
    mesh = jax.make_mesh((8,), ("x",))
    coeffs = _rand_poly(rng, k)
    x = F.to_mont(jnp.asarray(F.from_ints(coeffs)))
    fn = nttmod.make_sharded_ntt(mesh, "x", k, inverse=inverse)
    got = np.asarray(jax.device_get(fn(x)))
    want = np.asarray(nttmod.intt(x) if inverse else nttmod.ntt(x))
    assert (got == want).all()


# ---------------------------------------------------------------------------
# MXU four-step NTT (poly/ntt_mxu.py): must match the butterfly path exactly
# ---------------------------------------------------------------------------
def test_mxu_ntt_matches_butterfly(rng):
    # compare against the radix-2 ladder ORACLE (_ntt_impl / coset_scale),
    # not the public API — which now routes through the MXU path itself
    from zkevm_circuits_tpu.poly import ntt_mxu as mxu

    for k in (4, 7):
        n = 1 << k
        x = np.frombuffer(rng.bytes(n * 32), np.uint8).reshape(n, 32).copy()
        x[:, 31] = 0
        oracle = {
            "ntt": lambda v: nttmod._ntt_impl(v, k, False),
            "intt": lambda v: nttmod._ntt_impl(v, k, True),
            "coset_ntt": lambda v: nttmod._ntt_impl(
                nttmod.coset_scale(v, k), k, False
            ),
            "coset_intt": lambda v: nttmod.coset_scale(
                nttmod._ntt_impl(v, k, True), k, inverse=True
            ),
        }
        mine = {
            "ntt": mxu.ntt_mxu, "intt": mxu.intt_mxu,
            "coset_ntt": mxu.coset_ntt_mxu, "coset_intt": mxu.coset_intt_mxu,
        }
        for name in oracle:
            assert np.array_equal(
                np.asarray(oracle[name](x)), np.asarray(mine[name](x, k))
            ), (k, name)


def test_mxu_ntt_batch_and_roundtrip(rng):
    from zkevm_circuits_tpu.poly import ntt_mxu as mxu

    k, n = 6, 64
    xb = np.frombuffer(rng.bytes(3 * n * 32), np.uint8).reshape(3, n, 32).copy()
    xb[..., 31] = 0
    assert np.array_equal(
        np.asarray(nttmod._ntt_impl(xb, k, False)),
        np.asarray(mxu.ntt_mxu(xb, k)),
    )
    assert np.array_equal(
        np.asarray(mxu.intt_mxu(mxu.ntt_mxu(xb, k), k)), xb
    )
    assert np.array_equal(
        np.asarray(mxu.coset_intt_mxu(mxu.coset_ntt_mxu(xb, k), k)), xb
    )


def test_mxu_redc_bound_regression(rng):
    """Accumulated product sums T < r*p^2 exceed the narrow REDC bound
    T < 2^256*p for r > ~5 — this drove data-dependent wrong results until
    the wide 2^272 REDC landed.  Stress many random vectors at r=16."""
    from zkevm_circuits_tpu.poly import ntt_mxu as mxu

    k, n = 8, 256  # n1=16: accumulation over 16 terms per output
    for _ in range(4):
        x = np.frombuffer(rng.bytes(n * 32), np.uint8).reshape(n, 32).copy()
        x[:, 31] = 0
        assert np.array_equal(
            np.asarray(nttmod._ntt_impl(x, k, False)),
            np.asarray(mxu.ntt_mxu(x, k)),
        )
