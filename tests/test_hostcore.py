"""Oracle tests for the native host compute core (native/bn254.cc) against
the JAX digit-array kernels and host bigint reference implementations.

The native core carries the CPU-backend prover's hot loops (reference
analogue: halo2_proofs' CPU FFT + Pippenger, SURVEY.md §2.3 item 1), so it
must be bit-exact against the existing paths.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.crypto import hostcore
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R, G1_GEN

pytestmark = pytest.mark.fast

F = fr()


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    if not hostcore.available():
        pytest.skip("native bn254 core not built")


def _rand_mont(rng, n):
    vals = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(n)]
    return F.from_ints([v * F.R % R for v in vals]), vals


def test_ntt_matches_jax():
    import jax.numpy as jnp
    from zkevm_circuits_tpu.poly.ntt import _ntt_impl, coset_ntt, coset_intt

    rng = np.random.default_rng(1)
    k, n = 8, 256
    x, _ = _rand_mont(rng, n)
    want = np.asarray(_ntt_impl(jnp.asarray(x), k, False))
    got = hostcore.ntt(x, k)
    np.testing.assert_array_equal(got, want)
    # inverse round-trips
    back = hostcore.ntt(got, k, inverse=True)
    np.testing.assert_array_equal(back, x)
    # coset forward/inverse vs the JAX path
    want_c = np.asarray(coset_ntt(jnp.asarray(x), k))
    got_c = hostcore.ntt(x, k, coset=True)
    np.testing.assert_array_equal(got_c, want_c)
    back_c = hostcore.ntt(got_c, k, inverse=True, coset=True)
    np.testing.assert_array_equal(back_c, x)


def test_ntt_batched_axes():
    rng = np.random.default_rng(2)
    k, n = 6, 64
    a, _ = _rand_mont(rng, 3 * n)
    stack = a.reshape(3, n, 32)
    got = hostcore.ntt(stack, k)
    for i in range(3):
        np.testing.assert_array_equal(got[i], hostcore.ntt(stack[i], k))


def test_msm_matches_host_bigint():
    from zkevm_circuits_tpu.crypto.curve import host_g1_add, host_msm
    from zkevm_circuits_tpu.crypto.field import fq

    Fq = fq()
    rng = np.random.default_rng(3)
    n = 300
    pts, p = [], G1_GEN
    for _ in range(n):
        pts.append(p)
        p = host_g1_add(p, G1_GEN)
    scalars = [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)]
    want = host_msm(pts, scalars)

    px = np.stack([Fq.from_int(x * Fq.R % Fq.modulus) for x, _ in pts])
    py = np.stack([Fq.from_int(y * Fq.R % Fq.modulus) for _, y in pts])
    sc = np.stack([np.frombuffer(s.to_bytes(32, "little"), np.uint8) for s in scalars])
    got = hostcore.msm(px, py, None, sc[None], scalars_mont=False)[0]
    assert got == want

    # Montgomery-scalar entry point
    sc_m = F.from_ints([s * F.R % R for s in scalars])
    got_m = hostcore.msm(px, py, None, sc_m[None], scalars_mont=True)[0]
    assert got_m == want

    # zmask drops points
    zm = np.ones(n, np.uint8)
    zm[10:20] = 0
    want2 = host_msm(pts[:10] + pts[20:], scalars[:10] + scalars[20:])
    got2 = hostcore.msm(px, py, zm, sc[None], scalars_mont=False)[0]
    assert got2 == want2


def test_msm_zero_and_collisions():
    from zkevm_circuits_tpu.crypto.curve import host_msm
    from zkevm_circuits_tpu.crypto.field import fq

    Fq = fq()
    # duplicate points + tiny scalars stress bucket doubling edge cases
    pts = [G1_GEN] * 8
    scalars = [1, 1, 2, 2, 0, R - 1, 3, 1 << 200]
    want = host_msm(pts, scalars)
    px = np.stack([Fq.from_int(x * Fq.R % Fq.modulus) for x, _ in pts])
    py = np.stack([Fq.from_int(y * Fq.R % Fq.modulus) for _, y in pts])
    sc = np.stack([np.frombuffer((s % R).to_bytes(32, "little"), np.uint8) for s in scalars])
    got = hostcore.msm(px, py, None, sc[None], scalars_mont=False)[0]
    assert got == want
    # all-zero scalars -> infinity
    z = np.zeros_like(sc)
    assert hostcore.msm(px, py, None, z[None], scalars_mont=False)[0] is None


def test_srs_gen_matches_ladder():
    from zkevm_circuits_tpu.crypto.curve import host_g1_mul
    from zkevm_circuits_tpu.crypto.field import fq

    Fq = fq()
    tau = 0xC0FFEE ^ (5 << 32)
    n = 33
    xs, ys = hostcore.srs_gen(n, tau)
    qinv = pow(Fq.R, -1, Fq.modulus)
    for i in [0, 1, 2, 31, 32]:
        want = host_g1_mul(G1_GEN, pow(tau, i, R))
        gx = Fq.to_int(xs[i]) * qinv % Fq.modulus
        gy = Fq.to_int(ys[i]) * qinv % Fq.modulus
        assert (gx, gy) == want


def test_powers():
    got = hostcore.powers(7, 100)
    acc = 1
    for i in range(100):
        assert F.to_int(got[i]) == acc * F.R % R
        acc = acc * 7 % R


def test_field_host_routing():
    """Fp.batch_inv / power_table route to the native core at size >= 2^12
    on the CPU backend and agree with the device path."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("cpu-backend routing test")
    rng = np.random.default_rng(9)
    n = 1 << 12
    x, vals = _rand_mont(rng, n)
    x[5] = 0
    got = np.asarray(F.batch_inv(jnp.asarray(x), axis=0))
    small = np.asarray(F.batch_inv(jnp.asarray(x[:64]), axis=0))
    np.testing.assert_array_equal(got[:64], small)
    pw = np.asarray(F.power_table(12345, n))
    pw_small = np.asarray(F.power_table(12345, 64))
    np.testing.assert_array_equal(pw[:64], pw_small)


import jax.numpy as jnp  # noqa: E402


def test_batch_inv():
    rng = np.random.default_rng(4)
    x, vals = _rand_mont(rng, 50)
    x[7] = 0
    vals[7] = 0
    got = hostcore.batch_inv(x)
    for i, v in enumerate(vals):
        want = 0 if v == 0 else pow(v, -1, R) * F.R % R
        assert F.to_int(got[i]) == want
