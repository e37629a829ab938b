"""3-pass MXU NTT (k > 2*MAX_RADIX_K) vs the radix-2 oracle.

Production degrees k=21..26 (BASELINE.md: inner k=20 => k_ext>=22,
compression k=22-26) exceed the two-pass int32-exactness bound; the
3-pass path splits k = ka + kb and runs the two-pass core on kb.  Testing
at real k=21 is too slow on CPU, so MAX_RADIX_K is monkeypatched down to
force the 3-pass decomposition at tiny k against the butterfly oracle.
"""

import numpy as np
import pytest

import zkevm_circuits_tpu.poly.ntt_mxu as ntt_mxu
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.poly.ntt import _ntt_impl, coset_scale

F = fr()
K = 8  # with MAX_RADIX_K=3: ka=2, kb=6 -> (2,3,3) splits


@pytest.fixture
def small_radix(monkeypatch):
    monkeypatch.setattr(ntt_mxu, "MAX_RADIX_K", 3)
    yield


def _rand_poly(rng, n):
    x = np.frombuffer(rng.bytes(n * 32), np.uint8).reshape(n, 32).copy()
    x[:, 31] = 0
    return x


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("coset", [False, True])
def test_three_pass_matches_oracle(rng, small_radix, inverse, coset):
    n = 1 << K
    x = _rand_poly(rng, n)
    consts = ntt_mxu._device_consts3(K, inverse, coset)
    got = np.asarray(ntt_mxu._ntt_mxu3_jit(x, *consts, K, False))

    ref = x
    if coset and not inverse:
        ref = coset_scale(ref, K)
    ref = _ntt_impl(ref, K, inverse)
    if coset and inverse:
        ref = coset_scale(ref, K, inverse=True)
    ref = np.asarray(ref)
    assert np.array_equal(got, ref)


def test_three_pass_batched(rng, small_radix):
    n = 1 << K
    x = np.stack([_rand_poly(rng, n) for _ in range(3)])
    consts = ntt_mxu._device_consts3(K, False, False)
    got = np.asarray(ntt_mxu._ntt_mxu3_jit(x, *consts, K, False))
    ref = np.asarray(_ntt_impl(x, K, False))
    assert np.array_equal(got, ref)


def test_split_k3_bounds():
    # real production splits (no monkeypatch): k=21..30 decompose legally
    for k in range(21, 31):
        ka, kb = ntt_mxu._split_k3(k)
        assert ka + kb == k and ka <= 10 and kb <= 20
        kb1, kb2 = ntt_mxu._split_k(kb)
        assert max(kb1, kb2) <= 10
