"""Field arithmetic vs. a pure-Python big-int oracle.

Mirrors the role of the `ff`-crate property tests the reference relies on
(SURVEY.md §2.3 item 1).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.crypto.field import fr, fq
from zkevm_circuits_tpu.crypto import params

FIELDS = [fr(), fq()]
N = 64


def _rand_pairs(F, rng, n=N):
    a_int = [int(rng.integers(0, 2**63)) for _ in range(n)]
    # build full-width random residues
    xs, ys = [], []
    for i in range(n):
        x = int.from_bytes(rng.bytes(40), "little") % F.modulus
        y = int.from_bytes(rng.bytes(40), "little") % F.modulus
        xs.append(x)
        ys.append(y)
    # include edge cases
    xs[:4] = [0, 1, F.modulus - 1, F.modulus - 2]
    ys[:4] = [0, F.modulus - 1, F.modulus - 1, 1]
    return xs, ys


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(F, rng):
    xs, ys = _rand_pairs(F, rng)
    a, b = jnp.asarray(F.from_ints(xs)), jnp.asarray(F.from_ints(ys))
    got = F.to_ints(np.asarray(F.add(a, b)))
    assert got == [(x + y) % F.modulus for x, y in zip(xs, ys)]
    got = F.to_ints(np.asarray(F.sub(a, b)))
    assert got == [(x - y) % F.modulus for x, y in zip(xs, ys)]
    got = F.to_ints(np.asarray(F.neg(a)))
    assert got == [(-x) % F.modulus for x in xs]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_montgomery_mul(F, rng):
    xs, ys = _rand_pairs(F, rng)
    a, b = jnp.asarray(F.from_ints(xs)), jnp.asarray(F.from_ints(ys))
    am, bm = F.to_mont(a), F.to_mont(b)
    # to_mont/from_mont roundtrip
    assert F.to_ints(np.asarray(F.from_mont(am))) == xs
    got = F.to_ints(np.asarray(F.from_mont(F.mul(am, bm))))
    assert got == [(x * y) % F.modulus for x, y in zip(xs, ys)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_pow_inv(F, rng):
    xs, _ = _rand_pairs(F, rng, 8)
    a = F.to_mont(jnp.asarray(F.from_ints(xs)))
    got = F.to_ints(np.asarray(F.from_mont(F.pow(a, 5))))
    assert got == [pow(x, 5, F.modulus) for x in xs]
    inv = F.from_mont(F.inv(a))
    got = F.to_ints(np.asarray(inv))
    want = [pow(x, -1, F.modulus) if x else 0 for x in xs]
    assert got == want


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_batch_inv(F, rng):
    xs, _ = _rand_pairs(F, rng, 33)
    xs[5] = 0  # zero passes through
    a = F.to_mont(jnp.asarray(F.from_ints(xs)))
    out = F.from_mont(F.batch_inv(a, axis=0))
    got = F.to_ints(np.asarray(out))
    want = [pow(x, -1, F.modulus) if x else 0 for x in xs]
    assert got == want


def test_fr_root_of_unity():
    assert pow(params.FR_ROOT_OF_UNITY, 1 << params.FR_TWO_ADICITY, params.FR_MODULUS) == 1
    assert pow(params.FR_ROOT_OF_UNITY, 1 << (params.FR_TWO_ADICITY - 1), params.FR_MODULUS) != 1


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_predicates(F, rng):
    xs, ys = _rand_pairs(F, rng, 8)
    a, b = jnp.asarray(F.from_ints(xs)), jnp.asarray(F.from_ints(ys))
    assert bool(F.is_zero(F.sub(a, a)).all())
    assert list(np.asarray(F.eq(a, a))) == [True] * 8
