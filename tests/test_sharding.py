"""Sharded prover helpers vs single-device ground truth (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.parallel.sharding import (
    make_sharded_commit,
    make_sharded_prefix_product,
)

F = fr()


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("rows",))


def test_sharded_prefix_product(mesh, rng):
    n = 64
    x = F.rand(rng, (n,))
    sh = NamedSharding(mesh, P("rows"))
    fn = make_sharded_prefix_product(mesh, "rows")
    out = np.asarray(fn(jax.device_put(x, sh)))
    # ground truth exclusive prefix via host ints
    vals = [F.to_int(r) for r in x]
    acc = F.R % F.modulus  # Montgomery 1
    Rinv = pow(F.R, -1, F.modulus)
    expect = []
    for v in vals:
        expect.append(acc)
        acc = acc * v % F.modulus * Rinv % F.modulus
    got = [F.to_int(r) for r in out]
    assert got == expect
