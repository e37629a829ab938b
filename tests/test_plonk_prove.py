"""End-to-end PLONK prove+verify on a small circuit (k=5).

Exercises every argument of the proof system at once: two gates (deg 2 and
3), a rotation-using chain gate, a lookup into a fixed table, copy
constraints across advice columns and into the instance column.  Mirrors
the role of halo2's MockProver+real-prover test pairing in the reference
(SURVEY.md §4.1-4.2).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R
from zkevm_circuits_tpu.plonk.circuit import Cell, Circuit, ConstraintSystem
from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.plonk.prover import prove
from zkevm_circuits_tpu.plonk.verifier import verify
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.plonk.expression import Advice, Fixed, Instance

F = fr()
K = 5
N = 1 << K

A_IN = 3
N_ADD = 10  # rows 0..9: c = a + b, chained a[i+1] = c[i] on rows 0..8
MUL_ROWS = range(10, 15)


def _mont(vals):
    return F.from_ints([v % R * F.R % R for v in vals])


class DemoCircuit(Circuit):
    def __init__(self, corrupt_row: int | None = None):
        self.corrupt_row = corrupt_row

    def configure(self, cs: ConstraintSystem):
        self.qadd = cs.fixed_column()
        self.qmul = cs.fixed_column()
        self.qchain = cs.fixed_column()
        self.tbl = cs.fixed_column()
        self.a = cs.advice_column()
        self.b = cs.advice_column()
        self.c = cs.advice_column()
        self.d = cs.advice_column()
        self.inst = cs.instance_column()
        cs.create_gate(
            "add", Fixed(self.qadd) * (Advice(self.a) + Advice(self.b) - Advice(self.c))
        )
        cs.create_gate(
            "mul", Fixed(self.qmul) * (Advice(self.a) * Advice(self.b) - Advice(self.c))
        )
        cs.create_gate(
            "chain", Fixed(self.qchain) * (Advice(self.a, 1) - Advice(self.c))
        )
        cs.lookup("range16", [(Advice(self.d), Fixed(self.tbl))])
        cs.enable_equality("advice", self.a)
        cs.enable_equality("advice", self.b)
        cs.enable_equality("advice", self.c)
        cs.enable_equality("instance", self.inst)

    def _witness(self, n):
        a = [0] * n
        b = [0] * n
        c = [0] * n
        a[0] = A_IN
        for i in range(N_ADD):
            b[i] = 2 * i + 1
            c[i] = (a[i] + b[i]) % R
            if i + 1 < n:
                a[i + 1] = c[i]
        for i in MUL_ROWS:
            a[i] = i + 2
            b[i] = 3 * i + 1
            c[i] = a[i] * b[i] % R
        # copy constraint target: b[20] must equal c[12]
        b[20] = c[12]
        if self.corrupt_row is not None:
            c[self.corrupt_row] = (c[self.corrupt_row] + 1) % R
        d = [i % 16 for i in range(n)]
        return a, b, c, d

    def fixed_columns(self, n):
        qadd = [1 if i < N_ADD else 0 for i in range(n)]
        qmul = [1 if i in MUL_ROWS else 0 for i in range(n)]
        qchain = [1 if i < N_ADD - 1 else 0 for i in range(n)]
        tbl = [i if i < 16 else 0 for i in range(n)]
        return np.stack([_mont(col) for col in (qadd, qmul, qchain, tbl)])

    def copy_constraints(self, n):
        return [
            (Cell("instance", self.inst, 0), Cell("advice", self.a, 0)),
            (Cell("advice", self.b, 20), Cell("advice", self.c, 12)),
        ]

    def synthesize(self, phase, n, challenges, instances):
        assert phase == 0
        a, b, c, d = self._witness(n)
        return {
            self.a: _mont(a),
            self.b: _mont(b),
            self.c: _mont(c),
            self.d: _mont(d),
        }


@pytest.fixture(scope="module")
def srs():
    return Srs.unsafe_setup(K, tau=987654321)


@pytest.fixture(scope="module")
def keys(srs):
    return keygen(DemoCircuit(), K, srs)


def test_mock_satisfied():
    MockProver(K, DemoCircuit(), [[A_IN]]).assert_satisfied()


def test_mock_catches_corruption():
    failures = MockProver(K, DemoCircuit(corrupt_row=5), [[A_IN]]).verify()
    assert failures


def test_prove_verify_roundtrip(srs, keys):
    pk, vk = keys
    proof = prove(pk, DemoCircuit(), [[A_IN]], srs)
    assert verify(vk, [[A_IN]], proof)
    # wrong instance must fail
    assert not verify(vk, [[A_IN + 1]], proof)


def test_corrupt_witness_rejected(srs, keys):
    pk, vk = keys
    proof = prove(pk, DemoCircuit(corrupt_row=5), [[A_IN]], srs)
    assert not verify(vk, [[A_IN]], proof)


def test_proofs_are_randomized(srs, keys):
    """ZK blinding: same witness, two proofs -> different bytes, both
    verify (the commitments differ because blinding rows are random)."""
    pk, vk = keys
    p1 = prove(pk, DemoCircuit(), [[A_IN]], srs)
    p2 = prove(pk, DemoCircuit(), [[A_IN]], srs)
    assert p1 != p2
    assert verify(vk, [[A_IN]], p1) and verify(vk, [[A_IN]], p2)
