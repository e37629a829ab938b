"""MockProver on a toy circuit: gate + lookup + copies + instance, and
negative tests with corrupted witnesses (the reference's testing pattern,
SURVEY.md §4.2 'negative tests inject corrupted witness')."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.circuit import Cell, Circuit, ConstraintSystem, usable_rows
from zkevm_circuits_tpu.plonk.expression import Advice, Fixed, Instance
from zkevm_circuits_tpu.plonk.mock import MockProver

F = fr()
K = 5
STEPS = 8


def mont(vals, n):
    vals = list(vals) + [0] * (n - len(vals))
    return F.from_ints([v * F.R % F.modulus for v in vals])


class FibCircuit(Circuit):
    """a + b = c per row; b,c chain into the next row via copy constraints;
    a separate advice column is range-checked in [0,16) via a lookup."""

    def __init__(self, corrupt=None):
        self.corrupt = corrupt  # None | 'gate' | 'lookup' | 'copy'

    def configure(self, cs: ConstraintSystem):
        self.col_a = cs.advice_column()
        self.col_b = cs.advice_column()
        self.col_c = cs.advice_column()
        self.col_d = cs.advice_column()
        self.sel = cs.fixed_column()
        self.table = cs.fixed_column()
        self.inst = cs.instance_column()
        cs.create_gate("add", Fixed(self.sel) * (Advice(self.col_a) + Advice(self.col_b) - Advice(self.col_c)))
        cs.lookup("range16", [(Advice(self.col_d), Fixed(self.table))])
        cs.enable_equality("advice", self.col_a)
        cs.enable_equality("instance", 0)

    def fixed_columns(self, n):
        sel = [1] * STEPS
        table = list(range(16))
        return np.stack([mont(sel, n), mont(table, n)])

    def _fib(self):
        a, b = 1, 1
        rows_a, rows_b, rows_c = [], [], []
        for _ in range(STEPS):
            rows_a.append(a)
            rows_b.append(b)
            rows_c.append(a + b)
            a, b = b, a + b
        return rows_a, rows_b, rows_c

    def copy_constraints(self, n):
        out = [(Cell("instance", 0, 0), Cell("advice", self.col_a, 0))]
        for i in range(STEPS - 1):
            out.append((Cell("advice", self.col_b, i), Cell("advice", self.col_a, i + 1)))
            out.append((Cell("advice", self.col_c, i), Cell("advice", self.col_b, i + 1)))
        return out

    def synthesize(self, phase, n, challenges, instances):
        ra, rb, rc = self._fib()
        rd = [i % 16 for i in range(usable_rows(n))]
        if self.corrupt == "gate":
            rc[3] += 1
        if self.corrupt == "lookup":
            rd[5] = 99
        if self.corrupt == "copy":
            ra[1] += 1
        return {
            self.col_a: mont(ra, n),
            self.col_b: mont(rb, n),
            self.col_c: mont(rc, n),
            self.col_d: mont(rd, n),
        }


def _instances():
    return [[1]]


def test_mock_satisfied():
    MockProver(K, FibCircuit(), _instances()).assert_satisfied()


@pytest.mark.parametrize("kind", ["gate", "lookup", "copy"])
def test_mock_rejects_corruption(kind):
    failures = MockProver(K, FibCircuit(corrupt=kind), _instances()).verify()
    assert failures, f"corruption '{kind}' not detected"
    assert any(kind in f or "lookup" in f or "copy" in f for f in failures)


def test_mock_rejects_wrong_instance():
    failures = MockProver(K, FibCircuit(), [[7]]).verify()
    assert failures
