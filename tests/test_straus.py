"""Windowed Straus EcMsm circuit (shared doubling chain, 4-bit windows).

The aggregation-scale MSM variant (recursion/ecmsm.py EcStrausCircuit):
~800 MulMod rows per term + ~2800 shared vs the bit walk's 5378/term —
the enabler for verifying layer-1 snarks inside the aggregation circuit
(reference aggregator/src/aggregation/circuit.rs:40).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.crypto.curve import host_g1_add, host_g1_mul
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R, G1_GEN
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.recursion.ecmsm import (
    EcStrausCircuit, EcStrausProgram,
)

F = fr()


def _points(ks):
    return [host_g1_mul(G1_GEN, k) for k in ks]


def test_straus_trace_matches_host_msm():
    scalars = [5, R - 3, 0, 0xDEADBEEF << 200]
    pts = _points([2, 9, 31, 77])
    pr = EcStrausProgram(scalars=scalars, points=pts)
    want = None
    for s, p in zip(scalars, pts):
        if s % R:
            want = host_g1_add(want, host_g1_mul(p, s % R))
    assert pr.result() == want
    pr.trace()  # the trace's own result assertion ran


@pytest.mark.slow
def test_straus_circuit_satisfied_and_rejects():
    scalars = [7, 0, (1 << 255) + 12345]
    pts = _points([3, 11, 29])
    pr = EcStrausProgram(scalars=scalars, points=pts)
    circ = EcStrausCircuit([pr])
    k = 13
    MockProver(k, circ).assert_satisfied()

    # corrupt one selected window nibble on an add row: the sacc chain
    # then binds a DIFFERENT scalar than claimed -> must fail
    class Corrupt(EcStrausCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                row = self._add_row(0, 5, 0)
                arr = np.asarray(cols[self.c_w]).copy()
                cur = int(arr[row][0])  # first byte is the nibble
                arr[row] = F.from_int((cur ^ 1) * F.R % R)
                cols[self.c_w] = arr
            return cols

    failures = MockProver(k, Corrupt([pr])).verify()
    assert failures, "forged window nibble must break the walk"
