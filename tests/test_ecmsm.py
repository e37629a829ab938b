"""In-circuit BN254 G1 MSM over MulMod-table rows (recursion EC side)."""

import numpy as np
import pytest

from zkevm_circuits_tpu.crypto.curve import host_g1_add, host_g1_mul
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R, G1_GEN
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.recursion.ecmsm import (
    D_PT, D2_PT, E_PT, EV_ROWS, NEG_E_PT, T_SURPLUS, EcMsmCircuit,
    EcMsmProgram,
)

K = 15


def _points(m):
    return [host_g1_mul(G1_GEN, 1000 + 77 * i) for i in range(m)]


def test_constants_consistent():
    assert host_g1_add(E_PT, NEG_E_PT) is None
    assert E_PT == host_g1_mul(D_PT, T_SURPLUS)
    assert D_PT != D2_PT


def test_trace_matches_host_msm():
    prog = EcMsmProgram(scalars=[3, R - 5], points=_points(2))
    terms, folds, outc, events = prog.trace()
    assert len(terms) == 2 and len(terms[0]["walk"]) == 256
    expect = host_g1_add(
        host_g1_mul(_points(2)[0], 3), host_g1_mul(_points(2)[1], R - 5)
    )
    assert outc["r"] == expect
    for e in events[:64]:
        exp = (e.a % e.n + e.b) % e.n if e.is_add else (e.a % e.n) * e.b % e.n
        assert exp == e.r


def test_zero_scalar_rejected():
    with pytest.raises(AssertionError):
        EcMsmProgram(scalars=[0], points=_points(1))


def test_ecmsm_circuit_satisfied():
    prog = EcMsmProgram(scalars=[0x1234, 0xBEEF], points=_points(2))
    circ = EcMsmCircuit([prog])
    MockProver(K, circ).assert_satisfied()


def test_ecmsm_circuit_catches_forged_result():
    """Flipping the exposed result coordinate must break a gate/lookup."""
    prog = EcMsmProgram(scalars=[0x1234], points=_points(1))

    class Corrupt(EcMsmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                lo_col = self.pairs["f1_rx"][0]
                arr = np.asarray(cols[lo_col]).copy()
                row = self.programs[0].rows - 1
                v = F.to_int(F.from_mont(arr[row]))
                arr[row] = F.from_int((v + 1) % R * F.R % R)
                cols[lo_col] = arr
            return cols

    circ = Corrupt([prog])
    with pytest.raises(AssertionError):
        MockProver(K, circ).assert_satisfied()


def test_ecmsm_circuit_catches_flipped_scalar_bit():
    prog = EcMsmProgram(scalars=[0x1234], points=_points(1))

    class Corrupt(EcMsmCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                arr = np.asarray(cols[self.c_b]).copy()
                row = 1 + 200  # some walk row
                v = F.to_int(F.from_mont(arr[row]))
                arr[row] = F.from_int((1 - v) % R * F.R % R)
                cols[self.c_b] = arr
            return cols

    circ = Corrupt([prog])
    with pytest.raises(AssertionError):
        MockProver(K, circ).assert_satisfied()
