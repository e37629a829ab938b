"""ECC circuit: BN254 EcAdd / EcMul precompile proofs."""

import numpy as np

from zkevm_circuits_tpu.circuits.ecc import EcAddEvent, EcMulEvent, EccCircuit
from zkevm_circuits_tpu.crypto.curve import G1_GEN, host_g1_add, host_g1_mul
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.mock import MockProver

K = 13
O = (0, 0)


def _pt(k):
    return host_g1_mul(G1_GEN, k)


def _aff(p):
    return O if p is None else p


def test_ecadd_cases_satisfied():
    P, Q = _pt(5), _pt(11)
    events = [
        EcAddEvent(p=P, q=Q, r=_aff(host_g1_add(P, Q))),      # generic
        EcAddEvent(p=P, q=P, r=_aff(host_g1_add(P, P))),      # double
        EcAddEvent(p=P, q=(P[0], (-P[1]) % _q()), r=O),       # P + (-P)
        EcAddEvent(p=O, q=Q, r=Q),                            # O + Q
        EcAddEvent(p=P, q=O, r=P),                            # P + O
        EcAddEvent(p=O, q=O, r=O),                            # O + O
    ]
    MockProver(9, EccCircuit(add_events=events)).assert_satisfied()


def _q():
    from zkevm_circuits_tpu.crypto.params import FQ_MODULUS

    return FQ_MODULUS


def test_ecadd_catches_wrong_sum():
    P, Q = _pt(7), _pt(13)
    good = _aff(host_g1_add(P, Q))
    events = [EcAddEvent(p=P, q=Q, r=good)]

    class Corrupt(EccCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                lo_col = self.pairs["arx"][0]
                arr = np.array(cols[lo_col])
                cur = F.to_int(np.asarray(F.from_mont(arr[0])))
                arr[0] = F.from_int((cur + 1) * F.R % F.modulus)
                cols[lo_col] = arr
            return cols

    failures = MockProver(9, Corrupt(add_events=events)).verify()
    assert failures


def test_ecmul_satisfied():
    P = _pt(9)
    k = 0xDEADBEEF_CAFEBABE_0123456789ABCDEF
    events = [EcMulEvent(p=P, k=k, r=_aff(host_g1_mul(P, k)))]
    MockProver(K, EccCircuit(mul_events=events)).assert_satisfied()


def test_ecmul_trivial_zero_point():
    MockProver(
        K, EccCircuit(mul_events=[EcMulEvent(p=O, k=123, r=O)])
    ).assert_satisfied()


def test_ecmul_trivial_zero_scalar():
    MockProver(
        K, EccCircuit(mul_events=[EcMulEvent(p=_pt(3), k=0, r=O)])
    ).assert_satisfied()


def test_ecmul_catches_wrong_product():
    P = _pt(21)
    k = 0x1234567
    events = [EcMulEvent(p=P, k=k, r=_aff(host_g1_mul(P, k)))]

    class Corrupt(EccCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                # flip a walked bit mid-walk
                arr = np.array(cols[self.c_b])
                row = 1 + 200
                cur = F.to_int(np.asarray(F.from_mont(arr[row])))
                arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
                cols[self.c_b] = arr
            return cols

    failures = MockProver(K, Corrupt(mul_events=events)).verify()
    assert failures
