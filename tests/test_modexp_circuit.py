"""ModExp circuit tests: square-and-multiply over MulMod-table rows."""

import numpy as np

from zkevm_circuits_tpu.circuits.modexp import (
    ModExpCircuit, ModExpEvent, modexp_steps,
)
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.mock import MockProver

K = 9  # byte range table needs 256 usable rows


def _event(base, exp, mod):
    result = pow(base, exp, mod) if mod else 0
    return ModExpEvent(base=base, exponent=exp, modulus=mod, result=result)


def test_modexp_steps_cover_recursion():
    steps, result = modexp_steps(23, 123, 1009)
    assert result == pow(23, 123, 1009)
    for a, b, d in steps:
        assert a * b % 1009 == d
    # reversed-step exponent walk terminates at 2
    exp = 123
    for _ in reversed(steps):
        exp = exp - 1 if exp & 1 else exp >> 1
    assert exp == 1  # one past the final (exp==2) row


def test_modexp_circuit_satisfied():
    events = [
        _event(3, 5, 1009),
        _event(2**200 + 7, 2**130 + 3, (1 << 255) - 19),
        _event(2**255 + 17, 65537, 10**60 + 7),
    ]
    MockProver(K, ModExpCircuit(events)).assert_satisfied()


def test_modexp_small_exponents_and_zero_modulus():
    events = [
        _event(12345, 0, 1009),          # 1 mod n
        _event(2**140 + 5, 1, 997),      # base mod n
        _event(7, 5, 0),                 # mod 0 => 0 (EVM convention)
        _event(5, 0, 1),                 # 1 mod 1 == 0
    ]
    MockProver(K, ModExpCircuit(events)).assert_satisfied()


def test_modexp_circuit_catches_wrong_result():
    events = [_event(7, 6, 1009)]

    class Corrupt(ModExpCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                # bump the result half on the first (result) row
                arr = np.array(cols[self.c_d_lo])
                good = F.to_int(np.asarray(F.from_mont(arr[0])))
                arr[0] = F.from_int((good + 1) * F.R % F.modulus)
                cols[self.c_d_lo] = arr
            return cols

    failures = MockProver(K, Corrupt(events)).verify()
    assert failures


def test_modexp_circuit_catches_tampered_exponent():
    events = [_event(3, 10, 101)]

    class Corrupt(ModExpCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                # claim exponent 11 on the statement row: the parity walk
                # into the (unchanged) chain must break
                arr = np.array(cols[self.c_exp[0]])
                arr[0] = F.from_int(11 * F.R % F.modulus)
                cols[self.c_exp[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(events)).verify()
    assert failures
