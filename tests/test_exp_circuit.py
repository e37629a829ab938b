"""Exp circuit tests: EXP opcode through tracer+builder -> mock prove."""

import numpy as np

from zkevm_circuits_tpu.circuits.exp import ExpCircuit
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import (
    CircuitInputBuilder, exp_by_squaring,
)

K = 9  # byte range table needs 256 usable rows
SENDER, CONTRACT = 0xCAFE, 0xC0DE
M256 = 1 << 256


def _witness(pairs):
    code = Bytecode()
    for base, exp in pairs:
        code.push(32, exp).push(32, base).op("EXP").op("POP")
    code.op("STOP")
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""), tr
    )
    return b


def test_exp_by_squaring_steps():
    steps = []
    out = exp_by_squaring(23, 123, steps)
    assert out == pow(23, 123, M256)
    for a, b, d in steps:
        assert a * b % M256 == d
    # reversed-step exponent walk terminates at 2
    exp = 123
    for _ in reversed(steps):
        exp = exp - 1 if exp & 1 else exp >> 1
    assert exp == 1  # one past the final (exp==2) row


def test_exp_circuit_satisfied():
    b = _witness([(3, 5), (2**120 + 7, 2**130 + 3)])
    assert len(b.exp_events) == 2
    assert b.exp_events[0].exponentiation == 243
    MockProver(K, ExpCircuit(b.exp_events)).assert_satisfied()


def test_exp_circuit_overflow_wraps():
    b = _witness([(2**255 + 17, 19)])
    ev = b.exp_events[0]
    assert ev.exponentiation == pow(2**255 + 17, 19, M256)
    MockProver(K, ExpCircuit(b.exp_events)).assert_satisfied()


def test_exp_circuit_catches_wrong_result():
    b = _witness([(7, 6)])

    class Corrupt(ExpCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                F = fr()
                # bump the low byte of d on the first (result) row
                arr = np.array(cols[self.c_d[0]])
                good = F.to_int(np.asarray(F.from_mont(arr[0])))
                arr[0] = F.from_int((good + 1) % 256 * F.R % F.modulus)
                cols[self.c_d[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(b.exp_events)).verify()
    assert failures
