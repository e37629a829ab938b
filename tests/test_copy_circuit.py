"""Copy circuit tests: CALLDATACOPY through tracer+builder -> mock prove."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.copy import CopyCircuit, CopyParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder

K = 7
SENDER, CONTRACT = 0xCAFE, 0xC0DE
CALLDATA = bytes([0xAA, 0xBB, 0xCC, 0xDD])


def _witness(length=4, src=0):
    code = (
        Bytecode()
        .push(1, length).push(1, src).push(1, 0)  # len, src, dst
        .op("CALLDATACOPY").op("STOP")
    )
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(
        Tx(from_addr=SENDER, to=CONTRACT, data=CALLDATA)
    )
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=CALLDATA),
        tr,
    )
    tx_rows = [(1, i, byte) for i, byte in enumerate(CALLDATA)]
    return b, tx_rows


def test_copy_circuit_satisfied():
    b, tx_rows = _witness()
    assert len(b.copy_events) == 1 and b.copy_events[0].bytes_ == CALLDATA
    circ = CopyCircuit(b.copy_events, rw_rows=b.rws.rws, tx_rows=tx_rows)
    MockProver(K, circ).assert_satisfied()


def test_copy_circuit_out_of_range_pad():
    b, tx_rows = _witness(length=6, src=2)  # reads 2 bytes past calldata
    ev = b.copy_events[0]
    assert ev.bytes_ == CALLDATA[2:] + b"\x00" * 4
    circ = CopyCircuit(b.copy_events, rw_rows=b.rws.rws, tx_rows=tx_rows)
    MockProver(K, circ).assert_satisfied()


def test_copy_circuit_catches_corrupt_byte():
    b, tx_rows = _witness()

    class Corrupt(CopyCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                arr = np.array(cols[self.c_byte])
                arr[2] = F.from_int(0x99 * F.R % F.modulus)
                cols[self.c_byte] = arr
            return cols

    circ = Corrupt(b.copy_events, rw_rows=b.rws.rws, tx_rows=tx_rows)
    failures = MockProver(K, circ).verify()
    assert failures
