"""SuperCircuit composition test — shared RW table + challenge.

Mirrors the reference's super_circuit tests (SURVEY.md §4.4) at mock
scale: one block with a PUSH/ADD/POP program through every composed
sub-circuit, plus a cross-circuit corruption (EVM claims a value the
State circuit's table doesn't hold).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.super_circuit import SuperCircuit, SuperParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.types.transaction import Transaction
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder

K = 9
SENDER, CONTRACT = 0xCAFE, 0xC0DE
SK = 0x3333333333333333333333333333333333333333333333333333333333333333


def _witness():
    code = Bytecode().push(1, 5).push(2, 0x1234).op("ADD").op("POP").op("STOP")
    state = StateDB(
        {SENDER: Account(balance=10**18), CONTRACT: Account(code=code.to_bytes())}
    )
    tr = Interpreter(state).run_tx(Tx(from_addr=SENDER, to=CONTRACT))
    assert not tr.failed
    b = CircuitInputBuilder()
    b.handle_tx(
        dict(from_addr=SENDER, to_addr=CONTRACT, value=0, calldata=b""), tr
    )
    txs = [Transaction(nonce=0, to=CONTRACT, chain_id=1337).sign(SK)]
    return b, [code], txs


def test_super_circuit_satisfied():
    b, codes, txs = _witness()
    MockProver(K, SuperCircuit(b, codes, txs)).assert_satisfied()


def test_super_circuit_cross_corruption():
    b, codes, txs = _witness()

    class Corrupt(SuperCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                arr = np.array(cols[self.evm.c_val_a])
                row = next(
                    i for i, s in enumerate(self.evm.steps)
                    if s.exec_state == "POP"
                )
                arr[row] = F.from_int(0xBAD * F.R % F.modulus)
                cols[self.evm.c_val_a] = arr
            return cols

    failures = MockProver(K, Corrupt(b, codes, txs)).verify()
    assert any("rw bus" in f for f in failures), failures
