"""Tx circuit tests (mock prover at k=9 for the byte table)."""

import pytest

from zkevm_circuits_tpu.circuits.tx import TxCircuit, TxParams
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.types.transaction import Transaction

K = 9
SK1 = 0x1111111111111111111111111111111111111111111111111111111111111111
SK2 = 0x2222222222222222222222222222222222222222222222222222222222222222


def _txs():
    return [
        Transaction(nonce=0, to=0xBEEF, value=100, data=b"\x01\x02\x03",
                    chain_id=1337).sign(SK1),
        Transaction(nonce=5, to=None, value=0, data=b"\x60\x00",
                    chain_id=1337).sign(SK2),
    ]


def test_tx_circuit_satisfied():
    MockProver(K, TxCircuit(_txs())).assert_satisfied()


def test_tx_circuit_empty():
    MockProver(K, TxCircuit([])).assert_satisfied()


def test_tx_circuit_rejects_unsigned():
    with pytest.raises(AssertionError):
        TxCircuit([Transaction(nonce=1, to=0xBEEF)])


def test_tx_circuit_catches_broken_calldata_index():
    class Corrupt(TxCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                import numpy as np
                from zkevm_circuits_tpu.crypto.field import fr
                F = fr()
                n_fixed, _ = self._layout(n)
                arr = np.array(cols[self.c_index])
                arr[n_fixed + 1] = F.from_int(7 * F.R % F.modulus)
                cols[self.c_index] = arr
            return cols

    failures = MockProver(K, Corrupt(_txs())).verify()
    assert any("continuity" in f for f in failures), failures
