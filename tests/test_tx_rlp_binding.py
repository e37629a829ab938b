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
K = 11  # each tx now carries sign + signed-envelope segments
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


def test_typed_tx_rlp_binding_1559():
    """A 1559 tx proves through Tx+RLP: the type rides the tx_type_table
    lookup, the SigV rule switches to raw y-parity, and Prio/AlAddr/AlKey
    segments export through the RlpTable (reference rlp_circuit_fsm.rs +
    tx_circuit.rs access-list section)."""
    from zkevm_circuits_tpu.circuits.rlp import RlpCircuit, RlpTag
    from zkevm_circuits_tpu.circuits.tx import TxCircuit
    from zkevm_circuits_tpu.plonk.circuit import Circuit, ConstraintSystem
    from zkevm_circuits_tpu.types.transaction import Transaction, TxType

    sk = 0x7777777777777777777777777777777777777777777777777777777777777777
    tx = Transaction(
        nonce=1, gas=60_000, to=0xFEED, value=9, data=b"\x01\x02",
        chain_id=1337, tx_type=TxType.Eip1559, max_fee_per_gas=55,
        max_priority_fee_per_gas=3, access_list=[(0xABC, [5])],
    ).sign(sk)
    assert tx.v in (0, 1)

    class TxRlp(Circuit):
        def __init__(self):
            self.rlp = RlpCircuit([tx])
            self.tx = TxCircuit([tx])

        def configure(self, cs: ConstraintSystem):
            r = cs.challenge(phase=0)
            self.rlp.configure(cs, challenge=r)
            self.tx.configure(
                cs, challenge=r, rlp_table=self.rlp.rlp_table,
                data_len_table=self.rlp.data_len_table,
                tx_type_table=self.rlp.tx_type_table,
            )

        def fixed_columns(self, n):
            out = dict(self.rlp.fixed_columns(n))
            out.update(self.tx.fixed_columns(n))
            return out

        def synthesize(self, phase, n, challenges, instances):
            out = dict(self.rlp.synthesize(phase, n, challenges, instances))
            out.update(self.tx.synthesize(phase, n, challenges, instances))
            return out

    MockProver(11, TxRlp()).assert_satisfied()


def test_typed_tx_wrong_parity_rejected():
    """Claiming a legacy-style v on a 1559 tx must fail the SigV rule."""
    from zkevm_circuits_tpu.circuits.rlp import RlpCircuit
    from zkevm_circuits_tpu.circuits.tx import TxCircuit
    from zkevm_circuits_tpu.plonk.circuit import Circuit, ConstraintSystem
    from zkevm_circuits_tpu.types.transaction import Transaction, TxType
    import dataclasses as dc

    sk = 0x7777777777777777777777777777777777777777777777777777777777777777
    tx = Transaction(
        nonce=1, gas=60_000, to=0xFEED, value=9, data=b"",
        chain_id=1337, tx_type=TxType.Eip1559, max_fee_per_gas=55,
        max_priority_fee_per_gas=3,
    ).sign(sk)
    bad = dc.replace(tx, v=35 + 2 * tx.chain_id + tx.v)  # legacy-style v

    class TxRlp(Circuit):
        def __init__(self):
            self.rlp = RlpCircuit([bad])
            self.tx = TxCircuit([bad])

        def configure(self, cs: ConstraintSystem):
            r = cs.challenge(phase=0)
            self.rlp.configure(cs, challenge=r)
            self.tx.configure(
                cs, challenge=r, rlp_table=self.rlp.rlp_table,
                data_len_table=self.rlp.data_len_table,
                tx_type_table=self.rlp.tx_type_table,
            )

        def fixed_columns(self, n):
            out = dict(self.rlp.fixed_columns(n))
            out.update(self.tx.fixed_columns(n))
            return out

        def synthesize(self, phase, n, challenges, instances):
            out = dict(self.rlp.synthesize(phase, n, challenges, instances))
            out.update(self.tx.synthesize(phase, n, challenges, instances))
            return out

    failures = MockProver(11, TxRlp()).verify()
    assert failures, "legacy v on a typed tx must fail"
