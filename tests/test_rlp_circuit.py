"""RLP circuit tests: legacy signing payload FSM -> mock prove."""

import numpy as np

from zkevm_circuits_tpu.circuits.rlp import RlpCircuit, RlpTag, _tx_rows
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.types import rlp as rlp_host
from zkevm_circuits_tpu.types.transaction import Transaction

F = fr()
K = 11  # each tx now carries sign + signed-envelope segments

TX_SHORT = Transaction(nonce=0, gas_price=10, gas=1_000_000, to=0xC0DE,
                       value=0x1234, data=bytes([0xAA, 0xBB]), chain_id=1337)
TX_LONG = Transaction(nonce=7, gas_price=2**40 + 3, gas=21000, to=0xBEEF,
                      value=2**128 + 5, data=bytes(range(40)), chain_id=1337)
TX_CREATE = Transaction(nonce=1, gas_price=1, gas=53000, to=None, value=0,
                        data=b"\x60\x01", chain_id=1)


def test_tx_rows_cover_payload():
    for tx in (TX_SHORT, TX_LONG, TX_CREATE):
        rows, payload = _tx_rows(tx, 1, 0)
        body = [r for r in rows if r[1] != int(RlpTag.Pad)]
        assert bytes(r[4] for r in body) == payload
        # pad rows complete the keccak 136-byte block with pad10*1
        pad = bytes(r[4] for r in rows[len(body):])
        assert len(payload) + len(pad) == 136 * ((len(payload) // 136) + 1)
        assert pad[0] & 0x01 and pad[-1] & 0x80 and not any(pad[1:-1])
        assert payload == rlp_host.encode([
            tx.nonce, tx.gas_price, tx.gas,
            b"" if tx.to is None else tx.to.to_bytes(20, "big"),
            tx.value, tx.data, tx.chain_id, 0, 0,
        ])
    assert _tx_rows(TX_LONG, 1, 0)[1][0] == 0xF8  # long form exercised
    assert _tx_rows(TX_SHORT, 1, 0)[1][0] != 0xF8  # short form exercised


def test_rlp_circuit_satisfied():
    MockProver(K, RlpCircuit([TX_SHORT, TX_LONG, TX_CREATE])).assert_satisfied()


def test_rlp_circuit_catches_tampered_byte():
    class Corrupt(RlpCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_byte])
                # tamper a payload byte of the gas field
                row = next(
                    i for i, r in enumerate(self.rows)
                    if r[1] == int(RlpTag.Gas) and not r[3]
                )
                arr[row] = F.from_int(0x99 * F.R % F.modulus)
                cols[self.c_byte] = arr
            return cols

    failures = MockProver(K, Corrupt([TX_SHORT])).verify()
    assert failures


def test_rlp_circuit_catches_wrong_tag_order():
    class Corrupt(RlpCircuit):
        """Swap the Gas segment's tag to Value: the ROM lookup must miss."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                gas_rows = [
                    i for i, r in enumerate(self.rows)
                    if r[1] == int(RlpTag.Gas)
                ]
                a_gas = np.array(cols[self.c_ind[RlpTag.Gas]])
                a_val = np.array(cols[self.c_ind[RlpTag.Value]])
                one = F.from_int(F.R % F.modulus)
                for i in gas_rows:
                    a_gas[i] = 0
                    a_val[i] = one
                cols[self.c_ind[RlpTag.Gas]] = a_gas
                cols[self.c_ind[RlpTag.Value]] = a_val
            return cols

    failures = MockProver(K, Corrupt([TX_SHORT])).verify()
    assert any("rom" in f for f in failures), failures


def test_rlp_circuit_catches_wrong_length():
    class Corrupt(RlpCircuit):
        """Claim a shorter data segment: the list countdown must break."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_tot])
                row = next(
                    i for i, r in enumerate(self.rows)
                    if r[1] == int(RlpTag.Data)
                )
                cur = F.to_int(np.asarray(F.from_mont(arr[row])))
                arr[row] = F.from_int((cur + 1) % F.modulus * F.R % F.modulus)
                cols[self.c_tot] = arr
            return cols

    failures = MockProver(K, Corrupt([TX_SHORT])).verify()
    assert any("tot" in f for f in failures), failures


# ---- typed transactions (EIP-2718 envelopes) ----------------------------
from zkevm_circuits_tpu.types.transaction import TxType

TX_2930 = Transaction(
    nonce=3, gas_price=12, gas=60_000, to=0xD00D, value=5,
    data=b"\x01\x02\x03", chain_id=1337, tx_type=TxType.Eip2930,
    access_list=[(0xAAA, [7, 9]), (0xBBB, [])],
)
TX_1559 = Transaction(
    nonce=4, gas=70_000, to=0xFEED, value=0, data=b"", chain_id=1337,
    tx_type=TxType.Eip1559, max_fee_per_gas=100,
    max_priority_fee_per_gas=2,
    access_list=[(0xCCC, [2**200])],
)


def test_typed_tx_rows_cover_payload():
    for tx in (TX_2930, TX_1559):
        rows, payload = _tx_rows(tx, 1, 0)
        body = [r for r in rows if r[1] != int(RlpTag.Pad)]
        assert bytes(r[4] for r in body) == payload
        assert body[0][1] == int(RlpTag.TxTypeB)
        assert payload == tx.sign_payload()
        # access-list values surface as AlAddr/AlKey segments
        n_addr = sum(1 for r in body if r[1] == int(RlpTag.AlAddr))
        assert n_addr == 21 * len(tx.access_list)


def test_rlp_circuit_typed_satisfied():
    """Legacy + 2930 + 1559 in one region: the type-aware ROM drives all
    three field orders (reference rlp_circuit_fsm.rs covers 4 tx types)."""
    MockProver(
        11, RlpCircuit([TX_SHORT, TX_2930, TX_1559])
    ).assert_satisfied()


def test_rlp_circuit_typed_wrong_order_rejected():
    """Swapping Prio/GasPrice order in a 1559 payload must miss the ROM."""

    class Corrupt(RlpCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                rows = self.rows
                i_prio = next(i for i, r in enumerate(rows)
                              if r[1] == int(RlpTag.Prio))
                i_gp = next(i for i, r in enumerate(rows)
                            if r[1] == int(RlpTag.GasPrice)
                            and r[0] == rows[i_prio][0])
                for a, b in ((i_prio, RlpTag.GasPrice), (i_gp, RlpTag.Prio)):
                    for t in (RlpTag.Prio, RlpTag.GasPrice):
                        arr = np.asarray(cols[self.c_ind[t]]).copy()
                        arr[a] = F.from_int(int(t == b) * F.R % F.modulus)
                        cols[self.c_ind[t]] = arr
            return cols

    failures = MockProver(K, Corrupt([TX_1559])).verify()
    assert failures, "swapped 1559 field order must fail"


def test_rlp_circuit_typed_wrong_type_rejected():
    """Claiming a 1559 envelope is legacy must break the type machinery."""

    class Corrupt(RlpCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.asarray(cols[self.c_type]).copy()
                arr[:] = F.from_int(0)
                cols[self.c_type] = arr
            return cols

    failures = MockProver(K, Corrupt([TX_1559])).verify()
    assert failures, "forged tx type must fail"
