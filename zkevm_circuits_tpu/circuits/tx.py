"""Tx circuit — proves the TxTable layout.

Equivalent of the reference's `zkevm-circuits/src/tx_circuit.rs`
(SURVEY.md §2.2 "Tx"): one fixed-layout block of rows per transaction
carrying (tag, value) pairs for the context fields the EVM circuit reads
(nonce, gas, gas_price, callee, caller, value, calldata length/RLC),
followed by per-byte calldata rows with index continuity.

Round-1 scope (documented): sender recovery is witnessed (caller address
column) and checked HOST-side against the signature during witness
construction; the in-circuit ECDSA binding is the Sig circuit (SURVEY.md
§2.2 "Sig") and the tx-hash binding is the Keccak circuit — both land
with those circuits, mirroring how the reference splits the work between
tx_circuit and sig_circuit.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from ..crypto.field import fr
from ..crypto.params import FR_MODULUS as R
from ..plonk.circuit import Circuit, ConstraintSystem, usable_rows
from ..plonk.expression import Advice, Fixed
from ..types.transaction import Transaction

F = fr()


class TxFieldTag(enum.IntEnum):
    Null = 0
    Nonce = 1
    GasPrice = 2
    Gas = 3
    CalleeAddress = 4
    CallerAddress = 5
    IsCreate = 6
    Value = 7
    CallDataLength = 8
    CallDataGasCost = 9
    SigV = 10
    SigR = 11
    SigS = 12
    CallData = 13  # per-byte rows


FIXED_TAGS = [
    TxFieldTag.Nonce, TxFieldTag.GasPrice, TxFieldTag.Gas,
    TxFieldTag.CalleeAddress, TxFieldTag.CallerAddress, TxFieldTag.IsCreate,
    TxFieldTag.Value, TxFieldTag.CallDataLength, TxFieldTag.CallDataGasCost,
    TxFieldTag.SigV, TxFieldTag.SigR, TxFieldTag.SigS,
]


@dataclasses.dataclass
class TxParams:
    max_txs: int = 4
    max_calldata: int = 64


class TxCircuit(Circuit):
    def __init__(self, txs: list[Transaction], params: TxParams | None = None):
        self.txs = txs
        self.params = params or TxParams()
        for tx in txs:
            sender = tx.recover_sender()
            assert sender is not None, "unsigned tx in witness"
            tx._sender = sender

    def configure(self, cs: ConstraintSystem, challenge=None):
        p = self.params
        self.q_fixed = cs.fixed_column()  # fixed-field region rows
        self.q_data = cs.fixed_column()  # calldata region rows
        self.f_tag = cs.fixed_column()  # expected tag sequence (fixed layout)
        self.tbl_byte = cs.fixed_column()

        self.c_tx_id = cs.advice_column()
        self.c_tag = cs.advice_column()
        self.c_index = cs.advice_column()  # calldata byte index
        self.c_value = cs.advice_column(phase=1)  # field value or byte
        self.c_is_final = cs.advice_column()  # last byte of a tx's calldata
        self.r = challenge if challenge is not None else cs.challenge(phase=0)

        qf, qd = Fixed(self.q_fixed), Fixed(self.q_data)
        tag, ftag = Advice(self.c_tag), Fixed(self.f_tag)
        txid, txid_n = Advice(self.c_tx_id), Advice(self.c_tx_id, 1)
        idx, idx_n = Advice(self.c_index), Advice(self.c_index, 1)
        fin = Advice(self.c_is_final)
        val = Advice(self.c_value)

        # fixed region: tag follows the static layout
        cs.create_gate("fixed tag layout", qf * (tag - ftag))
        # calldata region: tag is CallData
        cs.create_gate("calldata tag", qd * (tag - int(TxFieldTag.CallData)))
        cs.create_gate("is_final bool", qd * fin * (fin - 1))
        # byte index continuity: same tx => idx+1, is_final=0
        qd_n = Fixed(self.q_data, 1)
        cs.create_gate(
            "calldata continuity idx",
            qd * qd_n * (1 - fin) * (idx_n - idx - 1),
        )
        cs.create_gate(
            "calldata continuity tx",
            qd * qd_n * (1 - fin) * (txid_n - txid),
        )
        # calldata bytes range-checked
        cs.lookup_logup("calldata bytes", [[qd * val]], [Fixed(self.tbl_byte)])

    def tx_table_exprs(self) -> list:
        """(tx_id, tag, index, value) TxTable exprs for other circuits'
        lookups (reference table.rs:207 `TxTable`; the Copy circuit's
        calldata source rides this)."""
        g = Fixed(self.q_fixed) + Fixed(self.q_data)
        return [
            g * Advice(self.c_tx_id), g * Advice(self.c_tag),
            g * Advice(self.c_index), g * Advice(self.c_value),
        ]

    def _layout(self, n: int):
        p = self.params
        n_fixed = p.max_txs * len(FIXED_TAGS)
        total = n_fixed + p.max_calldata
        assert total <= usable_rows(n)
        return n_fixed, total

    def fixed_columns(self, n: int):
        p = self.params
        n_fixed, total = self._layout(n)
        mont = lambda vals: F.from_ints([v % R * F.R % R for v in vals])
        q_fixed = [1 if i < n_fixed else 0 for i in range(n)]
        q_data = [1 if n_fixed <= i < total else 0 for i in range(n)]
        ftag = [
            int(FIXED_TAGS[i % len(FIXED_TAGS)]) if i < n_fixed else 0
            for i in range(n)
        ]
        tbl = [i if i < 256 else 0 for i in range(n)]
        assert n >= 256
        return {
            self.q_fixed: mont(q_fixed),
            self.q_data: mont(q_data),
            self.f_tag: mont(ftag),
            self.tbl_byte: mont(tbl),
        }

    def synthesize(self, phase: int, n: int, challenges: dict, instances):
        p = self.params
        n_fixed, total = self._layout(n)
        mont = lambda vals: F.from_ints(
            [v % R * F.R % R for v in vals] + [0] * (n - len(vals))
        )
        # build rows
        tx_ids, tags, idxs, fins = [], [], [], []
        vals: list[int] = []
        for ti in range(p.max_txs):
            tx = self.txs[ti] if ti < len(self.txs) else Transaction(v=0)
            tid = ti + 1 if ti < len(self.txs) else 0
            fields = {
                TxFieldTag.Nonce: tx.nonce,
                TxFieldTag.GasPrice: tx.gas_price,
                TxFieldTag.Gas: tx.gas,
                TxFieldTag.CalleeAddress: tx.to or 0,
                TxFieldTag.CallerAddress: getattr(tx, "_sender", 0),
                TxFieldTag.IsCreate: int(tx.to is None),
                TxFieldTag.Value: tx.value % R,
                TxFieldTag.CallDataLength: len(tx.data),
                TxFieldTag.CallDataGasCost: sum(
                    4 if b == 0 else 16 for b in tx.data
                ),
                TxFieldTag.SigV: tx.v,
                TxFieldTag.SigR: tx.r % R,
                TxFieldTag.SigS: tx.s % R,
            }
            for tg in FIXED_TAGS:
                tx_ids.append(tid)
                tags.append(int(tg))
                idxs.append(0)
                fins.append(0)
                vals.append(fields[tg] if tid else 0)
        # calldata rows
        for ti, tx in enumerate(self.txs):
            for bi, byte in enumerate(tx.data):
                tx_ids.append(ti + 1)
                tags.append(int(TxFieldTag.CallData))
                idxs.append(bi)
                fins.append(int(bi == len(tx.data) - 1))
                vals.append(byte)
        # pad calldata region: zero rows marked final (no continuity)
        while len(tx_ids) < total:
            tx_ids.append(0)
            tags.append(int(TxFieldTag.CallData))
            idxs.append(0)
            fins.append(1)
            vals.append(0)
        if phase == 0:
            return {
                self.c_tx_id: mont(tx_ids),
                self.c_tag: mont(tags),
                self.c_index: mont(idxs),
                self.c_is_final: mont(fins),
            }
        return {self.c_value: mont(vals)}
