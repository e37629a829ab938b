"""Block circuit — fills the shared BlockTable.

Equivalent of the reference's BlockTable (`zkevm-circuits/src/
table.rs:1309`, assigned from the witness `Block`'s `BlockContext`):
one row per block-context field, consumed by the EVM circuit's
block-context opcode gadgets (TIMESTAMP, NUMBER, COINBASE, GASLIMIT,
CHAINID, BASEFEE, DIFFICULTY/PREVRANDAO).

Value conventions: raw integers for fields < 2^160 (coinbase address,
timestamp, number, gas limit, chain id, base fee); word RLC for the
256-bit difficulty/prevrandao word.  The PI circuit commits the same
fields into the public-input statement (binding the two is the
documented remaining step, reference pi_circuit block-table copies).
"""

from __future__ import annotations

import dataclasses
import enum

from ..crypto.field import fr
from ..crypto.params import FR_MODULUS as R
from ..plonk.circuit import Circuit, ConstraintSystem
from ..plonk.expression import Advice, Fixed
from .state import word_rlc

F = fr()


class BlockFieldTag(enum.IntEnum):
    Coinbase = 1
    Timestamp = 2
    Number = 3
    Difficulty = 4  # prevrandao post-merge: a full 256-bit word
    GasLimit = 5
    ChainId = 6
    BaseFee = 7


WORD_TAGS = (BlockFieldTag.Difficulty,)


class BlockCircuit(Circuit):
    """One row per field; `block` is a tracer BlockEnv."""

    def __init__(self, block):
        self.block = block

    def configure(self, cs: ConstraintSystem, challenge=None):
        self.q_row = cs.fixed_column()
        self.f_tag = cs.fixed_column()
        self.c_value = cs.advice_column(phase=1)
        self.r_word = (
            challenge if challenge is not None else cs.challenge(phase=0)
        )
        q = Fixed(self.q_row)
        self.block_table = [q, q * Fixed(self.f_tag), q * Advice(self.c_value)]

    def _fields(self):
        b = self.block
        return [
            (BlockFieldTag.Coinbase, b.coinbase),
            (BlockFieldTag.Timestamp, b.timestamp),
            (BlockFieldTag.Number, b.number),
            (BlockFieldTag.Difficulty, b.difficulty),
            (BlockFieldTag.GasLimit, b.gas_limit),
            (BlockFieldTag.ChainId, b.chain_id),
            (BlockFieldTag.BaseFee, b.base_fee),
        ]

    def fixed_columns(self, n: int):
        mont = F.mont_from_ints
        fields = self._fields()
        q = [1 if i < len(fields) else 0 for i in range(n)]
        tags = [int(t) for t, _ in fields] + [0] * (n - len(fields))
        return {self.q_row: mont(q), self.f_tag: mont(tags)}

    def synthesize(self, phase: int, n: int, challenges: dict, instances):
        if phase != 1:
            return {}
        import numpy as np

        r_chal = challenges[self.r_word.index]
        r_int = F.to_int(np.asarray(F.from_mont(np.asarray(r_chal))))
        mont = lambda vals: F.mont_from_ints_padded(vals, n)
        vals = [
            word_rlc(v, r_int) if t in WORD_TAGS else v % R
            for t, v in self._fields()
        ]
        return {self.c_value: mont(vals)}
