"""PI (public input) circuit — commits the chunk statement to the proof
instance via an in-circuit keccak binding.

Equivalent of the reference's `zkevm-circuits/src/pi_circuit.rs` (SURVEY.md
§2.2 "PI"): the public statement is a fixed-layout byte string hashed with
keccak; the 32-byte digest is exposed as TWO instance values (hi/lo
128-bit), and the byte string's hash is constrained by a lookup into the
KeccakTable.  The byte layout here is the production CHUNK HEADER of the
Scroll stack (reference aggregator/src/chunk.rs:18 `ChunkHash`):

    chain_id (8, BE) || prev_state_root (32) || post_state_root (32) ||
    withdraw_root (32) || data_hash (32)        = 136 bytes (1 keccak block)

TPU-first layout: one row per PI byte INCLUDING the keccak pad10*1 bytes
(the KeccakTable's input_rlc folds over the padded message, so the
statement rows are followed by 136 pad rows whose bytes are pinned by a
fixed column), a running msb-first RLC accumulator column, digest byte
cells + hi/lo recomposition on row 0, instance binding via two copy
constraints.  Standalone mode carries its own keccak-table witness
columns; the SuperCircuit passes the Keccak circuit's actual table.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..crypto.field import fr
from ..crypto.keccak import keccak256
from ..crypto.params import FR_MODULUS as R
from ..plonk.circuit import Cell, Circuit, ConstraintSystem, usable_rows
from ..plonk.expression import Advice, Fixed

F = fr()

N_PI_BYTES = 136
N_PADDED = 272  # pi_bytes || pad10*1 fills exactly two keccak blocks


def padded_pi_bytes(pi: bytes) -> bytes:
    assert len(pi) == N_PI_BYTES
    pad = bytearray(136)
    pad[0] = 0x01
    pad[-1] |= 0x80
    return pi + bytes(pad)


@dataclasses.dataclass
class PublicData:
    """The chunk statement (reference ChunkHash fields)."""

    chain_id: int
    prev_state_root: bytes
    post_state_root: bytes
    withdraw_root: bytes
    data_hash: bytes

    def pi_bytes(self) -> bytes:
        out = self.chain_id.to_bytes(8, "big")
        for fld in (self.prev_state_root, self.post_state_root,
                    self.withdraw_root, self.data_hash):
            assert len(fld) == 32
            out += fld
        assert len(out) == N_PI_BYTES
        return out

    def digest(self) -> bytes:
        return keccak256(self.pi_bytes())

    def instance(self) -> list[int]:
        d = self.digest()
        return [int.from_bytes(d[:16], "big"), int.from_bytes(d[16:], "big")]


ROOT_PREV_OFF = 8  # byte offset of prev_state_root in pi_bytes
ROOT_POST_OFF = 40


class PiCircuit(Circuit):
    def __init__(self, public_data: PublicData):
        self.pd = public_data

    # ------------------------------------------------------------------
    def configure(self, cs: ConstraintSystem, keccak_table=None,
                  byte_table=None, challenge=None):
        """keccak_table: (is_enabled, input_rlc, output_rlc) exprs from the
        Keccak circuit; standalone mode allocates witness columns."""
        self.standalone = keccak_table is None
        self.q_pi = cs.fixed_column()  # 1 on the N_PADDED byte rows
        self.q_one = cs.fixed_column()  # 1 on row 0 only
        self.q_pad = cs.fixed_column()  # 1 on the 136 keccak-pad rows
        self.f_pad = cs.fixed_column()  # expected pad byte on pad rows
        if byte_table is None:
            self.tbl_byte = cs.fixed_column()
            byte_table = [Fixed(self.tbl_byte)]

        self.c_byte = cs.advice_column()
        self.c_acc = cs.advice_column(phase=1)  # running msb-first RLC
        self.c_total = cs.advice_column(phase=1)  # final RLC, on row 0
        self.c_dig = [cs.advice_column() for _ in range(32)]
        self.c_hi = cs.advice_column()
        self.c_lo = cs.advice_column()
        self.inst = cs.instance_column()

        if self.standalone:
            self.t_en = cs.fixed_column()
            self.t_in = cs.advice_column(phase=1)
            self.t_out = cs.advice_column(phase=1)
            keccak_table = [
                Fixed(self.t_en), Advice(self.t_in), Advice(self.t_out)
            ]

        self.r = challenge if challenge is not None else cs.challenge(phase=0)

        q = Fixed(self.q_pi)
        q1 = Fixed(self.q_one)
        byte = Advice(self.c_byte)
        acc, acc_prev = Advice(self.c_acc), Advice(self.c_acc, -1)
        total = Advice(self.c_total)

        # running accumulator: acc_0 = byte_0; acc_i = acc_{i-1}*r + byte_i
        cs.create_gate("pi acc first", q1 * (acc - byte))
        cs.create_gate(
            "pi acc step", q * (1 - q1) * (acc - acc_prev * self.r - byte)
        )
        # keccak pad rows carry the fixed pad10*1 pattern
        cs.create_gate(
            "pi pad bytes", Fixed(self.q_pad) * (byte - Fixed(self.f_pad))
        )
        # total (row 0) = acc at the last padded row
        cs.create_gate(
            "pi total", q1 * (total - Advice(self.c_acc, N_PADDED - 1))
        )

        # digest cells: hi/lo recomposition (big-endian halves)
        dig = [Advice(c) for c in self.c_dig]
        hi, lo = Advice(self.c_hi), Advice(self.c_lo)

        def be_fold(cells):
            expr = None
            for c in cells:
                expr = c if expr is None else expr * 256 + c
            return expr

        cs.create_gate("pi digest hi", q1 * (be_fold(dig[:16]) - hi))
        cs.create_gate("pi digest lo", q1 * (be_fold(dig[16:]) - lo))

        # digest RLC in the KeccakTable's output convention:
        # sum_k digest_byte[k] * r^k (k ascending from byte 0)
        out_rlc = None
        rpow = None
        for k in range(32):
            term = dig[k] if k == 0 else dig[k] * rpow
            out_rlc = term if out_rlc is None else out_rlc + term
            rpow = self.r if rpow is None else rpow * self.r

        # the statement: keccak(pi_bytes) == digest
        cs.lookup_logup(
            "pi keccak", [[q1, q1 * total, q1 * out_rlc]], keccak_table
        )
        # byte ranges: pi bytes on all rows + digest bytes on row 0
        inputs = [[q * byte]] + [[q1 * d_] for d_ in dig]
        cs.lookup_logup("pi byte ranges", inputs, byte_table)

        # state-root byte folds: a running big-endian fold column over the
        # prev_state_root (rows 8..39) and post_state_root (rows 40..71)
        # byte rows; the cells at rows 39/71 equal the root FIELD values
        # and are exposed for copy-binding to the account-trie MPT
        # circuit's root cells (reference super_circuit.rs:698-707 state
        # root imports).  Mod-R encoding note: fold(bytes) == root mod R;
        # a non-canonical byte encoding (root + R) would satisfy the fold
        # but change the keccak digest, which the L1-side chunk-hash
        # recomputation rejects — the digest, not the fold, carries the
        # statement (documented divergence from the reference's hi/lo
        # split).
        self.q_rstart = cs.fixed_column()  # rows 8 and 40
        self.q_rstep = cs.fixed_column()  # rows 9..39 and 41..71
        self.c_rfold = cs.advice_column()
        rf, rf_prev = Advice(self.c_rfold), Advice(self.c_rfold, -1)
        cs.create_gate("pi root fold start", Fixed(self.q_rstart) * (rf - byte))
        cs.create_gate(
            "pi root fold step",
            Fixed(self.q_rstep) * (rf - rf_prev * 256 - byte),
        )
        cs.enable_equality("advice", self.c_rfold)
        cs.enable_equality("advice", self.c_hi)
        cs.enable_equality("advice", self.c_lo)
        cs.enable_equality("instance", self.inst)

    def state_root_cells(self):
        """(prev_root, post_root) fold cells — copy these to the account
        MPT circuit's first old_root / last new_root cells."""
        return (
            Cell("advice", self.c_rfold, ROOT_PREV_OFF + 31),
            Cell("advice", self.c_rfold, ROOT_POST_OFF + 31),
        )

    def copy_constraints(self, n: int):
        return [
            (Cell("instance", self.inst, 0), Cell("advice", self.c_hi, 0)),
            (Cell("instance", self.inst, 1), Cell("advice", self.c_lo, 0)),
        ]

    # ------------------------------------------------------------------
    def fixed_columns(self, n: int):
        assert usable_rows(n) >= max(N_PADDED, 256)
        mont = F.mont_from_ints
        padded = padded_pi_bytes(self.pd.pi_bytes())
        out = {
            self.q_pi: mont([1 if i < N_PADDED else 0 for i in range(n)]),
            self.q_one: mont([1 if i == 0 else 0 for i in range(n)]),
            self.q_pad: mont(
                [1 if N_PI_BYTES <= i < N_PADDED else 0 for i in range(n)]
            ),
            self.f_pad: mont(
                [padded[i] if N_PI_BYTES <= i < N_PADDED else 0
                 for i in range(n)]
            ),
            self.q_rstart: mont(
                [1 if i in (ROOT_PREV_OFF, ROOT_POST_OFF) else 0
                 for i in range(n)]
            ),
            self.q_rstep: mont(
                [1 if (ROOT_PREV_OFF < i < ROOT_PREV_OFF + 32
                       or ROOT_POST_OFF < i < ROOT_POST_OFF + 32) else 0
                 for i in range(n)]
            ),
        }
        if hasattr(self, "tbl_byte"):
            out[self.tbl_byte] = mont([i if i < 256 else 0 for i in range(n)])
        if self.standalone:
            out[self.t_en] = mont([1 if i == 0 else 0 for i in range(n)])
        return out

    def synthesize(self, phase: int, n: int, challenges: dict, instances):
        mont = lambda vals: F.mont_from_ints_padded(vals, n)
        pi = padded_pi_bytes(self.pd.pi_bytes())
        dig = self.pd.digest()
        if phase == 0:
            cols = {self.c_byte: mont(list(pi))}
            for k in range(32):
                cols[self.c_dig[k]] = mont([dig[k]])
            hi, lo = self.pd.instance()
            cols[self.c_hi] = mont([hi])
            cols[self.c_lo] = mont([lo])
            rfold = [0] * N_PADDED
            for off in (ROOT_PREV_OFF, ROOT_POST_OFF):
                acc = 0
                for j in range(32):
                    acc = (acc * 256 + pi[off + j]) % R
                    rfold[off + j] = acc
            cols[self.c_rfold] = mont(rfold)
            return cols
        # phase 1: RLC accumulators under the keccak challenge
        r_chal = challenges[self.r.index]
        r_int = F.to_int(np.asarray(F.from_mont(np.asarray(r_chal))))
        accs = []
        acc = 0
        for b in pi:
            acc = (acc * r_int + b) % R
            accs.append(acc)
        out_rlc = 0
        for k in reversed(range(32)):
            out_rlc = (out_rlc * r_int + dig[k]) % R
        cols = {
            self.c_acc: mont(accs),
            self.c_total: mont([accs[-1]]),
        }
        if self.standalone:
            cols[self.t_in] = mont([accs[-1]])
            cols[self.t_out] = mont([out_rlc])
        return cols
