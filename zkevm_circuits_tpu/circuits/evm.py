"""EVM circuit — proves the execution trace step by step.

Equivalent of the reference's `zkevm-circuits/src/evm_circuit/` (SURVEY.md
§2.2 "EVM"): each execution step constrains its state transition
(pc / gas / rw_counter / stack_pointer) and its bus accesses against the
RW table.

TPU-first redesign (vs the reference's 141-col x 21-row step regions +
CellManager):
  * ONE row per execution step; every gadget's cells are dedicated
    columns on that row.  Witness assignment is a single columnar numpy
    pass over all steps (the reference's per-step `assign_exec_step`
    rayon loop becomes table construction, SURVEY.md §7.1).
  * Execution states are one-hot indicator columns; each gadget's
    constraints are gated by its indicator — so the quotient pass
    evaluates every gadget exactly once over the whole column, fully
    vectorized.
  * Bus accesses ride ONE logUp argument whose table is the RW table
    (provided as witness columns here, exactly like the reference's dev
    mode loads the RwTable; the SuperCircuit ties it to the State circuit
    by sharing the actual columns).

Gadget coverage: PUSHn, POP, ADD, SUB (AddWords ripple-carry), MUL, DIV,
MOD (MulAddWords 512-bit limb products + carry banks, zero-divisor
semantics), LT, GT (LtWord borrow split), EQ, ISZERO (inverse witness),
NOT (bytewise complement), DUPn, SWAPn, PC, JUMPDEST, MLOAD, MSTORE
(per-byte memory bus), STOP.  Stack values are byte-RLC words under the
phase-0 challenge.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..crypto.field import fr
from ..crypto.params import FR_MODULUS as R
from ..plonk.circuit import Circuit, ConstraintSystem, usable_rows
from ..plonk.expression import Advice, Expression, Fixed
from ..types.evm import OpcodeId
from ..witness.builder import ExecStep, STACK_BASE
from ..witness.rw import Rw, RwTag
from .state import word_rlc

F = fr()

# implemented execution states, in gate order
GADGETS = [
    "PUSH", "POP", "ADD", "SUB", "MUL", "DIV", "MOD", "LT", "GT", "EQ",
    "ISZERO", "NOT", "EXP", "CALLDATACOPY", "DUP", "SWAP", "PC", "JUMPDEST",
    "MLOAD", "MSTORE", "STOP",
]


@dataclasses.dataclass
class EvmParams:
    target_steps: int = 0  # 0 => usable rows
    rw_target: int = 0


class EvmCircuit(Circuit):
    """Standalone EVM circuit over (steps, rws) witness.

    `steps`: list of ExecStep from the builder (only implemented opcodes).
    `rws`: the RW records the steps reference (chronological by counter).
    """

    def __init__(self, steps: list[ExecStep], rws: list[Rw],
                 params: EvmParams | None = None):
        self.steps = [s for s in steps if s.exec_state not in ("BeginTx", "EndTx")]
        self.rw_by_counter = {r.rw_counter: r for r in rws}
        self.params = params or EvmParams()

    # ------------------------------------------------------------------
    def configure(self, cs: ConstraintSystem, rw_table=None, challenge=None,
                  exp_table=None, copy_table=None):
        """`rw_table`: optional 6 expressions (rw_counter, is_write, tag,
        id, address, value) — the SuperCircuit passes the State circuit's
        recomposed columns; standalone mode allocates its own table.
        `challenge`: optional shared word-RLC challenge.
        `exp_table` / `copy_table`: the Exp/Copy circuits' exposed tables;
        the EXP / CALLDATACOPY gadgets are only usable when given (their
        steps are rejected at synthesis otherwise)."""
        self.standalone = rw_table is None
        self.exp_table = exp_table
        self.copy_table = copy_table
        self.q_step = cs.fixed_column()
        if self.standalone:
            self.q_rw = cs.fixed_column()

        # step columns
        self.c_ind = {g: cs.advice_column() for g in GADGETS}
        self.c_pc = cs.advice_column()
        self.c_gas_cost = cs.advice_column()
        self.c_rwc = cs.advice_column()  # rw_counter at step start
        self.c_sp = cs.advice_column()  # stack pointer (1024 = empty)
        self.c_call_id = cs.advice_column()
        self.c_push_len = cs.advice_column()  # for PUSHn: n (1..32)
        self.c_depth_n = cs.advice_column()  # for DUPn/SWAPn: n
        self.c_val_a = cs.advice_column(phase=1)  # operand / result RLCs
        self.c_val_b = cs.advice_column(phase=1)
        self.c_val_c = cs.advice_column(phase=1)
        # word gadget cells (reference math_gadget/{add_words,mul_add_words,
        # lt_word}.rs): byte decompositions of up to four words + a carry
        # bank whose meaning is per-gadget (ADD/SUB: 32 ripple carry bits;
        # MUL/DIV/MOD: 9+9 carry bytes + borrow bit; LT/GT: borrow bit)
        self.c_bytes_a = [cs.advice_column() for _ in range(32)]
        self.c_bytes_b = [cs.advice_column() for _ in range(32)]
        self.c_bytes_c = [cs.advice_column() for _ in range(32)]
        self.c_bytes_d = [cs.advice_column() for _ in range(32)]
        self.c_carry = [cs.advice_column() for _ in range(32)]
        self.c_inv = cs.advice_column(phase=1)  # IsZero inverse witness
        self.c_inv2 = cs.advice_column(phase=1)  # second inverse (EXP/CDC)
        self.c_ez = cs.advice_column()  # EXP: exponent==0; CDC: length==0
        self.c_eo = cs.advice_column()  # EXP: exponent==1
        # memory-bus cells: the word crossing memory (big-endian byte j ->
        # address addr+j) + a 4-byte decomposition of the address word
        self.c_mem = [cs.advice_column() for _ in range(32)]
        self.c_addr = [cs.advice_column() for _ in range(4)]
        self.tbl_byte = cs.fixed_column()

        if self.standalone:
            # in-circuit RW table columns (the SuperCircuit points these
            # lookups at the State circuit's columns instead)
            self.t_rwc = cs.advice_column()
            self.t_is_write = cs.advice_column()
            self.t_tag = cs.advice_column()
            self.t_id = cs.advice_column()
            self.t_addr = cs.advice_column()
            self.t_val = cs.advice_column(phase=1)

        self.r_word = (
            challenge if challenge is not None else cs.challenge(phase=0)
        )

        q = Fixed(self.q_step)
        ind = {g: Advice(c) for g, c in self.c_ind.items()}
        pc, pc_n = Advice(self.c_pc), Advice(self.c_pc, 1)
        rwc, rwc_n = Advice(self.c_rwc), Advice(self.c_rwc, 1)
        sp, sp_n = Advice(self.c_sp), Advice(self.c_sp, 1)
        plen = Advice(self.c_push_len)
        va, vb, vc = (
            Advice(self.c_val_a), Advice(self.c_val_b), Advice(self.c_val_c)
        )
        q_n = Fixed(self.q_step, 1)  # next row is still a step

        # indicators boolean + exactly one active per step row
        sum_ind: Expression | None = None
        for g, e in ind.items():
            cs.create_gate(f"ind {g} bool", q * e * (e - 1))
            sum_ind = e if sum_ind is None else sum_ind + e
        cs.create_gate("one gadget per step", q * (sum_ind - 1))

        def transition(indicator, d_pc, d_rwc, d_sp):
            """Common state-transition constraints, gated to rows whose
            successor is also a step row (the last step ends the chain)."""
            gate = q * q_n * indicator
            cs.create_gate("pc step", gate * (pc_n - pc - d_pc))
            cs.create_gate("rwc step", gate * (rwc_n - rwc - d_rwc))
            cs.create_gate("sp step", gate * (sp_n - sp - d_sp))

        # PUSH: writes one stack value (va) at sp-1; pc += 1 + plen
        gate_push = q * q_n * ind["PUSH"]
        cs.create_gate("PUSH pc", gate_push * (pc_n - pc - 1 - plen))
        cs.create_gate("PUSH rwc", gate_push * (rwc_n - rwc - 1))
        cs.create_gate("PUSH sp", gate_push * (sp_n - sp + 1))
        # POP: reads one value; sp += 1, rwc += 1, pc += 1
        transition(ind["POP"], 1, 1, 1)
        # binary word ops: read two, write one; sp += 1, rwc += 3, pc += 1
        for g in ("ADD", "SUB", "MUL", "DIV", "MOD", "LT", "GT", "EQ", "EXP"):
            transition(ind[g], 1, 3, 1)
        # unary word ops: read one, write one; sp 0, rwc += 2, pc += 1
        transition(ind["ISZERO"], 1, 2, 0)
        transition(ind["NOT"], 1, 2, 0)
        # DUPn: 1 read + 1 write; sp -= 1, rwc += 2, pc += 1
        transition(ind["DUP"], 1, 2, -1)
        # SWAPn: 2 reads + 2 writes; sp unchanged, rwc += 4, pc += 1
        transition(ind["SWAP"], 1, 4, 0)
        # PC: pushes the pc value; sp -= 1, rwc += 1
        transition(ind["PC"], 1, 1, -1)
        # PC semantics: the pushed word equals pc (< 2^16 here => its RLC
        # is pc_lo + r*pc_hi; bind bytes via the shared byte cells)
        gpc = q * ind["PC"]
        cs.create_gate(
            "PC value",
            gpc * (Advice(self.c_bytes_a[0])
                   + 256 * Advice(self.c_bytes_a[1]) - pc),
        )
        cs.create_gate(
            "PC rlc",
            gpc * (Advice(self.c_bytes_a[0])
                   + self.r_word * Advice(self.c_bytes_a[1]) - va),
        )
        # JUMPDEST: no-op; pc += 1
        transition(ind["JUMPDEST"], 1, 0, 0)
        # MLOAD: read addr, read 32 mem bytes, write word; sp 0, rwc += 34
        transition(ind["MLOAD"], 1, 34, 0)
        # MSTORE: read addr, read value, write 32 mem bytes; sp += 2
        transition(ind["MSTORE"], 1, 34, 2)
        # STOP: terminal — no transition constraints

        # ---- word-sum gadget (AddWords): x + y = z mod 2^256 over byte
        # cells, shared by ADD (va+vb=vc) and SUB (vc+vb=va) ----------------
        gw = q * (ind["ADD"] + ind["SUB"])
        ba = [Advice(c) for c in self.c_bytes_a]
        bb = [Advice(c) for c in self.c_bytes_b]
        bc = [Advice(c) for c in self.c_bytes_c]
        cr = [Advice(c) for c in self.c_carry]
        # byte-wise ripple: x_i + y_i + carry_in = z_i + 256*carry_out
        for i in range(32):
            cin = cr[i - 1] if i else 0
            cs.create_gate(
                f"ADD byte {i}",
                gw * (ba[i] + bb[i] + cin - bc[i] - 256 * cr[i]),
            )
            cs.create_gate(f"ADD carry {i} bool", gw * cr[i] * (cr[i] - 1))
        # bind byte cells to the RLC operands (challenge powers are
        # degree-0, so these stay linear in the advice)
        def rlc_expr(bytes_):
            expr = None
            rpow = None
            for i, b in enumerate(bytes_):
                term = b if i == 0 else b * rpow
                expr = term if expr is None else expr + term
                rpow = self.r_word if rpow is None else rpow * self.r_word
            return expr

        ga = q * ind["ADD"]
        gs = q * ind["SUB"]
        cs.create_gate("ADD a rlc", ga * (rlc_expr(ba) - va))
        cs.create_gate("ADD b rlc", ga * (rlc_expr(bb) - vb))
        cs.create_gate("ADD c rlc", ga * (rlc_expr(bc) - vc))
        # SUB: va - vb = vc  <=>  bytes hold (x=vc, y=vb, z=va)
        cs.create_gate("SUB x rlc", gs * (rlc_expr(ba) - vc))
        cs.create_gate("SUB y rlc", gs * (rlc_expr(bb) - vb))
        cs.create_gate("SUB z rlc", gs * (rlc_expr(bc) - va))

        # ---- MulAddWords gadget (reference math_gadget/mul_add_words.rs):
        # x * y + z = w over 64-bit limbs of the byte cells, with 9-byte
        # carry banks in c_carry[0..8] (lo) and c_carry[9..17] (hi) --------
        bd = [Advice(c) for c in self.c_bytes_d]
        L64, L128 = 1 << 64, 1 << 128

        def limb64(bytes_, k):
            expr = None
            for i in range(8):
                term = bytes_[8 * k + i] * (1 << (8 * i))
                expr = term if expr is None else expr + term
            return expr

        def half128(bytes_, lo: bool):
            base = 0 if lo else 16
            expr = None
            for i in range(16):
                term = bytes_[base + i] * (1 << (8 * i))
                expr = term if expr is None else expr + term
            return expr

        def carry_bank(lo: bool):
            base = 0 if lo else 9
            expr = None
            for i in range(9):
                term = cr[base + i] * (1 << (8 * i))
                expr = term if expr is None else expr + term
            return expr

        def mul_t(x_bytes, y_bytes):
            lx = [limb64(x_bytes, k) for k in range(4)]
            ly = [limb64(y_bytes, k) for k in range(4)]
            t = []
            for k in range(7):
                expr = None
                for i in range(4):
                    j = k - i
                    if 0 <= j < 4:
                        term = lx[i] * ly[j]
                        expr = term if expr is None else expr + term
                t.append(expr)
            return t

        cl, ch = carry_bank(True), carry_bank(False)
        # MUL: a * b = c (mod 2^256); overflow limbs discarded
        gm = q * ind["MUL"]
        tm = mul_t(ba, bb)
        cs.create_gate(
            "MUL lo", gm * (tm[0] + tm[1] * L64 - half128(bc, True) - cl * L128)
        )
        cs.create_gate(
            "MUL hi",
            gm * (tm[2] + tm[3] * L64 + cl - half128(bc, False) - ch * L128),
        )
        cs.create_gate("MUL a rlc", gm * (rlc_expr(ba) - va))
        cs.create_gate("MUL b rlc", gm * (rlc_expr(bb) - vb))
        cs.create_gate("MUL c rlc", gm * (rlc_expr(bc) - vc))

        # DIV/MOD: dividend a (bytes_a), divisor b (bytes_b), quotient q
        # (bytes_c), remainder r (bytes_d): q*b + r = a with NO 2^256
        # overflow, r < b when b != 0; pushed value is q (DIV) / r (MOD),
        # forced to 0 when the divisor is zero (EVM semantics).
        inv = Advice(self.c_inv)
        gdm = q * (ind["DIV"] + ind["MOD"])
        td = mul_t(bc, bb)
        cs.create_gate(
            "DIVMOD lo",
            gdm * (td[0] + td[1] * L64 + half128(bd, True)
                   - half128(ba, True) - cl * L128),
        )
        cs.create_gate(
            "DIVMOD hi",
            gdm * (td[2] + td[3] * L64 + half128(bd, False) + cl
                   - half128(ba, False) - ch * L128),
        )
        # q*b + r == a exactly: everything above bit 255 vanishes
        cs.create_gate("DIVMOD no overflow", gdm * (ch + td[4] + td[5] + td[6]))
        cs.create_gate("DIVMOD a rlc", gdm * (rlc_expr(ba) - va))
        cs.create_gate("DIVMOD b rlc", gdm * (rlc_expr(bb) - vb))
        # divisor-is-zero flag: bz = 1 - vb*inv with vb*bz = 0
        nz = vb * inv  # 1 iff divisor != 0 (given the gate below)
        cs.create_gate("DIVMOD divisor iszero", gdm * vb * (1 - nz))
        cs.create_gate(
            "DIV result", q * ind["DIV"] * (vc - nz * rlc_expr(bc))
        )
        cs.create_gate(
            "MOD result", q * ind["MOD"] * (vc - nz * rlc_expr(bd))
        )
        # r < b when b != 0: diff = r - b + 2^256 held in c_mem bytes
        mem_b = [Advice(c) for c in self.c_mem]
        bor2 = cr[18]
        cs.create_gate("DIVMOD borrow bool", gdm * bor2 * (bor2 - 1))
        cs.create_gate(
            "DIVMOD r<b lo",
            gdm * nz * (half128(bd, True) - half128(bb, True)
                        + bor2 * L128 - half128(mem_b, True)),
        )
        cs.create_gate(
            "DIVMOD r<b hi",
            gdm * nz * (half128(bd, False) - half128(bb, False) - bor2
                        + L128 - half128(mem_b, False)),
        )

        # LT/GT (reference math_gadget/lt_word.rs): result = x < y with
        # diff = x - y + result*2^256 in bytes_c; GT swaps the operands.
        glt, ggt = q * ind["LT"], q * ind["GT"]
        gcmp = q * (ind["LT"] + ind["GT"])
        bor1 = cr[0]
        cs.create_gate("CMP result bool", gcmp * vc * (vc - 1))
        cs.create_gate("CMP borrow bool", gcmp * bor1 * (bor1 - 1))
        cs.create_gate(
            "CMP diff lo",
            gcmp * (half128(ba, True) - half128(bb, True) + bor1 * L128
                    - half128(bc, True)),
        )
        cs.create_gate(
            "CMP diff hi",
            gcmp * (half128(ba, False) - half128(bb, False) - bor1
                    + vc * L128 - half128(bc, False)),
        )
        cs.create_gate("LT x rlc", glt * (rlc_expr(ba) - va))
        cs.create_gate("LT y rlc", glt * (rlc_expr(bb) - vb))
        cs.create_gate("GT x rlc", ggt * (rlc_expr(ba) - vb))
        cs.create_gate("GT y rlc", ggt * (rlc_expr(bb) - va))

        # EQ / ISZERO: result from an IsZero inverse witness (reference
        # math_gadget/is_zero.rs); operands compared as word RLCs
        geq = q * ind["EQ"]
        cs.create_gate("EQ result", geq * (vc - 1 + (va - vb) * inv))
        cs.create_gate("EQ kill", geq * (va - vb) * vc)
        giz = q * ind["ISZERO"]
        cs.create_gate("ISZERO result", giz * (vc - 1 + va * inv))
        cs.create_gate("ISZERO kill", giz * va * vc)

        # NOT: bytewise complement
        gnot = q * ind["NOT"]
        for i in range(32):
            cs.create_gate(f"NOT byte {i}", gnot * (ba[i] + bc[i] - 255))
        cs.create_gate("NOT a rlc", gnot * (rlc_expr(ba) - va))
        cs.create_gate("NOT c rlc", gnot * (rlc_expr(bc) - vc))

        # ---- EXP: lookup into the Exp circuit's table (reference
        # evm_circuit/execution/exp.rs); exponent 0/1 handled arithmetically
        # (the Exp circuit only proves exponent >= 2 events) ---------------
        inv2 = Advice(self.c_inv2)
        ez, eo = Advice(self.c_ez), Advice(self.c_eo)
        ge = q * ind["EXP"]
        gc = q * ind["CALLDATACOPY"]
        cs.create_gate("flag ez bool", (ge + gc) * ez * (ez - 1))
        cs.create_gate("flag eo bool", ge * eo * (eo - 1))
        cs.create_gate("EXP ez kill", ge * ez * vb)
        cs.create_gate("EXP eo kill", ge * eo * (vb - 1))
        cs.create_gate(
            "EXP flags complete",
            ge * (1 - ez - eo) * (vb * (vb - 1) * inv2 - 1),
        )
        cs.create_gate("EXP zero result", ge * ez * (vc - 1))  # x^0 = 1
        cs.create_gate("EXP one result", ge * eo * (vc - va))  # x^1 = x
        cs.create_gate("EXP base rlc", ge * (rlc_expr(ba) - va))
        cs.create_gate("EXP exponent rlc", ge * (rlc_expr(bb) - vb))
        cs.create_gate("EXP result rlc", ge * (rlc_expr(bc) - vc))
        if self.exp_table is not None:
            gt = ge * (1 - ez - eo)
            cs.lookup_logup(
                "EXP table",
                [[
                    gt, gt * half128(ba, True), gt * half128(ba, False),
                    gt * half128(bb, True), gt * half128(bb, False),
                    gt * half128(bc, True), gt * half128(bc, False),
                ]],
                self.exp_table,
            )

        # ---- CALLDATACOPY: 3 stack pops (dst, src, len) + a Copy circuit
        # event covering the per-byte memory writes (reference
        # evm_circuit/execution/calldatacopy.rs).  Addresses/length are
        # 4-byte words: dst in c_addr, src in bytes_a[0:4], len in
        # bytes_b[0:4].  src_id == call_id (root-call frames; nested calls
        # land with the call opcodes). ------------------------------------
        ab4 = [Advice(c) for c in self.c_addr]

        def fold4_rlc(cells):
            e = cells[0] + cells[1] * self.r_word
            e = e + cells[2] * self.r_word * self.r_word
            return e + cells[3] * self.r_word * self.r_word * self.r_word

        def fold4_int(cells):
            return (cells[0] + cells[1] * 256 + cells[2] * 65536
                    + cells[3] * 16777216)

        cs.create_gate("CDC dst rlc", gc * (fold4_rlc(ab4) - va))
        cs.create_gate("CDC src rlc", gc * (fold4_rlc(ba) - vb))
        cs.create_gate("CDC len rlc", gc * (fold4_rlc(bb) - vc))
        cs.create_gate("CDC len zero kill", gc * ez * vc)
        cs.create_gate("CDC len nonzero", gc * (1 - ez) * (vc * inv2 - 1))
        # transitions: pc += 1, sp += 3, rwc += 3 + len
        gcn = q * q_n * ind["CALLDATACOPY"]
        cs.create_gate("CDC pc", gcn * (pc_n - pc - 1))
        cs.create_gate("CDC sp", gcn * (sp_n - sp - 3))
        cs.create_gate(
            "CDC rwc", gcn * (rwc_n - rwc - 3 - fold4_int(bb))
        )
        if self.copy_table is not None:
            gl = gc * (1 - ez)
            cs.lookup_logup(
                "CDC copy event",
                [[
                    gl, gl * Advice(self.c_call_id),
                    gl * fold4_int(ba), gl * Advice(self.c_call_id),
                    gl * fold4_int(ab4), gl * fold4_int(bb),
                    gl * (rwc + 3),
                ]],
                self.copy_table,
            )

        # byte range checks: every word-gadget byte cell rides one logUp
        # argument, gated by q alone (padding/unused cells are 0 = valid)
        all_byte_cols = (
            self.c_bytes_a + self.c_bytes_b + self.c_bytes_c
            + self.c_bytes_d + self.c_carry + self.c_mem + self.c_addr
        )
        byte_inputs = [[q * Advice(c)] for c in all_byte_cols]
        cs.lookup_logup("byte ranges", byte_inputs, [Fixed(self.tbl_byte)])

        # ---- bus accesses via one logUp into the rw table -----------------
        if self.standalone:
            tq = Fixed(self.q_rw)
            table = [
                tq * Advice(self.t_rwc),
                tq * Advice(self.t_is_write),
                tq * Advice(self.t_tag),
                tq * Advice(self.t_id),
                tq * Advice(self.t_addr),
                tq * Advice(self.t_val),
            ]
        else:
            table = rw_table
        cid = Advice(self.c_call_id)
        stack = int(RwTag.Stack)
        gbin = None
        for g in ("ADD", "SUB", "MUL", "DIV", "MOD", "LT", "GT", "EQ", "EXP"):
            gbin = ind[g] if gbin is None else gbin + ind[g]
        gbin = q * gbin
        gun = q * (ind["ISZERO"] + ind["NOT"])
        gcdc = q * ind["CALLDATACOPY"]

        def access(gate, d_rwc, is_write, addr_expr, val_expr,
                   tag: int = stack):
            return [
                gate * (rwc + d_rwc),
                gate * is_write,
                gate * tag,
                gate * cid,
                gate * addr_expr,
                gate * val_expr,
            ]

        nd = Advice(self.c_depth_n)
        inputs = [
            # PUSH: write va at sp-1
            access(q * ind["PUSH"], 0, 1, sp - 1, va),
            # POP: read va at sp
            access(q * ind["POP"], 0, 0, sp, va),
            # binary ops: read va@sp, read vb@sp+1, write vc@sp+1
            access(gbin, 0, 0, sp, va),
            access(gbin, 1, 0, sp + 1, vb),
            access(gbin, 2, 1, sp + 1, vc),
            # unary ops: read va@sp, write vc@sp
            access(gun, 0, 0, sp, va),
            access(gun, 1, 1, sp, vc),
            # CALLDATACOPY: read dst@sp, src@sp+1, len@sp+2
            access(gcdc, 0, 0, sp, va),
            access(gcdc, 1, 0, sp + 1, vb),
            access(gcdc, 2, 0, sp + 2, vc),
            # DUPn: read va@(sp+n-1), write va@(sp-1)
            access(q * ind["DUP"], 0, 0, sp + nd - 1, va),
            access(q * ind["DUP"], 1, 1, sp - 1, va),
            # SWAPn: read va@sp, read vb@(sp+n), write va@(sp+n), write vb@sp
            access(q * ind["SWAP"], 0, 0, sp, va),
            access(q * ind["SWAP"], 1, 0, sp + nd, vb),
            access(q * ind["SWAP"], 2, 1, sp + nd, va),
            access(q * ind["SWAP"], 3, 1, sp, vb),
            # PC: write va at sp-1
            access(q * ind["PC"], 0, 1, sp - 1, va),
        ]

        # ---- memory word gadgets ------------------------------------------
        mem = [Advice(c) for c in self.c_mem]  # big-endian: mem[j] @ addr+j
        ab = [Advice(c) for c in self.c_addr]  # le bytes of the address
        addr_expr = ab[0] + 256 * ab[1] + 65536 * ab[2] + 16777216 * ab[3]
        gml = q * ind["MLOAD"]
        gms = q * ind["MSTORE"]
        gmem = q * (ind["MLOAD"] + ind["MSTORE"])
        # address word RLC binding (addr < 2^32: higher RLC bytes vanish)
        addr_rlc = ab[0] + self.r_word * ab[1] \
            + self.r_word * self.r_word * ab[2] \
            + self.r_word * self.r_word * self.r_word * ab[3]
        cs.create_gate("MEM addr rlc", gmem * (addr_rlc - va))
        # word RLC binding: le byte i of the word is mem[31-i]
        def word_rlc_from_mem():
            expr = None
            rpow = None
            for i in range(32):
                b = mem[31 - i]
                term = b if i == 0 else b * rpow
                expr = term if expr is None else expr + term
                rpow = self.r_word if rpow is None else rpow * self.r_word
            return expr

        cs.create_gate("MEM word rlc", gmem * (word_rlc_from_mem() - vb))
        # stack accesses
        inputs.append(access(gml, 0, 0, sp, va))           # MLOAD addr pop
        inputs.append(access(gml, 33, 1, sp, vb))          # MLOAD result
        inputs.append(access(gms, 0, 0, sp, va))           # MSTORE addr pop
        inputs.append(access(gms, 1, 0, sp + 1, vb))       # MSTORE value pop
        # per-byte memory bus accesses
        memtag = int(RwTag.Memory)
        for j in range(32):
            inputs.append(
                access(gml, 1 + j, 0, addr_expr + j, mem[j], tag=memtag)
            )
            inputs.append(
                access(gms, 2 + j, 1, addr_expr + j, mem[j], tag=memtag)
            )
        cs.lookup_logup("rw bus", inputs, table)

    # ------------------------------------------------------------------
    def _target(self, n: int) -> int:
        t = self.params.target_steps or usable_rows(n)
        assert len(self.steps) <= t <= usable_rows(n)
        return t

    def _rw_target(self, n: int) -> int:
        t = self.params.rw_target or usable_rows(n)
        return t

    def fixed_columns(self, n: int):
        t = self._target(n)
        assert n >= 256, "domain must fit the byte range table"
        mont = lambda vals: F.from_ints([v % R * F.R % R for v in vals])
        out = {
            self.q_step: mont([1 if i < t else 0 for i in range(n)]),
            self.tbl_byte: mont([i if i < 256 else 0 for i in range(n)]),
        }
        if self.standalone:
            rt = self._rw_target(n)
            out[self.q_rw] = mont([1 if i < rt else 0 for i in range(n)])
        return out

    def _classify(self, s: ExecStep) -> str:
        if s.op is not None and s.op.is_push:
            return "PUSH"
        if s.op is not None and s.op.is_dup:
            return "DUP"
        if s.op is not None and s.op.is_swap:
            return "SWAP"
        assert s.exec_state in GADGETS, f"unsupported opcode {s.exec_state}"
        return s.exec_state

    def synthesize(self, phase: int, n: int, challenges: dict, instances):
        t = self._target(n)
        steps = self.steps
        mont = lambda vals: F.from_ints(
            [v % R * F.R % R for v in vals] + [0] * (n - len(vals))
        )
        if phase == 0:
            cols = {}
            kinds = [self._classify(s) for s in steps]
            for g in GADGETS:
                base = [int(k == g) for k in kinds]
                # padding rows are STOP steps (terminal, no transitions)
                pad = [1 if g == "STOP" else 0] * (t - len(steps))
                cols[self.c_ind[g]] = mont(base + pad)
            cols[self.c_pc] = mont([s.pc for s in steps])
            cols[self.c_gas_cost] = mont([s.gas_cost for s in steps])
            cols[self.c_rwc] = mont([s.rw_counter_start for s in steps])
            cols[self.c_sp] = mont([s.stack_pointer for s in steps])
            cols[self.c_call_id] = mont([s.call_id for s in steps])
            plens = [
                s.op.push_len if (s.op is not None and s.op.is_push) else 0
                for s in steps
            ]
            cols[self.c_push_len] = mont(plens)
            depth = [
                (s.op - 0x7F) if (s.op is not None and s.op.is_dup)
                else (s.op - 0x8F) if (s.op is not None and s.op.is_swap)
                else 0
                for s in steps
            ]
            cols[self.c_depth_n] = mont(depth)
            # AddWords byte cells + carries (ADD: a+b=c; SUB: c+b=a; PC
            # borrows bytes_a for the pc decomposition)
            n_steps = len(steps)
            byts = {k: [[0] * n_steps for _ in range(32)] for k in "abcd"}
            carries = [[0] * n_steps for _ in range(32)]
            membytes = [[0] * n_steps for _ in range(32)]
            addrbytes = [[0] * n_steps for _ in range(4)]
            ez_col = [0] * n_steps
            eo_col = [0] * n_steps
            M128, M256 = (1 << 128) - 1, 1 << 256

            def set_word(key, si, w):
                le = w.to_bytes(32, "little")
                for i in range(32):
                    byts[key][i][si] = le[i]

            def mul_carries(x, y, z, w):
                """carry bytes for x*y + z = w (mod 2^256)."""
                lx = [(x >> (64 * k)) & ((1 << 64) - 1) for k in range(4)]
                ly = [(y >> (64 * k)) & ((1 << 64) - 1) for k in range(4)]
                t = [
                    sum(lx[i] * ly[k - i] for i in range(4) if 0 <= k - i < 4)
                    for k in range(4)
                ]
                cl = (t[0] + (t[1] << 64) + (z & M128) - (w & M128)) >> 128
                ch = (t[2] + (t[3] << 64) + (z >> 128) + cl
                      - ((w >> 128) & M128)) >> 128
                assert 0 <= cl < (1 << 72) and 0 <= ch < (1 << 72)
                return cl, ch

            def set_carry_bytes(si, cl, ch, bor=None):
                clb = cl.to_bytes(9, "little")
                chb = ch.to_bytes(9, "little")
                for i in range(9):
                    carries[i][si] = clb[i]
                    carries[9 + i][si] = chb[i]
                if bor is not None:
                    carries[18][si] = bor

            for si, s in enumerate(steps):
                kind = self._classify(s)
                ops = [self.rw_by_counter[i] for i in s.rw_indices]
                if kind == "PC":
                    byts["a"][0][si] = s.pc & 0xFF
                    byts["a"][1][si] = (s.pc >> 8) & 0xFF
                elif kind in ("MLOAD", "MSTORE"):
                    addr = ops[0].value
                    for i in range(4):
                        addrbytes[i][si] = (addr >> (8 * i)) & 0xFF
                    mem_ops = (
                        ops[1:33] if kind == "MLOAD" else ops[2:34]
                    )
                    for j, op_ in enumerate(mem_ops):
                        membytes[j][si] = op_.value
                elif kind in ("ADD", "SUB"):
                    if kind == "ADD":
                        words = dict(
                            a=ops[0].value, b=ops[1].value, c=ops[2].value
                        )
                    else:  # SUB: x=result, y=subtrahend, z=minuend
                        words = dict(
                            a=ops[2].value, b=ops[1].value, c=ops[0].value
                        )
                    for key, w in words.items():
                        set_word(key, si, w)
                    carry = 0
                    for i in range(32):
                        tot = byts["a"][i][si] + byts["b"][i][si] + carry
                        carry = tot >> 8
                        carries[i][si] = carry
                elif kind == "MUL":
                    x, y, w = ops[0].value, ops[1].value, ops[2].value
                    set_word("a", si, x)
                    set_word("b", si, y)
                    set_word("c", si, w)
                    set_carry_bytes(si, *mul_carries(x, y, 0, w))
                elif kind in ("DIV", "MOD"):
                    a_, b_ = ops[0].value, ops[1].value
                    qv = a_ // b_ if b_ else 0
                    r_ = a_ - qv * b_ if b_ else a_
                    set_word("a", si, a_)
                    set_word("b", si, b_)
                    set_word("c", si, qv)
                    set_word("d", si, r_)
                    bor = int((r_ & M128) < (b_ & M128))
                    set_carry_bytes(si, *mul_carries(qv, b_, r_, a_), bor=bor)
                    diff = (r_ - b_ + M256) % M256 if b_ else 0
                    db = diff.to_bytes(32, "little")
                    for j in range(32):
                        membytes[j][si] = db[j]
                elif kind in ("LT", "GT"):
                    x = ops[0].value if kind == "LT" else ops[1].value
                    y = ops[1].value if kind == "LT" else ops[0].value
                    res = ops[2].value
                    set_word("a", si, x)
                    set_word("b", si, y)
                    set_word("c", si, x - y + res * M256)
                    carries[0][si] = int((x & M128) < (y & M128))
                elif kind == "NOT":
                    set_word("a", si, ops[0].value)
                    set_word("c", si, ops[1].value)
                elif kind == "EXP":
                    assert self.exp_table is not None or ops[1].value < 2, (
                        "EXP step needs the Exp circuit's table (composed mode)"
                    )
                    set_word("a", si, ops[0].value)
                    set_word("b", si, ops[1].value)
                    set_word("c", si, ops[2].value)
                    ez_col[si] = int(ops[1].value == 0)
                    eo_col[si] = int(ops[1].value == 1)
                elif kind == "CALLDATACOPY":
                    assert self.copy_table is not None or ops[2].value == 0, (
                        "CALLDATACOPY needs the Copy circuit's table"
                    )
                    dst, src, ln = (o.value for o in ops[:3])
                    assert max(dst, src, ln) < (1 << 32)
                    for i in range(4):
                        addrbytes[i][si] = (dst >> (8 * i)) & 0xFF
                        byts["a"][i][si] = (src >> (8 * i)) & 0xFF
                        byts["b"][i][si] = (ln >> (8 * i)) & 0xFF
                    ez_col[si] = int(ln == 0)
            for key, colset in (
                ("a", self.c_bytes_a), ("b", self.c_bytes_b),
                ("c", self.c_bytes_c), ("d", self.c_bytes_d),
            ):
                for i, ci in enumerate(colset):
                    cols[ci] = mont(byts[key][i])
            for i, ci in enumerate(self.c_carry):
                cols[ci] = mont(carries[i])
            for i, ci in enumerate(self.c_mem):
                cols[ci] = mont(membytes[i])
            for i, ci in enumerate(self.c_addr):
                cols[ci] = mont(addrbytes[i])
            cols[self.c_ez] = mont(ez_col)
            cols[self.c_eo] = mont(eo_col)
            if self.standalone:
                # rw table (phase-0 part)
                rws = sorted(
                    self.rw_by_counter.values(), key=lambda r: r.rw_counter
                )
                rws = [r for r in rws if r.tag in (RwTag.Stack, RwTag.Memory)]
                assert len(rws) <= self._rw_target(n), (
                    f"rw table overflow: {len(rws)} rows > rw_target "
                    f"{self._rw_target(n)} — raise EvmParams.rw_target"
                )
                cols[self.t_rwc] = mont([r.rw_counter for r in rws])
                cols[self.t_is_write] = mont([int(r.is_write) for r in rws])
                cols[self.t_tag] = mont([int(r.tag) for r in rws])
                cols[self.t_id] = mont([r.id for r in rws])
                cols[self.t_addr] = mont([r.address for r in rws])
                self._rw_rows = rws
            return cols
        # phase 1: word RLCs
        r_chal = challenges[self.r_word.index]
        r_int = F.to_int(np.asarray(F.from_mont(np.asarray(r_chal))))
        va, vb, vc, invs, inv2s = [], [], [], [], []
        binary = ("ADD", "SUB", "MUL", "DIV", "MOD", "LT", "GT", "EQ",
                  "EXP", "CALLDATACOPY")
        for s in steps:
            ops = [self.rw_by_counter[i] for i in s.rw_indices]
            kind = self._classify(s)
            def rlc(rw):
                return word_rlc(rw.value, r_int)
            inv_of = 0
            inv2_of = 0
            if kind in ("PUSH", "POP", "PC"):
                va.append(rlc(ops[0])); vb.append(0); vc.append(0)
            elif kind == "MLOAD":
                # va = addr, vb = loaded word (the final stack write)
                va.append(rlc(ops[0])); vb.append(rlc(ops[33])); vc.append(0)
            elif kind == "MSTORE":
                va.append(rlc(ops[0])); vb.append(rlc(ops[1])); vc.append(0)
            elif kind in binary:
                va.append(rlc(ops[0])); vb.append(rlc(ops[1])); vc.append(rlc(ops[2]))
                if kind in ("DIV", "MOD"):
                    inv_of = vb[-1]
                elif kind == "EQ":
                    inv_of = (va[-1] - vb[-1]) % R
                elif kind == "EXP":
                    inv2_of = vb[-1] * (vb[-1] - 1) % R
                elif kind == "CALLDATACOPY":
                    inv2_of = vc[-1]
            elif kind in ("ISZERO", "NOT"):
                va.append(rlc(ops[0])); vb.append(0); vc.append(rlc(ops[1]))
                if kind == "ISZERO":
                    inv_of = va[-1]
            elif kind == "DUP":
                va.append(rlc(ops[0])); vb.append(0); vc.append(0)
            elif kind == "SWAP":
                va.append(rlc(ops[0])); vb.append(rlc(ops[1])); vc.append(0)
            else:
                va.append(0); vb.append(0); vc.append(0)
            invs.append(pow(inv_of, -1, R) if inv_of else 0)
            inv2s.append(pow(inv2_of, -1, R) if inv2_of else 0)
        out = {
            self.c_val_a: mont(va),
            self.c_val_b: mont(vb),
            self.c_val_c: mont(vc),
            self.c_inv: mont(invs),
            self.c_inv2: mont(inv2s),
        }
        if self.standalone:
            out[self.t_val] = mont(
                [word_rlc(r.value, r_int) for r in self._rw_rows]
            )
        return out
