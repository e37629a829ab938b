"""Keccak-f[1600] permutation circuit.

The core of the reference's Keccak circuit (`zkevm-circuits/src/
keccak_circuit/`, SURVEY.md §2.2 "Keccak").  The reference packs bits
into big-field sparse encodings with lookup-driven nonlinearity and 12
rows per round; this TPU-first design is bit-oriented with a
rotation-friendly layout instead:

  * ROWS are bit positions: one 64-row block per round (24 round blocks
    + 1 output block per permutation = 1600 rows).
  * COLUMNS are lanes: 25 state-bit columns `a`, 5 theta-parity columns
    `c` (+10 binary-sum helpers), 25 rho/pi output columns `b`.
  * theta lives on same-row constraints (all z-aligned); the z-1 and
    rho rotations become ROW rotations, with per-lane wrap selectors for
    the mod-64 boundary; chi/iota connect block r to block r+1 via a
    +64-row rotation.  Every constraint is degree <= 3 and evaluates
    columnwise over the whole trace — exactly the vectorization the MXU/
    VPU wants.

Round-1 scope: the permutation itself (the hard 95%); the sponge
absorb/padding rows and the KeccakTable (input_rlc, len, output_rlc)
exposure stack on top next round.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..crypto.field import fr
from ..crypto.keccak import RC, ROTC, keccak_f
from ..crypto.params import FR_MODULUS as R
from ..plonk.circuit import Circuit, ConstraintSystem, usable_rows
from ..plonk.expression import Advice, Expression, Fixed

F = fr()

ROWS_PER_PERM = 25 * 64  # 24 round blocks + 1 output block


def _xor(a: Expression, b: Expression) -> Expression:
    return a + b - 2 * a * b


class KeccakFCircuit(Circuit):
    """Proves `states[i] -> keccak_f(states[i])` for each input state.

    states: list of 5x5 lane matrices (ints), as crypto/keccak.keccak_f.
    """

    def __init__(self, states: list[list[list[int]]]):
        self.states = states

    # ------------------------------------------------------------------
    def configure(self, cs: ConstraintSystem):
        self.q_round = cs.fixed_column()  # 1 on round-block rows (not output)
        self.f_rc = cs.fixed_column()  # iota round-constant bit at (round, z)
        # wrap selector per distinct rotation amount: 1 when z < r
        self.rot_amounts = sorted({ROTC[x][y] for x in range(5) for y in range(5)})
        self.f_wrap = {r: cs.fixed_column() for r in self.rot_amounts if r}
        self.f_z0 = cs.fixed_column()  # 1 on z == 0 rows

        self.c_a = [[cs.advice_column() for _ in range(5)] for _ in range(5)]
        self.c_c = [cs.advice_column() for _ in range(5)]
        self.c_q = [cs.advice_column() for _ in range(5)]  # bit 1 of theta sum
        self.c_w = [cs.advice_column() for _ in range(5)]  # bit 2 of theta sum
        self.c_b = [[cs.advice_column() for _ in range(5)] for _ in range(5)]

        q = Fixed(self.q_round)
        a = [[Advice(self.c_a[x][y]) for y in range(5)] for x in range(5)]
        c = [Advice(self.c_c[x]) for x in range(5)]
        qh = [Advice(self.c_q[x]) for x in range(5)]
        wh = [Advice(self.c_w[x]) for x in range(5)]
        b = [[Advice(self.c_b[x][y]) for y in range(5)] for x in range(5)]

        # booleanity
        for grp in (sum(self.c_a, []), self.c_c, self.c_q, self.c_w,
                    sum(self.c_b, [])):
            for col in grp:
                e = Advice(col)
                cs.create_gate("keccak bit bool", q * e * (e - 1))

        # theta parity: sum_y a[x][y] = c[x] + 2 q[x] + 4 w[x]
        for x in range(5):
            s = a[x][0]
            for y in range(1, 5):
                s = s + a[x][y]
            cs.create_gate(
                f"theta sum x={x}", q * (s - c[x] - 2 * qh[x] - 4 * wh[x])
            )

        # d[x] at row z = c[x-1][z] xor c[x+1][z-1 mod 64]
        def d_expr(x: int, wrapped: bool) -> Expression:
            cm1 = Advice(self.c_c[(x - 1) % 5])
            rot = 63 if wrapped else -1
            cp1 = Advice(self.c_c[(x + 1) % 5], rot)
            return _xor(cm1, cp1)

        # b[pi(x,y)] at row z = (a[x][y] xor d[x]) at row z - rotc[x][y]
        z0 = Fixed(self.f_z0)
        for x in range(5):
            for y in range(5):
                r = ROTC[x][y]
                tx, ty = y, (2 * x + 3 * y) % 5
                tgt = b[tx][ty]
                for wrap in (False, True):
                    # source row offset: -r (mod 64).  wrap=True covers
                    # rows z < r (selector f_wrap[r]); the d() inner z-1
                    # wraps exactly when the SOURCE row is z' == 0, i.e.
                    # current z == r (mod 64)
                    off = 64 - r if wrap else -r
                    src_a = Advice(self.c_a[x][y], off)
                    # d at source row z-r: build with rotation applied
                    cm1 = Advice(self.c_c[(x - 1) % 5], off)
                    # source-row z' - 1 with its own wrap at z' == 0:
                    # handled by splitting on the z == r row selector
                    cp1_main = Advice(self.c_c[(x + 1) % 5], off - 1)
                    cp1_wrap = Advice(self.c_c[(x + 1) % 5], off + 63)
                    if r:
                        sel = Fixed(self.f_wrap[r])
                        gate = q * (sel if wrap else (1 - sel))
                    else:
                        gate = q * (0 if wrap else 1)
                        if wrap:
                            continue
                    # the inner z'-1 wraps exactly when the SOURCE row has
                    # z' == 0; select via the fixed z0 column read at the
                    # source row's offset
                    z0_at_src = Fixed(self.f_z0, off)
                    d_main = _xor(cm1, cp1_main)
                    d_wrap = _xor(cm1, cp1_wrap)
                    theta_main = _xor(src_a, d_main)
                    theta_wrap = _xor(src_a, d_wrap)
                    cs.create_gate(
                        f"rho/pi {x},{y} wrap={wrap} inner",
                        gate * z0_at_src * (tgt - theta_wrap),
                    )
                    cs.create_gate(
                        f"rho/pi {x},{y} wrap={wrap} main",
                        gate * (1 - z0_at_src) * (tgt - theta_main),
                    )

        # chi + iota: a_next[x][y] = b[x][y] xor ((1-b[x+1][y]) b[x+2][y])
        # (+ rc bit on lane (0,0))
        rc = Fixed(self.f_rc)
        for x in range(5):
            for y in range(5):
                nxt = Advice(self.c_a[x][y], 64)
                u = (1 - b[(x + 1) % 5][y]) * b[(x + 2) % 5][y]
                chi = _xor(b[x][y], u)
                if x == 0 and y == 0:
                    chi = _xor(chi, rc)
                cs.create_gate(f"chi {x},{y}", q * (nxt - chi))

    # ------------------------------------------------------------------
    def _blocks(self, n: int) -> int:
        need = len(self.states) * ROWS_PER_PERM
        assert need <= usable_rows(n) - 64, (need, n)
        return len(self.states)

    def fixed_columns(self, n: int):
        mont = F.mont_from_ints
        nperm = self._blocks(n)
        q_round = [0] * n
        f_rc = [0] * n
        f_z0 = [0] * n
        wraps = {r: [0] * n for r in self.f_wrap}
        for p in range(nperm):
            base = p * ROWS_PER_PERM
            for rnd in range(24):
                for z in range(64):
                    row = base + rnd * 64 + z
                    q_round[row] = 1
                    f_rc[row] = (RC[rnd] >> z) & 1
                    f_z0[row] = int(z == 0)
                    for r in wraps:
                        wraps[r][row] = int(z < r)
            # output block rows: z0 marker continues harmlessly
        out = {
            self.q_round: mont(q_round),
            self.f_rc: mont(f_rc),
            self.f_z0: mont(f_z0),
        }
        for r, col in self.f_wrap.items():
            out[col] = mont(wraps[r])
        return out

    def synthesize(self, phase: int, n: int, challenges: dict, instances):
        if phase != 0:
            return {}
        mont = F.mont_from_ints
        nperm = self._blocks(n)
        a_bits = {(x, y): [0] * n for x in range(5) for y in range(5)}
        c_bits = {x: [0] * n for x in range(5)}
        q_bits = {x: [0] * n for x in range(5)}
        w_bits = {x: [0] * n for x in range(5)}
        b_bits = {(x, y): [0] * n for x in range(5) for y in range(5)}
        for p, st0 in enumerate(self.states):
            base = p * ROWS_PER_PERM
            a = [row[:] for row in st0]
            for rnd in range(24):
                rows0 = base + rnd * 64
                for z in range(64):
                    for x in range(5):
                        for y in range(5):
                            a_bits[(x, y)][rows0 + z] = (a[x][y] >> z) & 1
                # theta
                c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4]
                     for x in range(5)]
                for z in range(64):
                    for x in range(5):
                        s = sum((a[x][y] >> z) & 1 for y in range(5))
                        c_bits[x][rows0 + z] = s & 1
                        q_bits[x][rows0 + z] = (s >> 1) & 1
                        w_bits[x][rows0 + z] = (s >> 2) & 1
                d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1)
                     for x in range(5)]
                bmat = [[0] * 5 for _ in range(5)]
                for x in range(5):
                    for y in range(5):
                        bmat[y][(2 * x + 3 * y) % 5] = _rotl64(
                            a[x][y] ^ d[x], ROTC[x][y]
                        )
                for z in range(64):
                    for x in range(5):
                        for y in range(5):
                            b_bits[(x, y)][rows0 + z] = (bmat[x][y] >> z) & 1
                a2 = [[0] * 5 for _ in range(5)]
                for x in range(5):
                    for y in range(5):
                        a2[x][y] = bmat[x][y] ^ (
                            (~bmat[(x + 1) % 5][y]) & bmat[(x + 2) % 5][y]
                        ) & ((1 << 64) - 1)
                        a2[x][y] &= (1 << 64) - 1
                a2[0][0] ^= RC[rnd]
                a = a2
            # output block
            rows0 = base + 24 * 64
            for z in range(64):
                for x in range(5):
                    for y in range(5):
                        a_bits[(x, y)][rows0 + z] = (a[x][y] >> z) & 1
            self._final_states = getattr(self, "_final_states", {})
            self._final_states[p] = a
        cols = {}
        for x in range(5):
            for y in range(5):
                cols[self.c_a[x][y]] = mont(a_bits[(x, y)])
                cols[self.c_b[x][y]] = mont(b_bits[(x, y)])
            cols[self.c_c[x]] = mont(c_bits[x])
            cols[self.c_q[x]] = mont(q_bits[x])
            cols[self.c_w[x]] = mont(w_bits[x])
        return cols


def _rotl64(v: int, s: int) -> int:
    s %= 64
    return ((v << s) | (v >> (64 - s))) & ((1 << 64) - 1) if s else v


RATE_LANES = 17  # 136-byte rate


def _pad_blocks(msg: bytes) -> list[bytes]:
    padded = bytearray(msg)
    pad_len = 136 - (len(padded) % 136)
    padded += b"\x00" * pad_len
    padded[len(msg)] |= 0x01
    padded[-1] |= 0x80
    return [bytes(padded[i : i + 136]) for i in range(0, len(padded), 136)]


class KeccakCircuit(KeccakFCircuit):
    """Full sponge: absorb + chained permutations + KeccakTable exposure.

    The reference's `multi_keccak` witness + KeccakTable (input_rlc, len,
    output_rlc) — SURVEY.md §2.2 "Keccak".  Messages are padded host-side
    (pad10*1); permutations of one message are laid out consecutively, so
    the chain constraint `state_in = state_out_prev XOR data` is a -64 row
    rotation.  Table columns: running input-RLC accumulator (updated at
    each absorb row-0 via a shared-power RLC mega-expression), output RLC
    bound to the digest bits at each final-output row.

    Round-1 scope note: pad-pattern VALIDATION against a length column is
    witness-side (documented); everything else is constrained.
    """

    def __init__(self, messages: list[bytes]):
        self.messages = messages
        self.blocks = [_pad_blocks(m) for m in messages]
        # chained permutation input states, per message
        states = []
        self._msg_perm_spans = []  # (first perm index, count) per message
        idx = 0
        for blks in self.blocks:
            st = [[0] * 5 for _ in range(5)]
            first = idx
            for blk in blks:
                st = [row[:] for row in st]
                for lane in range(RATE_LANES):
                    x, y = lane % 5, lane // 5
                    st[x][y] ^= int.from_bytes(
                        blk[8 * lane : 8 * lane + 8], "little"
                    )
                states.append([row[:] for row in st])
                st = keccak_f(st)
                idx += 1
            self._msg_perm_spans.append((first, len(blks)))
        super().__init__(states)

    def configure(self, cs: ConstraintSystem, challenge=None):
        super().configure(cs)
        self.q_first = cs.fixed_column()  # row 0..63 of a message's 1st perm
        self.q_chain = cs.fixed_column()  # block-0 rows of later perms
        self.q_acc0 = cs.fixed_column()  # row 0 of each absorb block
        self.q_final = cs.fixed_column()  # row 0 of each final output block
        self.c_d = [cs.advice_column() for _ in range(RATE_LANES)]
        self.c_in_rlc = cs.advice_column(phase=1)  # running input RLC
        self.c_out_rlc = cs.advice_column(phase=1)  # digest RLC (table col)
        self.r = (
            challenge if challenge is not None else cs.challenge(phase=0)
        )

        qf, qc = Fixed(self.q_first), Fixed(self.q_chain)
        d = [Advice(c) for c in self.c_d]
        for lane in range(RATE_LANES):
            cs.create_gate(
                "absorb data bool", (qf + qc) * d[lane] * (d[lane] - 1)
            )
        for lane in range(25):
            x, y = lane % 5, lane // 5
            cur = Advice(self.c_a[x][y])
            prev_out = Advice(self.c_a[x][y], -64)
            if lane < RATE_LANES:
                cs.create_gate(f"absorb first {lane}", qf * (cur - d[lane]))
                cs.create_gate(
                    f"absorb chain {lane}", qc * (cur - _xor(prev_out, d[lane]))
                )
            else:
                cs.create_gate(f"capacity first {lane}", qf * cur)
                cs.create_gate(
                    f"capacity chain {lane}", qc * (cur - prev_out)
                )

        # shared challenge powers (node-shared => evaluator-memoized)
        rpow: list[Expression] = [None] * 137  # type: ignore
        rpow[1] = self.r
        for k in range(2, 137):
            rpow[k] = rpow[k - 1] * self.r

        def block_rlc() -> Expression:
            """RLC of this absorb block's 136 bytes (msb-first fold):
            sum_j byte_j * r^(135-j), bits read from the data columns at
            row offsets 8*(j%8)+i (evaluated on an absorb row 0)."""
            expr = None
            for j in range(136):
                lane, byte_in_lane = j // 8, j % 8
                byte = None
                for i in range(8):
                    bit = Advice(self.c_d[lane], 8 * byte_in_lane + i)
                    term = bit if i == 0 else bit * (1 << i)
                    byte = term if byte is None else byte + term
                term = byte if j == 135 else byte * rpow[135 - j]
                expr = term if expr is None else expr + term
            return expr

        acc0 = Fixed(self.q_acc0)
        in_rlc = Advice(self.c_in_rlc)
        in_rlc_prev = Advice(self.c_in_rlc, -ROWS_PER_PERM)
        # first absorb: acc = block_rlc; later: acc = prev*r^136 + block_rlc
        qf0 = acc0 * Fixed(self.q_first)
        qc0 = acc0 * Fixed(self.q_chain)
        brlc = block_rlc()
        cs.create_gate("input rlc first", qf0 * (in_rlc - brlc))
        cs.create_gate(
            "input rlc chain",
            qc0 * (in_rlc - in_rlc_prev * rpow[136] - brlc),
        )

        # digest: first 32 bytes of the output state = lanes 0..3, bound at
        # the final-output row 0 (bits at row offsets 8b+i)
        def digest_rlc() -> Expression:
            expr = None
            for k in range(32):
                lane = k // 8
                x, y = lane % 5, lane // 5
                byte = None
                for i in range(8):
                    bit = Advice(self.c_a[x][y], 8 * (k % 8) + i)
                    term = bit if i == 0 else bit * (1 << i)
                    byte = term if byte is None else byte + term
                term = byte if k == 0 else byte * rpow[k]
                expr = term if expr is None else expr + term
            return expr

        qfin = Fixed(self.q_final)
        out_rlc = Advice(self.c_out_rlc)
        cs.create_gate("output rlc", qfin * (out_rlc - digest_rlc()))

    def keccak_table_exprs(self) -> list:
        """(is_enabled, input_rlc, output_rlc) — the KeccakTable the
        Bytecode/Tx circuits look hashes up in (input_rlc convention:
        msb-first byte fold acc = acc*r + byte, matching bytecode's
        value_rlc)."""
        q = Fixed(self.q_final)
        # the running input-RLC lives on absorb row 0 of the same (last)
        # permutation — a static -24*64 rotation from the final-output row
        return [
            q,
            q * Advice(self.c_in_rlc, -24 * 64),
            q * Advice(self.c_out_rlc),
        ]

    # ------------------------------------------------------------------
    def fixed_columns(self, n: int):
        out = super().fixed_columns(n)
        mont = F.mont_from_ints
        q_first = [0] * n
        q_chain = [0] * n
        q_acc0 = [0] * n
        q_final = [0] * n
        for first, count in self._msg_perm_spans:
            for pi in range(count):
                base = (first + pi) * ROWS_PER_PERM
                for z in range(64):
                    (q_first if pi == 0 else q_chain)[base + z] = 1
                q_acc0[base] = 1
            q_final[(first + count - 1) * ROWS_PER_PERM + 24 * 64] = 1
        out[self.q_first] = mont(q_first)
        out[self.q_chain] = mont(q_chain)
        out[self.q_acc0] = mont(q_acc0)
        out[self.q_final] = mont(q_final)
        return out

    def synthesize(self, phase: int, n: int, challenges: dict, instances):
        mont = lambda vals: F.mont_from_ints_padded(vals, n)
        if phase == 0:
            cols = super().synthesize(phase, n, challenges, instances)
            dbits = {i: [0] * n for i in range(RATE_LANES)}
            for (first, count), blks in zip(self._msg_perm_spans, self.blocks):
                for pi, blk in enumerate(blks):
                    base = (first + pi) * ROWS_PER_PERM
                    for lane in range(RATE_LANES):
                        v = int.from_bytes(blk[8 * lane : 8 * lane + 8],
                                           "little")
                        for z in range(64):
                            dbits[lane][base + z] = (v >> z) & 1
            for i, c in enumerate(self.c_d):
                cols[c] = mont(dbits[i])
            return cols
        # phase 1: RLC accumulators
        r_chal = challenges[self.r.index]
        r_int = F.to_int(np.asarray(F.from_mont(np.asarray(r_chal))))
        in_rlc = [0] * n
        out_rlc = [0] * n
        for (first, count), blks in zip(self._msg_perm_spans, self.blocks):
            acc = 0
            for pi, blk in enumerate(blks):
                for byte in blk:
                    acc = (acc * r_int + byte) % R
                base = (first + pi) * ROWS_PER_PERM
                in_rlc[base] = acc
                # carry the accumulator forward on later absorb rows via
                # the -ROWS_PER_PERM rotation; only row 0 values matter
            # replicate the final accumulator at every perm's row 0 chain
            # (constraint only reads row 0 of each block)
            final_perm = first + count - 1
            st = self._final_states[final_perm]
            digest = b"".join(
                st[k % 5][k // 5].to_bytes(8, "little") for k in range(4)
            )[:32]
            dr = 0
            for i, byte in enumerate(digest):
                dr = (dr + byte * pow(r_int, i, R)) % R
            out_rlc[final_perm * ROWS_PER_PERM + 24 * 64] = dr
        return {self.c_in_rlc: mont(in_rlc), self.c_out_rlc: mont(out_rlc)}
