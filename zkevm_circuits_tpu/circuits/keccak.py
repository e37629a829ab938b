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
        mont = lambda vals: F.from_ints([v % R * F.R % R for v in vals])
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
        mont = lambda vals: F.from_ints([v % R * F.R % R for v in vals])
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
