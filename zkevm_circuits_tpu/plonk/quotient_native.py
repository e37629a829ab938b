"""Native quotient evaluation — serialize the y-folded constraint system
to a postfix program and run it in C++ (native/bn254.cc
zkevm_fr_eval_quotient).

At prove time every challenge is a known host scalar, so the quotient
polynomial is a fixed arithmetic circuit over (rolled) witness columns
and constants.  The JAX digit-array field mul costs ~130K flops/row on
XLA:CPU (~150x native 4x64 Montgomery); the State k=16 quotient took
~80 min through the chunked jits and ~100 s through this evaluator.
The TPU/mesh paths keep the jitted evaluators (there the MXU digit
convolution IS the fast path)."""

from __future__ import annotations

import numpy as np

from ..crypto.field import fr
from ..crypto.params import FR_MODULUS as R
from .expression import Challenge, Constant, Neg, Product, Query, Sum

F = fr()

OP_PUSH_COL, OP_PUSH_CONST, OP_ADD, OP_MUL, OP_NEG = 0, 1, 2, 3, 4
OP_TEE, OP_PUSH_TMP, OP_EMIT, OP_FIN = 5, 6, 7, 8
MAX_STACK = 96


class _Emitter:
    def __init__(self, challenges_int: dict, rot_scale: int):
        self.ops: list[tuple[int, int, int]] = []
        self.cols: list[np.ndarray] = []
        self._col_ids: dict[int, int] = {}  # id(array) -> index
        self.consts: list[int] = []
        self._const_ids: dict[int, int] = {}
        self.ch = challenges_int
        self.rot_scale = rot_scale
        self.depth = 0
        self.max_depth = 0
        self.ntmps = 0
        self._tmp_of: dict[int, int] = {}  # id(node) -> tmp slot
        self._refs: dict[int, int] = {}
        self._cint: dict[int, int | None] = {}
        self.colmap: dict[tuple, np.ndarray] = {}  # (kind, col) -> array

    # -- registry ----------------------------------------------------------
    def register(self, kind: str, col: int, arr) -> None:
        self.colmap[(kind, col)] = np.asarray(arr)

    def _col_idx(self, arr: np.ndarray) -> int:
        key = id(arr)
        if key not in self._col_ids:
            self._col_ids[key] = len(self.cols)
            self.cols.append(arr)
        return self._col_ids[key]

    def _const_idx(self, v: int) -> int:
        v %= R
        if v not in self._const_ids:
            self._const_ids[v] = len(self.consts)
            self.consts.append(v)
        return self._const_ids[v]

    # -- stack ops ---------------------------------------------------------
    def _push(self):
        self.depth += 1
        assert self.depth < MAX_STACK, "quotient program stack overflow"
        self.max_depth = max(self.max_depth, self.depth)

    def col(self, kind: str, c: int, shift_rows: int = 0):
        arr = self.colmap[(kind, c)]
        self.ops.append((OP_PUSH_COL, self._col_idx(arr), shift_rows))
        self._push()

    def const(self, v: int):
        self.ops.append((OP_PUSH_CONST, self._const_idx(v), 0))
        self._push()

    def add(self):
        self.ops.append((OP_ADD, 0, 0))
        self.depth -= 1

    def mul(self):
        self.ops.append((OP_MUL, 0, 0))
        self.depth -= 1

    def neg(self):
        self.ops.append((OP_NEG, 0, 0))

    def sub(self):  # A B -> A - B
        self.neg()
        self.add()

    def emit(self, y: int):
        self.ops.append((OP_EMIT, self._const_idx(y), 0))
        self.depth -= 1

    def fin(self, kind: str, c: int):
        arr = self.colmap[(kind, c)]
        self.ops.append((OP_FIN, self._col_idx(arr), 0))

    # -- expression DAG ----------------------------------------------------
    def count_refs(self, e):
        k = id(e)
        self._refs[k] = self._refs.get(k, 0) + 1
        if self._refs[k] > 1:
            return
        if isinstance(e, Neg):
            self.count_refs(e.a)
        elif isinstance(e, (Sum, Product)):
            self.count_refs(e.a)
            self.count_refs(e.b)

    def _const_int(self, e) -> int | None:
        k = id(e)
        if k in self._cint:
            return self._cint[k]
        if isinstance(e, Constant):
            v = e.value % R
        elif isinstance(e, Challenge):
            v = self.ch[e.index] % R
        elif isinstance(e, Neg):
            a = self._const_int(e.a)
            v = None if a is None else (-a) % R
        elif isinstance(e, Sum):
            a, b = self._const_int(e.a), self._const_int(e.b)
            v = None if a is None or b is None else (a + b) % R
        elif isinstance(e, Product):
            a, b = self._const_int(e.a), self._const_int(e.b)
            v = None if a is None or b is None else a * b % R
        else:
            v = None
        self._cint[k] = v
        return v

    def expr(self, e):
        """Emit ops computing `e` onto the stack (with DAG temp reuse)."""
        k = id(e)
        if k in self._tmp_of:
            self.ops.append((OP_PUSH_TMP, self._tmp_of[k], 0))
            self._push()
            return
        cv = self._const_int(e)
        if cv is not None:
            self.const(cv)
        elif isinstance(e, Query):
            self.col(e.kind, e.col, e.rot * self.rot_scale)
        elif isinstance(e, Neg):
            self.expr(e.a)
            self.neg()
        elif isinstance(e, Sum):
            self.expr(e.a)
            self.expr(e.b)
            self.add()
        elif isinstance(e, Product):
            self.expr(e.a)
            self.expr(e.b)
            self.mul()
        else:  # pragma: no cover
            raise TypeError(type(e))
        if self._refs.get(k, 0) > 1 and cv is None \
                and not isinstance(e, Query):
            slot = self.ntmps
            self.ntmps += 1
            self._tmp_of[k] = slot
            self.ops.append((OP_TEE, slot, 0))

    def horner(self, exprs, mult: int):
        """Stack gets fold(acc*mult + e) over exprs (>= 1 expr)."""
        self.expr(exprs[0])
        for e in exprs[1:]:
            self.const(mult)
            self.mul()
            self.expr(e)
            self.add()


def eval_quotient(cs, emitter_setup, challenges_int: dict, theta: int,
                  beta: int, gamma: int, y: int, delta_pows: list[int],
                  perm_cols, n_lookups: int, n_logups: int,
                  rot_scale: int, n_ext: int) -> np.ndarray:
    """Build + run the quotient program.  `emitter_setup(em)` registers
    every column (fixed/advice/instance + aux) on the emitter.  Returns
    h_ext (n_ext, 32) uint8."""
    from ..crypto import hostcore

    em = _Emitter(challenges_int, rot_scale)
    emitter_setup(em)

    # refcount pass over the shared gate DAGs (lookup/logup inputs too)
    for g in cs.gates:
        for p in g.polys:
            em.count_refs(p)
    for lk in cs.lookups:
        for e in lk.inputs + lk.tables:
            em.count_refs(e)
    for lg in cs.logups:
        for tup in lg.inputs:
            for e in tup:
                em.count_refs(e)
        for e in lg.table:
            em.count_refs(e)

    # ---- gates (y-fold order mirrors prover._quotient_body) --------------
    for g in cs.gates:
        for p in g.polys:
            em.expr(p)
            em.emit(y)

    # ---- permutation ------------------------------------------------------
    if perm_cols:
        em.col("aux", AUX_L0)
        em.col("aux", AUX_ZP)
        em.const(1)
        em.sub()
        em.mul()
        em.emit(y)
        em.col("aux", AUX_LLAST)
        em.col("aux", AUX_ZP)
        em.col("aux", AUX_ZP)
        em.mul()
        em.col("aux", AUX_ZP)
        em.sub()
        em.mul()
        em.emit(y)
        # lactive * (z_w * denx - z * numx)
        em.col("aux", AUX_ZP, rot_scale)  # z_w
        first = True
        for ci, (kind, col) in enumerate(perm_cols):
            em.col(kind, col, 0)
            em.col("aux", AUX_SIGMA0 + ci)
            em.const(beta)
            em.mul()
            em.add()
            em.const(gamma)
            em.add()
            if not first:
                em.mul()
            first = False
        em.mul()  # z_w * denx
        em.col("aux", AUX_ZP)
        first = True
        for ci, (kind, col) in enumerate(perm_cols):
            em.col(kind, col, 0)
            em.col("aux", AUX_X)
            em.const(beta * delta_pows[ci] % R)
            em.mul()
            em.add()
            em.const(gamma)
            em.add()
            if not first:
                em.mul()
            first = False
        em.mul()  # z * numx
        em.sub()
        em.col("aux", AUX_LACTIVE)
        em.mul()
        em.emit(y)

    # ---- classic lookups ----------------------------------------------------
    aux_lk0 = AUX_SIGMA0 + len(perm_cols)
    for i, lk in enumerate(cs.lookups):
        base = aux_lk0 + 3 * i
        ap, sp_, z_ = base, base + 1, base + 2
        em.col("aux", AUX_L0)
        em.col("aux", z_)
        em.const(1)
        em.sub()
        em.mul()
        em.emit(y)
        em.col("aux", AUX_LLAST)
        em.col("aux", z_)
        em.col("aux", z_)
        em.mul()
        em.col("aux", z_)
        em.sub()
        em.mul()
        em.emit(y)
        # lactive * (z_w (ap+b)(sp+g) - z (a+b)(s+g))
        em.col("aux", z_, rot_scale)
        em.col("aux", ap)
        em.const(beta)
        em.add()
        em.mul()
        em.col("aux", sp_)
        em.const(gamma)
        em.add()
        em.mul()
        em.col("aux", z_)
        em.horner(lk.inputs, theta)
        em.const(beta)
        em.add()
        em.mul()
        em.horner(lk.tables, theta)
        em.const(gamma)
        em.add()
        em.mul()
        em.sub()
        em.col("aux", AUX_LACTIVE)
        em.mul()
        em.emit(y)
        em.col("aux", AUX_L0)
        em.col("aux", ap)
        em.col("aux", sp_)
        em.sub()
        em.mul()
        em.emit(y)
        em.col("aux", AUX_LACTIVE)
        em.col("aux", ap)
        em.col("aux", sp_)
        em.sub()
        em.mul()
        em.col("aux", ap)
        em.col("aux", ap, -rot_scale)
        em.sub()
        em.mul()
        em.emit(y)

    # ---- logUps ---------------------------------------------------------------
    off = AUX_SIGMA0 + len(perm_cols) + 3 * len(cs.lookups)
    for i, lg in enumerate(cs.logups):
        nh = len(lg.inputs)
        h0, ht, m_, phi = off, off + nh, off + nh + 1, off + nh + 2
        off += nh + 3
        em.col("aux", AUX_L0)
        em.col("aux", phi)
        em.mul()
        em.emit(y)
        em.col("aux", AUX_LLAST)
        em.col("aux", phi)
        em.mul()
        em.emit(y)
        for j, tup in enumerate(lg.inputs):
            em.col("aux", AUX_LACTIVE)
            em.col("aux", h0 + j)
            em.horner(tup, theta)
            em.const(beta)
            em.add()
            em.mul()
            em.const(1)
            em.sub()
            em.mul()
            em.emit(y)
        em.col("aux", AUX_LACTIVE)
        em.col("aux", ht)
        em.horner(lg.table, theta)
        em.const(beta)
        em.add()
        em.mul()
        em.col("aux", m_)
        em.sub()
        em.mul()
        em.emit(y)
        # lactive * ((phi_w - phi) - (sum_j h_j - ht))
        em.col("aux", AUX_LACTIVE)
        em.col("aux", phi, rot_scale)
        em.col("aux", phi)
        em.sub()
        for j in range(nh):
            em.col("aux", h0 + j)
            em.sub()
        em.col("aux", ht)
        em.add()
        em.mul()
        em.emit(y)

    em.fin("aux", AUX_TINV)

    prog = np.asarray([list(o) for o in em.ops], np.int32)
    cols = np.stack([np.ascontiguousarray(c, dtype=np.uint8)
                     for c in em.cols])
    consts = F.from_ints([v * F.R % R for v in em.consts])
    return hostcore.eval_quotient(cols, consts, prog, em.ntmps,
                                  em.max_depth + 2, n_ext)


# aux column slots (indices into the "aux" registry)
(AUX_L0, AUX_LLAST, AUX_LACTIVE, AUX_X, AUX_TINV, AUX_ZP) = range(6)
AUX_SIGMA0 = 6  # sigma_i at AUX_SIGMA0 + i; lookups/logups follow
