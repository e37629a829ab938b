"""Key generation — vk/pk for the TPU PLONK prover.

Equivalent of halo2's `keygen_vk`/`keygen_pk` (used by every reference
bench, circuit-benchmarks/src/evm_circuit.rs:74-75): precomputes fixed
column commitments, the permutation argument's sigma polynomials (from the
circuit's copy constraints), Lagrange-basis helpers (l_0, l_last,
l_active) and the extended-coset tables the quotient pass needs.

Permutation sigmas follow the halo2 construction: cell (column c, row i)
is labeled delta^c * omega^i; copy constraints merge labels into cycles;
sigma_c(omega^i) = label of the next cell in the cycle.  delta generates a
coset disjoint from every omega power (delta = g^(2^s), s = Fr 2-adicity).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.field import fr
from ..crypto.params import FR_GENERATOR, FR_MODULUS as R, FR_TWO_ADICITY
from ..poly.domain import domain
from ..poly.kzg import Srs
from ..poly.ntt import coset_ntt, intt
from .circuit import BLINDING_FACTORS, Circuit, ConstraintSystem, usable_rows

F = fr()

DELTA = pow(FR_GENERATOR, 1 << FR_TWO_ADICITY, R)


def ceil_log2(x: int) -> int:
    return max(0, (x - 1).bit_length())


def quotient_degree(cs: ConstraintSystem) -> int:
    """Max constraint degree across gates + permutation + lookup arguments."""
    d = 2
    for g in cs.gates:
        for p in g.polys:
            d = max(d, p.degree())
    if cs.perm_columns:
        # active(1) * Z(1) * prod over columns (each deg<=1) -> nperm + 2
        d = max(d, len(cs.perm_columns) + 2)
    for lk in cs.lookups:
        di = max((e.degree() for e in lk.inputs), default=1)
        dt = max((e.degree() for e in lk.tables), default=1)
        d = max(d, 2 + di + dt, 4)
    for lg in cs.logups:
        for tup in lg.inputs:
            d = max(d, 2 + max((e.degree() for e in tup), default=1))
        d = max(d, 2 + max((e.degree() for e in lg.table), default=1))
    return d


@dataclasses.dataclass
class VerifyingKey:
    k: int
    cs: ConstraintSystem
    fixed_commitments: list  # affine ints per fixed column
    sigma_commitments: list  # affine ints per permutation column
    g2: tuple
    s_g2: tuple

    @property
    def n(self):
        return 1 << self.k

    @functools.cached_property
    def omega(self):
        return domain(self.k).omega


@dataclasses.dataclass
class ProvingKey:
    vk: VerifyingKey
    # device tables, all Montgomery digit arrays
    fixed_evals: object  # (nf, n, 32)
    fixed_coeffs: object  # (nf, n, 32)
    sigma_evals: object  # (np, n, 32)
    sigma_coeffs: object  # (np, n, 32)
    # extended-coset tables (n_ext = n << (k_ext - k))
    k_ext: int
    fixed_ext: object  # (nf, n_ext, 32)
    sigma_ext: object  # (np, n_ext, 32)
    l0_ext: object  # (n_ext, 32)
    llast_ext: object
    lactive_ext: object
    x_ext: object  # evals of the identity poly X on the extended coset
    t_inv_ext: object  # 1 / (X^n - 1) on the extended coset
    delta_pows: list  # host ints delta^c per perm column

    @property
    def k(self):
        return self.vk.k

    @property
    def n(self):
        return 1 << self.vk.k


def _lagrange_indicator_ext(rows, k: int, k_ext: int):
    """Extended-coset evals of the poly that is 1 on H-rows `rows`, else 0."""
    n = 1 << k
    vals = np.zeros((n, 32), np.uint8)
    one = F.from_int(F.R)  # Montgomery 1
    for r in rows:
        vals[r] = one
    coeffs = intt(jnp.asarray(vals), k)
    n_ext = 1 << k_ext
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((n_ext - n, 32), jnp.uint8)], axis=0
    )
    return coset_ntt(padded, k_ext)


def _host_batch_inv(vals: list[int]) -> list[int]:
    prefix = [1]
    for v in vals:
        prefix.append(prefix[-1] * v % R)
    inv = pow(prefix[-1], -1, R)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = prefix[i] * inv % R
        inv = inv * vals[i] % R
    return out


def keygen(circuit: Circuit, k: int, srs: Srs):
    import os as _os
    import time as _time

    _trace = _os.environ.get("ZKEVM_PROVE_TRACE") == "1"
    _t0 = _time.perf_counter()

    def _mark(stage: str):
        nonlocal _t0
        if _trace:
            now = _time.perf_counter()
            print(f"[keygen] {stage}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    cs = ConstraintSystem()
    circuit.configure(cs)
    n = 1 << k
    dom = domain(k)
    _mark("configure")

    # ---- fixed columns ----------------------------------------------------
    from .circuit import assemble_fixed

    nf = max(cs.num_fixed, 1)
    fixed_evals = jnp.asarray(assemble_fixed(circuit, cs, n))
    if cs.num_fixed == 0:
        fixed_evals = jnp.zeros((1, n, 32), jnp.uint8)
    fixed_coeffs = intt(fixed_evals, k)
    _mark(f"fixed assemble+intt ({cs.num_fixed} cols)")

    # ---- permutation sigmas -------------------------------------------------
    perm_cols = cs.perm_columns
    npc = len(perm_cols)
    col_index = {pc: i for i, pc in enumerate(perm_cols)}
    # union-find over (perm_col_idx, row)
    parent: dict = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for ca, cb in circuit.copy_constraints(n):
        a = (col_index[(ca.kind, ca.col)], ca.row)
        b = (col_index[(cb.kind, cb.col)], cb.row)
        union(a, b)

    cycles: dict = {}
    for cell in list(parent.keys()):
        cycles.setdefault(find(cell), []).append(cell)
    for root, members in cycles.items():
        if root not in members:
            members.append(root)

    # sigma starts as identity; cycle members rotate.  Identity rows are
    # built on device (omega power table * delta^c); only cycle members —
    # O(#copy constraints), not O(n) — are patched host-side.
    delta_pows = [pow(DELTA, c, R) for c in range(max(npc, 1))]
    omega_pw = F.power_table(dom.omega, n)  # (n, 32) Montgomery
    sig_rows = np.stack(
        [
            np.asarray(F.mul(omega_pw, jnp.asarray(F.from_int(d * F.R % R))))
            for d in delta_pows
        ]
    )
    for members in cycles.values():
        ms = sorted(set(members))
        for j, (c, i) in enumerate(ms):
            cn, inext = ms[(j + 1) % len(ms)]
            v = delta_pows[cn] * pow(dom.omega, inext, R) % R
            sig_rows[c, i] = F.from_int(v * F.R % R)
    sigma_evals = jnp.asarray(sig_rows)
    sigma_coeffs = intt(sigma_evals, k)
    _mark(f"sigmas ({npc} cols)")

    # ---- extended-coset tables ------------------------------------------------
    d = quotient_degree(cs)
    k_ext = k + ceil_log2(max(d - 1, 2))
    n_ext = 1 << k_ext

    def to_ext(coeffs):
        pad = jnp.zeros(coeffs.shape[:-2] + (n_ext - n, 32), jnp.uint8)
        return coset_ntt(jnp.concatenate([coeffs, pad], axis=-2), k_ext)

    fixed_ext = to_ext(fixed_coeffs)
    sigma_ext = to_ext(sigma_coeffs)
    _mark(f"ext tables (k_ext={k_ext})")

    u = usable_rows(n)
    l0_ext = _lagrange_indicator_ext([0], k, k_ext)
    llast_ext = _lagrange_indicator_ext([u], k, k_ext)
    # active rows: 0..u-1  => 1 - (l_last + sum_{i>u} l_i)
    inactive = list(range(u, n))
    inact_ext = _lagrange_indicator_ext(inactive, k, k_ext)
    one_ext = jnp.broadcast_to(jnp.asarray(F.from_int(F.R)), (n_ext, 32))
    lactive_ext = F.sub(one_ext, inact_ext)

    # identity poly X on the extended coset: g * omega_ext^i (device)
    dom_ext = domain(k_ext)
    x_ext = F.mul(
        F.power_table(dom_ext.omega, n_ext),
        jnp.asarray(F.from_int(FR_GENERATOR % R * F.R % R)),
    )

    # 1 / (X^n - 1) on the extended coset: gn * (omega_ext^n)^i - 1 (device)
    gn = pow(FR_GENERATOR, n, R)
    wn = pow(dom_ext.omega, n, R)
    tvals = F.sub(
        F.mul(F.power_table(wn, n_ext), jnp.asarray(F.from_int(gn * F.R % R))),
        F.ones_mont((n_ext,)),
    )
    t_inv_ext = F.batch_inv(tvals, axis=0)
    _mark("lagrange/coset helpers")

    # ---- commitments -> vk ------------------------------------------------------
    fixed_comms = srs.commit_many(fixed_coeffs) if cs.num_fixed else []
    sigma_comms = srs.commit_many(sigma_coeffs) if npc else []
    _mark("commitments")

    vk = VerifyingKey(
        k=k,
        cs=cs,
        fixed_commitments=fixed_comms,
        sigma_commitments=sigma_comms,
        g2=srs.g2,
        s_g2=srs.s_g2,
    )
    pk = ProvingKey(
        vk=vk,
        fixed_evals=fixed_evals,
        fixed_coeffs=fixed_coeffs,
        sigma_evals=sigma_evals,
        sigma_coeffs=sigma_coeffs,
        k_ext=k_ext,
        fixed_ext=fixed_ext,
        sigma_ext=sigma_ext,
        l0_ext=l0_ext,
        llast_ext=llast_ext,
        lactive_ext=lactive_ext,
        x_ext=x_ext,
        t_inv_ext=t_inv_ext,
        delta_pows=delta_pows,
    )
    return pk, vk
