"""PLONK prover — the TPU-native `create_proof`.

Replaces the reference backend's `create_proof::<KZG, ProverSHPLONK, ...>`
(external halo2_proofs; driven by every bench, reference
circuit-benchmarks/src/evm_circuit.rs:82-99, SURVEY.md §3.2 HOT LOOP 2).
Protocol structure mirrors halo2 (phased advice commitments with
per-phase challenges, classic permuted-column lookup argument, permutation
grand product, coset-quotient vanishing argument, SHPLONK multiopen) but
every polynomial pass is a batched device op:

  witness columns (eval form)           — synthesized columnar by the circuit
  -> iNTT -> MSM commit                 — batched NTT + Pippenger per column
  lookup permuted cols / grand products — sorts host-side, scans on device
  quotient                              — one Evaluator pass over the
                                          extended coset, y-combined, * 1/t
  multiopen                             — SHPLONK in evaluation form (kzg.py)

Divergences from halo2 (documented, self-consistent with verifier.py):
  * ZK blinding randomizes rows [u, n-1) of every committed witness
    column (advice, permuted lookup cols, grand products, logup helpers)
    — row n-1 stays zero because row-0 gates with -1 rotations wrap to
    it (halo2 instead forbids such wraps circuit-side).  BLINDING_FACTORS
    random rows mask the handful of openings each poly gets.
  * single permutation grand product (no column chunking) — quotient
    degree grows with the number of equality columns; fine until the
    SuperCircuit-scale configs land.
  * Blake2b transcript, same byte conventions as halo2 (transcript.py).
"""

from __future__ import annotations

import secrets

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.field import fr
from ..crypto.params import FR_MODULUS as R
from ..poly.domain import domain
from ..poly.kzg import Query, Srs, eval_at
from ..poly.ntt import coset_intt, coset_ntt, intt
from ..poly.transcript import Blake2bTranscript
from ..crypto.curve import g1_to_affine_ints
from .circuit import BLINDING_FACTORS, Circuit, ConstraintSystem, usable_rows
from .expression import Evaluator
from .keygen import ProvingKey

F = fr()


def _mont_scalar(v: int):
    return jnp.asarray(F.from_int(v % R * F.R % R))


def _to_host_ints(evals) -> list[int]:
    return F.to_ints(np.asarray(F.from_mont(evals)))


def _exclusive_prefix_product(ratio, u: int, n: int):
    """Z[0] = 1, Z[i] = prod_{j<i} ratio[j]; rows >= u forced to ratio 1."""
    row = jnp.arange(n)
    ones = F.ones_mont((n,))
    ratio = F.select(row < u, ratio, ones)
    incl = jax.lax.associative_scan(F._mul, ratio, axis=0)
    one = F.ones_mont((1,))
    return jnp.concatenate([one, incl[:-1]], axis=0)


def _permuted_lookup_columns(a_host: list[int], s_host: list[int], u: int, n: int):
    """halo2's lookup permutation: A' = sorted inputs; S' pairs each first
    occurrence of a value with a matching table row (reference gets this
    from halo2_proofs lookup::prover; re-derived)."""
    from collections import Counter

    a_sorted = sorted(a_host[:u])
    leftover = Counter(s_host[:u])
    s_prime: list = [None] * u
    fill_slots = []
    for i in range(u):
        if i == 0 or a_sorted[i] != a_sorted[i - 1]:
            if leftover[a_sorted[i]] <= 0:
                raise ValueError(
                    f"lookup input value {a_sorted[i]} not found in table"
                )
            s_prime[i] = a_sorted[i]
            leftover[a_sorted[i]] -= 1
        else:
            fill_slots.append(i)
    rest = list(leftover.elements())
    for slot, v in zip(fill_slots, rest):
        s_prime[slot] = v
    # pad blinding tail deterministically
    a_pad = a_sorted + [a_sorted[-1]] * (n - u) if u else [0] * n
    s_pad = s_prime + [s_prime[-1]] * (n - u) if u else [0] * n
    return a_pad, s_pad


def _compress(exprs, theta: int, ev: Evaluator, shape):
    """Horner fold acc = acc * theta + expr over the expression list."""
    acc = jnp.zeros(shape, jnp.uint8)
    th = _mont_scalar(theta)
    for e in exprs:
        v = ev.eval(e)
        if v.ndim < len(shape):
            v = jnp.broadcast_to(v, shape)
        acc = F.add(F.mul(acc, th), v)
    return acc


def _make_blinder(u: int, n: int, rng: np.random.Generator):
    """Returns blind(evals, start_row) -> evals with rows [start, n-1)
    replaced by random canonical field elements (row n-1 stays zero: row-0
    gates with -1 rotations wrap to it)."""

    def blind(evals, start: int = u):
        arr = np.asarray(evals).copy()
        for i in range(start, n - 1):
            arr[i] = F.from_int(
                int.from_bytes(rng.bytes(48), "little") % R * F.R % R
            )
        return jnp.asarray(arr)

    return blind


def prove(
    pk: ProvingKey,
    circuit: Circuit,
    instances: list[list[int]],
    srs: Srs,
    transcript: Blake2bTranscript | None = None,
    rng: np.random.Generator | None = None,
) -> bytes:
    cs: ConstraintSystem = pk.vk.cs
    # (re)configure the instance so its column-index attributes exist;
    # configure must be deterministic, pk.vk.cs stays authoritative
    circuit.configure(ConstraintSystem())
    k, n = pk.k, pk.n
    k_ext = pk.k_ext
    n_ext = 1 << k_ext
    rot_scale = 1 << (k_ext - k)
    u = usable_rows(n)
    dom = domain(k)
    t = transcript or Blake2bTranscript()
    rng = rng or np.random.default_rng(
        int.from_bytes(secrets.token_bytes(16), "little")
    )
    blind = _make_blinder(u, n, rng)

    # ---- instances ---------------------------------------------------------
    for col in instances:
        for v in col:
            t.common_scalar(v % R)
    inst_cols = []
    for col_vals in instances:
        vals = [v % R * F.R % R for v in col_vals] + [0] * (n - len(col_vals))
        inst_cols.append(F.from_ints(vals))
    if not inst_cols:
        inst_cols = [np.zeros((n, 32), np.uint8)]
    instance_evals = jnp.asarray(np.stack(inst_cols))
    instance_coeffs = intt(instance_evals, k)

    # ---- phased advice synthesis + commitment -----------------------------------
    num_adv = max(cs.num_advice, 1)
    advice_evals = np.zeros((num_adv, n, 32), np.uint8)
    challenges: dict[int, object] = {}
    challenge_ints: dict[int, int] = {}
    advice_coeffs = None
    for phase in range(cs.num_phases):
        cols = circuit.synthesize(phase, n, challenges, instances)
        phase_cols = sorted(
            ci for ci, ph in enumerate(cs.advice_phases) if ph == phase
        )
        for ci in phase_cols:
            advice_evals[ci] = np.asarray(blind(cols[ci]))
            coeffs = intt(jnp.asarray(advice_evals[ci]), k)
            comm = srs.commit_affine(coeffs)
            t.write_point(comm)
        for idx, ph in enumerate(cs.challenge_phases):
            if ph == phase:
                c = t.squeeze_challenge()
                challenge_ints[idx] = c
                challenges[idx] = _mont_scalar(c)
    advice_evals = jnp.asarray(advice_evals)
    advice_coeffs = intt(advice_evals, k)

    tables_h = {
        "fixed": pk.fixed_evals,
        "advice": advice_evals,
        "instance": instance_evals,
    }
    ev_h = Evaluator(tables_h, challenges, rot_scale=1)

    # ---- lookups: permuted columns -------------------------------------------
    theta = t.squeeze_challenge()
    lookup_data = []
    for lk in cs.lookups:
        a_evals = _compress(lk.inputs, theta, ev_h, (n, 32))
        s_evals = _compress(lk.tables, theta, ev_h, (n, 32))
        a_host = _to_host_ints(a_evals)
        s_host = _to_host_ints(s_evals)
        ap_host, sp_host = _permuted_lookup_columns(a_host, s_host, u, n)
        ap = blind(F.from_ints([v * F.R % R for v in ap_host]))
        sp = blind(F.from_ints([v * F.R % R for v in sp_host]))
        ap_coeffs = intt(ap, k)
        sp_coeffs = intt(sp, k)
        t.write_point(srs.commit_affine(ap_coeffs))
        t.write_point(srs.commit_affine(sp_coeffs))
        lookup_data.append(
            dict(
                a=a_evals, s=s_evals, ap=ap, sp=sp,
                ap_coeffs=ap_coeffs, sp_coeffs=sp_coeffs,
            )
        )

    # ---- logup lookups: compress + multiplicities (committed pre-beta) -----
    logup_data = []
    for lg in cs.logups:
        a_list = [_compress(tup, theta, ev_h, (n, 32)) for tup in lg.inputs]
        t_evals = _compress(lg.table, theta, ev_h, (n, 32))
        t_host = _to_host_ints(t_evals)
        first_idx: dict[int, int] = {}
        for i in range(u):
            first_idx.setdefault(t_host[i], i)
        mult = [0] * n
        for a_evals in a_list:
            for v in _to_host_ints(a_evals)[:u]:
                idx = first_idx.get(v)
                if idx is None:
                    raise ValueError(
                        f"logup '{lg.name}': input value not in table"
                    )
                mult[idx] += 1
        m_col = blind(F.from_ints([v * F.R % R for v in mult]))
        m_coeffs = intt(m_col, k)
        t.write_point(srs.commit_affine(m_coeffs))
        logup_data.append(
            dict(a=a_list, t=t_evals, m=m_col, m_coeffs=m_coeffs)
        )

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()
    beta_m, gamma_m = _mont_scalar(beta), _mont_scalar(gamma)

    # ---- permutation grand product -------------------------------------------
    perm_cols = cs.perm_columns
    z_perm_coeffs = None
    if perm_cols:
        omega_vec = jnp.asarray(
            F.from_ints(
                [pow(dom.omega, i, R) * F.R % R for i in range(n)]
            )
        )
        num = F.ones_mont((n,))
        den = F.ones_mont((n,))
        col_tables = {"advice": advice_evals, "fixed": pk.fixed_evals,
                      "instance": instance_evals}
        for ci, (kind, col) in enumerate(perm_cols):
            v = col_tables[kind][col]
            id_term = F.mul(omega_vec, _mont_scalar(pk.delta_pows[ci]))
            num = F.mul(num, F.add(v, F.add(F.mul(beta_m, id_term), gamma_m)))
            sig = pk.sigma_evals[ci]
            den = F.mul(den, F.add(v, F.add(F.mul(beta_m, sig), gamma_m)))
        ratio = F.mul(num, F.batch_inv(den, axis=0))
        z_perm = blind(_exclusive_prefix_product(ratio, u, n), u + 1)
        z_perm_coeffs = intt(z_perm, k)
        t.write_point(srs.commit_affine(z_perm_coeffs))

    # ---- lookup grand products ---------------------------------------------------
    for ld in lookup_data:
        num = F.mul(F.add(ld["a"], beta_m), F.add(ld["s"], gamma_m))
        den = F.mul(F.add(ld["ap"], beta_m), F.add(ld["sp"], gamma_m))
        ratio = F.mul(num, F.batch_inv(den, axis=0))
        z = blind(_exclusive_prefix_product(ratio, u, n), u + 1)
        ld["z"] = z
        ld["z_coeffs"] = intt(z, k)
        t.write_point(srs.commit_affine(ld["z_coeffs"]))

    # ---- logup helper columns + running sums -------------------------------
    row_lt_u = jnp.arange(n) < u
    for ld in logup_data:
        hs = []
        for a_evals in ld["a"]:
            inv = F.batch_inv(F.add(a_evals, beta_m), axis=0)
            h = F.select(row_lt_u, inv, F.zeros((n,)))
            hs.append(h)
        t_inv = F.batch_inv(F.add(ld["t"], beta_m), axis=0)
        h_t = F.select(row_lt_u, F.mul(ld["m"], t_inv), F.zeros((n,)))
        # phi[0] = 0; phi[i+1] = phi[i] + sum_j h_j[i] - h_t[i]
        delta = F.zeros((n,))
        for h in hs:
            delta = F.add(delta, h)
        delta = F.sub(delta, h_t)
        incl = jax.lax.associative_scan(F._add, delta, axis=0)
        phi = jnp.concatenate([F.zeros((1,)), incl[:-1]], axis=0)
        hs = [blind(h) for h in hs]
        h_t = blind(h_t)
        phi = blind(phi, u + 1)
        ld["hs"] = hs
        ld["h_t"] = h_t
        ld["phi"] = phi
        ld["h_coeffs"] = [intt(h, k) for h in hs]
        ld["h_t_coeffs"] = intt(h_t, k)
        ld["phi_coeffs"] = intt(phi, k)
        for c in ld["h_coeffs"]:
            t.write_point(srs.commit_affine(c))
        t.write_point(srs.commit_affine(ld["h_t_coeffs"]))
        t.write_point(srs.commit_affine(ld["phi_coeffs"]))

    y = t.squeeze_challenge()
    y_m = _mont_scalar(y)

    # ---- quotient on the extended coset -------------------------------------------
    def to_ext(coeffs):
        pad_shape = coeffs.shape[:-2] + (n_ext - n, 32)
        return coset_ntt(
            jnp.concatenate([coeffs, jnp.zeros(pad_shape, jnp.uint8)], axis=-2),
            k_ext,
        )

    advice_ext = to_ext(advice_coeffs)
    instance_ext = to_ext(instance_coeffs)
    tables_e = {
        "fixed": pk.fixed_ext,
        "advice": advice_ext,
        "instance": instance_ext,
    }
    ev_e = Evaluator(tables_e, challenges, rot_scale=rot_scale)

    acc = jnp.zeros((n_ext, 32), jnp.uint8)
    first = True

    def add_constraint(cvals):
        nonlocal acc, first
        if cvals.ndim == 1:
            cvals = jnp.broadcast_to(cvals, (n_ext, 32))
        acc = cvals if first else F.add(F.mul(acc, y_m), cvals)
        first = False

    for g in cs.gates:
        for p in g.polys:
            add_constraint(ev_e.eval(p))

    one_ext = F.ones_mont((n_ext,))
    if perm_cols:
        z_ext = to_ext(z_perm_coeffs)
        z_w = jnp.roll(z_ext, -rot_scale, axis=0)
        add_constraint(F.mul(pk.l0_ext, F.sub(z_ext, one_ext)))
        add_constraint(
            F.mul(pk.llast_ext, F.sub(F.mul(z_ext, z_ext), z_ext))
        )
        numx = one_ext
        denx = one_ext
        col_ext_tables = {"advice": advice_ext, "fixed": pk.fixed_ext,
                          "instance": instance_ext}
        for ci, (kind, col) in enumerate(perm_cols):
            v = col_ext_tables[kind][col]
            idt = F.mul(pk.x_ext, _mont_scalar(pk.delta_pows[ci]))
            numx = F.mul(numx, F.add(v, F.add(F.mul(beta_m, idt), gamma_m)))
            denx = F.mul(denx, F.add(v, F.add(F.mul(beta_m, pk.sigma_ext[ci]), gamma_m)))
        add_constraint(
            F.mul(pk.lactive_ext, F.sub(F.mul(z_w, denx), F.mul(z_ext, numx)))
        )

    for lk, ld in zip(cs.lookups, lookup_data):
        a_ext = _compress(lk.inputs, theta, ev_e, (n_ext, 32))
        s_ext = _compress(lk.tables, theta, ev_e, (n_ext, 32))
        ap_ext = to_ext(ld["ap_coeffs"])
        sp_ext = to_ext(ld["sp_coeffs"])
        z_ext = to_ext(ld["z_coeffs"])
        z_w = jnp.roll(z_ext, -rot_scale, axis=0)
        ap_prev = jnp.roll(ap_ext, rot_scale, axis=0)
        add_constraint(F.mul(pk.l0_ext, F.sub(z_ext, one_ext)))
        add_constraint(F.mul(pk.llast_ext, F.sub(F.mul(z_ext, z_ext), z_ext)))
        lhs = F.mul(z_w, F.mul(F.add(ap_ext, beta_m), F.add(sp_ext, gamma_m)))
        rhs = F.mul(z_ext, F.mul(F.add(a_ext, beta_m), F.add(s_ext, gamma_m)))
        add_constraint(F.mul(pk.lactive_ext, F.sub(lhs, rhs)))
        add_constraint(F.mul(pk.l0_ext, F.sub(ap_ext, sp_ext)))
        add_constraint(
            F.mul(
                pk.lactive_ext,
                F.mul(F.sub(ap_ext, sp_ext), F.sub(ap_ext, ap_prev)),
            )
        )

    for lg, ld in zip(cs.logups, logup_data):
        a_exts = [_compress(tup, theta, ev_e, (n_ext, 32)) for tup in lg.inputs]
        t_ext = _compress(lg.table, theta, ev_e, (n_ext, 32))
        h_exts = [to_ext(c) for c in ld["h_coeffs"]]
        ht_ext = to_ext(ld["h_t_coeffs"])
        m_ext = to_ext(ld["m_coeffs"])
        phi_ext = to_ext(ld["phi_coeffs"])
        phi_w = jnp.roll(phi_ext, -rot_scale, axis=0)
        add_constraint(F.mul(pk.l0_ext, phi_ext))
        add_constraint(F.mul(pk.llast_ext, phi_ext))
        for h_ext_j, a_ext_j in zip(h_exts, a_exts):
            add_constraint(
                F.mul(
                    pk.lactive_ext,
                    F.sub(F.mul(h_ext_j, F.add(a_ext_j, beta_m)), one_ext),
                )
            )
        add_constraint(
            F.mul(
                pk.lactive_ext,
                F.sub(F.mul(ht_ext, F.add(t_ext, beta_m)), m_ext),
            )
        )
        dsum = F.zeros((n_ext, 32))
        for h_ext_j in h_exts:
            dsum = F.add(dsum, h_ext_j)
        dsum = F.sub(dsum, ht_ext)
        add_constraint(
            F.mul(pk.lactive_ext, F.sub(F.sub(phi_w, phi_ext), dsum))
        )

    h_ext = F.mul(acc, pk.t_inv_ext)
    h_coeffs = coset_intt(h_ext, k_ext)
    n_pieces = n_ext // n
    h_pieces = [h_coeffs[i * n : (i + 1) * n] for i in range(n_pieces)]
    for piece in h_pieces:
        t.write_point(srs.commit_affine(piece))

    x = t.squeeze_challenge()

    # ---- evaluations ------------------------------------------------------------
    adv_queries = sorted(
        {(c, r) for (kind, c, r) in cs.all_queries() if kind == "advice"}
        | {(c, 0) for (kind, c) in perm_cols if kind == "advice"}
    )
    fix_queries = sorted(
        {(c, r) for (kind, c, r) in cs.all_queries() if kind == "fixed"}
        | {(c, 0) for (kind, c) in perm_cols if kind == "fixed"}
    )

    def rot_point(rot: int) -> int:
        return x * pow(dom.omega, rot % dom.n, R) % R

    # materialize each queried poly ONCE: shplonk_open groups by object
    # identity, so two rotations of one column must share the array object
    adv_polys = {c: advice_coeffs[c] for c in {c for c, _ in adv_queries}}
    fix_polys = {c: pk.fixed_coeffs[c] for c in {c for c, _ in fix_queries}}
    sig_polys = {ci: pk.sigma_coeffs[ci] for ci in range(len(perm_cols))}

    queries: list[Query] = []
    for c, r in adv_queries:
        e = eval_at(adv_polys[c], rot_point(r))
        t.write_scalar(e)
        queries.append(Query(adv_polys[c], rot_point(r), e, None))
    for c, r in fix_queries:
        e = eval_at(fix_polys[c], rot_point(r))
        t.write_scalar(e)
        queries.append(Query(fix_polys[c], rot_point(r), e, None))
    for ci in range(len(perm_cols)):
        e = eval_at(sig_polys[ci], x)
        t.write_scalar(e)
        queries.append(Query(sig_polys[ci], x, e, None))
    if perm_cols:
        for pt in (x, rot_point(1)):
            e = eval_at(z_perm_coeffs, pt)
            t.write_scalar(e)
            queries.append(Query(z_perm_coeffs, pt, e, None))
    for ld in lookup_data:
        for poly, pt in (
            (ld["z_coeffs"], x),
            (ld["z_coeffs"], rot_point(1)),
            (ld["ap_coeffs"], x),
            (ld["ap_coeffs"], rot_point(-1)),
            (ld["sp_coeffs"], x),
        ):
            e = eval_at(poly, pt)
            t.write_scalar(e)
            queries.append(Query(poly, pt, e, None))
    for ld in logup_data:
        polys = [(c, x) for c in ld["h_coeffs"]]
        polys += [
            (ld["h_t_coeffs"], x),
            (ld["m_coeffs"], x),
            (ld["phi_coeffs"], x),
            (ld["phi_coeffs"], rot_point(1)),
        ]
        for poly, pt in polys:
            e = eval_at(poly, pt)
            t.write_scalar(e)
            queries.append(Query(poly, pt, e, None))

    # combined h poly: sum_i x^{n*i} h_i
    h_comb = F.zeros((n,))
    xn = pow(x, n, R)
    for i, piece in enumerate(h_pieces):
        h_comb = F.add(h_comb, F.mul(piece, _mont_scalar(pow(xn, i, R))))
    e_h = eval_at(h_comb, x)
    queries.append(Query(h_comb, x, e_h, None))

    from ..poly.kzg import shplonk_open

    shplonk_open(srs, queries, t)
    return bytes(t.proof)
