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


def _permuted_lookup_columns(a_dig: np.ndarray, s_dig: np.ndarray, u: int, n: int):
    """halo2's lookup permutation: A' = inputs grouped by value; S' pairs
    each group's first row with a matching table row, leftover table rows
    fill the rest.  Operates directly on (n, 32) Montgomery digit arrays —
    any total order works for the argument (it only needs equal values
    adjacent), so rows are ordered by np.unique's row-lexicographic id,
    fully vectorized (VERDICT r2 W3: the sorted/Counter host loop)."""
    if u == 0:
        z = np.zeros((n, 32), np.uint8)
        return z, z.copy()
    a_u, s_u = np.asarray(a_dig)[:u], np.asarray(s_dig)[:u]
    uniq, inv = np.unique(
        np.concatenate([a_u, s_u], axis=0), axis=0, return_inverse=True
    )
    a_ids, s_ids = inv[:u], inv[u:]
    a_sort = np.sort(a_ids)
    first = np.ones(u, bool)
    first[1:] = a_sort[1:] != a_sort[:-1]
    distinct = a_sort[first]
    s_sort = np.sort(s_ids)
    pos = np.searchsorted(s_sort, distinct)
    ok = (pos < u) & (s_sort[np.minimum(pos, u - 1)] == distinct)
    if not ok.all():
        bad = uniq[distinct[~ok][0]]
        raise ValueError(
            f"lookup input value {F.to_int(bad)} (mont digits) not found in table"
        )
    used = np.zeros(u, bool)
    used[pos] = True
    sp_ids = np.empty(u, inv.dtype)
    sp_ids[first] = distinct
    sp_ids[~first] = s_sort[~used]
    ap, sp = uniq[a_sort], uniq[sp_ids]
    # pad blinding tail deterministically (rows >= u get re-blinded anyway)
    a_pad = np.concatenate([ap, np.repeat(ap[-1:], n - u, axis=0)])
    s_pad = np.concatenate([sp, np.repeat(sp[-1:], n - u, axis=0)])
    return a_pad, s_pad


def _compress(exprs, theta, ev: Evaluator, shape):
    """Horner fold acc = acc * theta + expr over the expression list.
    `theta` is an int challenge or an already-Montgomery digit array
    (the jitted quotient body passes the traced array)."""
    acc = None
    th = theta if hasattr(theta, "shape") else _mont_scalar(theta)
    for e in exprs:
        v = ev.eval(e)
        if v.ndim < len(shape):
            v = jnp.broadcast_to(v, shape)
        acc = v if acc is None else F.add(F.mul(acc, th), v)
    return acc if acc is not None else jnp.zeros(shape, jnp.uint8)


def _make_blinder(u: int, n: int, rng: np.random.Generator):
    """Returns blind(evals, start_row) -> evals with rows [start, n-1)
    replaced by random canonical field elements (row n-1 stays zero: row-0
    gates with -1 rotations wrap to it).

    Vectorized (VERDICT r2 W3: the per-row host loop): draw two uniform
    248-bit digit arrays u, v and form u + 2^248 * v mod p entirely in
    digit space on device — statistically uniform over [0, p) (distance
    <= p / 2^496).  The mul constant is mont(2^248 * R) so F.mul's REDC
    yields exactly 2^248 * v in digit value."""
    c248 = jnp.asarray(F.from_int((1 << 248) % R * F.R % R))

    def _rand_rows(count: int):
        raw = np.frombuffer(rng.bytes(count * 64), np.uint8).reshape(count, 2, 32).copy()
        raw[..., 31] = 0  # < 2^248
        uu, vv = jnp.asarray(raw[:, 0]), jnp.asarray(raw[:, 1])
        return F.add(uu, F.mul(vv, c248))

    def blind(evals, start: int = u):
        count = (n - 1) - start
        if count <= 0:
            return jnp.asarray(evals)
        rnd = _rand_rows(count)
        return jax.lax.dynamic_update_slice(jnp.asarray(evals), rnd, (start, 0))

    return blind


def prove(
    pk: ProvingKey,
    circuit: Circuit,
    instances: list[list[int]],
    srs: Srs,
    transcript: Blake2bTranscript | None = None,
    rng: np.random.Generator | None = None,
    mesh=None,
    mesh_axis: str = "rows",
) -> bytes:
    """When `mesh` (a jax.sharding.Mesh) is given, every hot polynomial
    pass — iNTT/coset NTT, column commitments (MSM), grand-product scans —
    runs row-sharded over `mesh[mesh_axis]` via ICI collectives
    (parallel/sharding.ProverMesh).  The proof bytes are identical to the
    single-device path for the same rng (exact field arithmetic; asserted
    by tests/test_sharded_prove.py)."""
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

    # optional stage tracing: ZKEVM_PROVE_TRACE=1 prints wall-clock per
    # prover phase (the reference wraps phases in ark-std timers,
    # circuit-benchmarks/src/evm_circuit.rs:67-120)
    import os as _os
    import time as _time

    _trace = _os.environ.get("ZKEVM_PROVE_TRACE") == "1"
    _t0 = _time.perf_counter()

    def _mark(stage: str):
        nonlocal _t0
        if _trace:
            now = _time.perf_counter()
            print(f"[prove] {stage}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    # hot-op bundle: single-device defaults, or mesh-sharded versions
    if mesh is not None:
        from ..parallel.sharding import ProverMesh

        pm = ProverMesh(mesh, mesh_axis, k, k_ext, srs)
        intt_k = pm.intt
        commit = pm.commit_affine
        coset_ntt_ext = pm.coset_ntt_ext
        coset_intt_ext = pm.coset_intt_ext
        prefix_prod = pm.exclusive_prefix_product
        prefix_sum = pm.exclusive_prefix_sum
    else:
        intt_k = lambda x: intt(x, k)  # noqa: E731
        commit = srs.commit_affine
        coset_ntt_ext = lambda x: coset_ntt(x, k_ext)  # noqa: E731
        coset_intt_ext = lambda x: coset_intt(x, k_ext)  # noqa: E731
        prefix_prod = _exclusive_prefix_product

        def prefix_sum(delta):
            incl = jax.lax.associative_scan(F._add, delta, axis=0)
            return jnp.concatenate([F.zeros((1,)), incl[:-1]], axis=0)

    # ---- instances ---------------------------------------------------------
    for col in instances:
        for v in col:
            t.common_scalar(v % R)
    inst_cols = []
    for col_vals in instances:
        dig = np.zeros((n, 32), np.uint8)
        if col_vals:
            dig[: len(col_vals)] = F.from_ints(
                [v % R * F.R % R for v in col_vals]
            )
        inst_cols.append(dig)
    if not inst_cols:
        inst_cols = [np.zeros((n, 32), np.uint8)]
    instance_evals = jnp.asarray(np.stack(inst_cols))
    instance_coeffs = intt_k(instance_evals)

    # ---- phased advice synthesis + commitment -----------------------------------
    num_adv = max(cs.num_advice, 1)
    advice_evals = np.zeros((num_adv, n, 32), np.uint8)
    challenges: dict[int, object] = {}
    challenge_ints: dict[int, int] = {}
    advice_coeffs = None
    advice_coeffs_np = (
        np.zeros((num_adv, n, 32), np.uint8) if mesh is None else None
    )
    for phase in range(cs.num_phases):
        cols = circuit.synthesize(phase, n, challenges, instances)
        _mark(f"advice synth phase {phase}")
        phase_cols = sorted(
            ci for ci, ph in enumerate(cs.advice_phases) if ph == phase
        )
        if phase_cols:
            # batch the phase's iNTTs into one transform and its
            # commitments into one multi-column MSM; results are written
            # in column order — no challenge is squeezed between
            # same-phase writes
            for ci in phase_cols:
                advice_evals[ci] = np.asarray(blind(cols[ci]))
            batch = jnp.asarray(advice_evals[np.asarray(phase_cols)])
            coeffs_batch = intt_k(batch)
            if mesh is None:
                for bi, ci in enumerate(phase_cols):
                    advice_coeffs_np[ci] = np.asarray(coeffs_batch[bi])
                for point in srs.commit_many(coeffs_batch):
                    t.write_point(point)
            else:
                for bi, ci in enumerate(phase_cols):
                    t.write_point(commit(coeffs_batch[bi]))
            _mark(f"advice commit phase {phase} ({len(phase_cols)} cols)")
        for idx, ph in enumerate(cs.challenge_phases):
            if ph == phase:
                c = t.squeeze_challenge()
                challenge_ints[idx] = c
                challenges[idx] = _mont_scalar(c)
    advice_evals = jnp.asarray(advice_evals)
    # coefficient forms were already produced per phase (single-device);
    # the mesh path re-transforms to keep coeffs sharded
    advice_coeffs = (jnp.asarray(advice_coeffs_np) if mesh is None
                     else intt_k(advice_evals))
    _mark("advice synth+commit")

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
        ap_dig, sp_dig = _permuted_lookup_columns(
            np.asarray(a_evals), np.asarray(s_evals), u, n
        )
        ap = blind(ap_dig)
        sp = blind(sp_dig)
        ap_coeffs = intt_k(ap)
        sp_coeffs = intt_k(sp)
        t.write_point(commit(ap_coeffs))
        t.write_point(commit(sp_coeffs))
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
        # multiplicity counting, vectorized (VERDICT r2 W3): unique row ids
        # over table+inputs, first-occurrence index per table value via
        # minimum.at, then one bincount over the mapped input rows
        t_u = np.asarray(t_evals)[:u]
        a_us = [np.asarray(a)[:u] for a in a_list]
        uniq, inv = np.unique(
            np.concatenate([t_u] + a_us, axis=0), axis=0, return_inverse=True
        )
        t_ids = inv[:u]
        first_idx = np.full(uniq.shape[0], n, np.int64)
        np.minimum.at(first_idx, t_ids, np.arange(u))
        a_ids = inv[u:]
        mapped = first_idx[a_ids]
        if (mapped >= n).any():
            bad = uniq[a_ids[np.argmax(mapped >= n)]]
            raise ValueError(
                f"logup '{lg.name}': input value not in table "
                f"(mont digits {F.to_int(bad)})"
            )
        mult = np.bincount(mapped, minlength=n).astype(np.int64)
        mult_dig = np.zeros((n, 32), np.uint8)
        for b in range(8):  # counts < 2^64
            mult_dig[:, b] = (mult >> (8 * b)) & 0xFF
        m_col = blind(F.to_mont(jnp.asarray(mult_dig)))
        m_coeffs = intt_k(m_col)
        t.write_point(commit(m_coeffs))
        logup_data.append(
            dict(a=a_list, t=t_evals, m=m_col, m_coeffs=m_coeffs)
        )

    _mark("lookup permuted cols")
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
        z_perm = blind(prefix_prod(ratio, u, n), u + 1)
        z_perm_coeffs = intt_k(z_perm)
        t.write_point(commit(z_perm_coeffs))

    # ---- lookup grand products ---------------------------------------------------
    for ld in lookup_data:
        num = F.mul(F.add(ld["a"], beta_m), F.add(ld["s"], gamma_m))
        den = F.mul(F.add(ld["ap"], beta_m), F.add(ld["sp"], gamma_m))
        ratio = F.mul(num, F.batch_inv(den, axis=0))
        z = blind(prefix_prod(ratio, u, n), u + 1)
        ld["z"] = z
        ld["z_coeffs"] = intt_k(z)
        t.write_point(commit(ld["z_coeffs"]))

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
        phi = prefix_sum(delta)
        hs = [blind(h) for h in hs]
        h_t = blind(h_t)
        phi = blind(phi, u + 1)
        ld["hs"] = hs
        ld["h_t"] = h_t
        ld["phi"] = phi
        ld["h_coeffs"] = [intt_k(h) for h in hs]
        ld["h_t_coeffs"] = intt_k(h_t)
        ld["phi_coeffs"] = intt_k(phi)
        for c in ld["h_coeffs"]:
            t.write_point(commit(c))
        t.write_point(commit(ld["h_t_coeffs"]))
        t.write_point(commit(ld["phi_coeffs"]))

    _mark("grand products")
    y = t.squeeze_challenge()
    y_m = _mont_scalar(y)

    # ---- quotient on the extended coset -------------------------------------------
    def to_ext(coeffs):
        pad_shape = coeffs.shape[:-2] + (n_ext - n, 32)
        return coset_ntt_ext(
            jnp.concatenate([coeffs, jnp.zeros(pad_shape, jnp.uint8)], axis=-2)
        )

    advice_ext = to_ext(advice_coeffs)
    instance_ext = to_ext(instance_coeffs)

    # ---- whole quotient as ONE jit: the y-combined constraint fold over
    # gates + permutation + lookups + logUps is hundreds of elementwise
    # field ops; fused they are a handful of HBM passes (and one compile)
    # instead of per-op dispatches — essential on TPU and for the mesh
    # path, where each eager op on sharded arrays would compile its own SPMD
    # executable.  Transforms (coset NTTs) stay outside; only elementwise
    # math and rolls live in the body.
    qin = {
        "fixed": pk.fixed_ext,
        "advice": advice_ext,
        "instance": instance_ext,
        "challenges": dict(challenges),
        "theta": _mont_scalar(theta),
        "beta": beta_m,
        "gamma": gamma_m,
        "y": y_m,
        "l0": pk.l0_ext,
        "llast": pk.llast_ext,
        "lactive": pk.lactive_ext,
        "x_ext": pk.x_ext,
        "sigma": list(pk.sigma_ext),
        "t_inv": pk.t_inv_ext,
        "z_perm": to_ext(z_perm_coeffs) if perm_cols else [],
        "lookups": [
            {
                "ap": to_ext(ld["ap_coeffs"]),
                "sp": to_ext(ld["sp_coeffs"]),
                "z": to_ext(ld["z_coeffs"]),
            }
            for ld in lookup_data
        ],
        "logups": [
            {
                "hs": [to_ext(c) for c in ld["h_coeffs"]],
                "ht": to_ext(ld["h_t_coeffs"]),
                "m": to_ext(ld["m_coeffs"]),
                "phi": to_ext(ld["phi_coeffs"]),
            }
            for ld in logup_data
        ],
    }
    delta_m = [_mont_scalar(d) for d in pk.delta_pows]

    def _quotient_body(qi):
        ev_e = Evaluator(
            {"fixed": qi["fixed"], "advice": qi["advice"],
             "instance": qi["instance"]},
            qi["challenges"], rot_scale=rot_scale,
        )
        th, be, ga, yv = qi["theta"], qi["beta"], qi["gamma"], qi["y"]
        acc = jnp.zeros((n_ext, 32), jnp.uint8)
        first = True

        def add_constraint(cvals):
            nonlocal acc, first
            if cvals.ndim == 1:
                cvals = jnp.broadcast_to(cvals, (n_ext, 32))
            acc = cvals if first else F.add(F.mul(acc, yv), cvals)
            first = False

        for g in cs.gates:
            for p_ in g.polys:
                add_constraint(ev_e.eval(p_))

        one_s = F.ones_mont(())  # scalar; broadcasts (no big jit constant)
        if perm_cols:
            z_ext = qi["z_perm"]
            z_w = jnp.roll(z_ext, -rot_scale, axis=0)
            add_constraint(F.mul(qi["l0"], F.sub(z_ext, one_s)))
            add_constraint(
                F.mul(qi["llast"], F.sub(F.mul(z_ext, z_ext), z_ext))
            )
            numx = None
            denx = None
            col_ext_tables = {"advice": qi["advice"], "fixed": qi["fixed"],
                              "instance": qi["instance"]}
            for ci, (kind, col) in enumerate(perm_cols):
                v = col_ext_tables[kind][col]
                idt = F.mul(qi["x_ext"], delta_m[ci])
                nt = F.add(v, F.add(F.mul(be, idt), ga))
                dt_ = F.add(v, F.add(F.mul(be, qi["sigma"][ci]), ga))
                numx = nt if numx is None else F.mul(numx, nt)
                denx = dt_ if denx is None else F.mul(denx, dt_)
            add_constraint(
                F.mul(qi["lactive"],
                      F.sub(F.mul(z_w, denx), F.mul(z_ext, numx)))
            )

        for lk, lde in zip(cs.lookups, qi["lookups"]):
            a_ext = _compress(lk.inputs, th, ev_e, (n_ext, 32))
            s_ext = _compress(lk.tables, th, ev_e, (n_ext, 32))
            ap_ext, sp_ext, z_ext = lde["ap"], lde["sp"], lde["z"]
            z_w = jnp.roll(z_ext, -rot_scale, axis=0)
            ap_prev = jnp.roll(ap_ext, rot_scale, axis=0)
            add_constraint(F.mul(qi["l0"], F.sub(z_ext, one_s)))
            add_constraint(
                F.mul(qi["llast"], F.sub(F.mul(z_ext, z_ext), z_ext))
            )
            lhs = F.mul(z_w, F.mul(F.add(ap_ext, be), F.add(sp_ext, ga)))
            rhs = F.mul(z_ext, F.mul(F.add(a_ext, be), F.add(s_ext, ga)))
            add_constraint(F.mul(qi["lactive"], F.sub(lhs, rhs)))
            add_constraint(F.mul(qi["l0"], F.sub(ap_ext, sp_ext)))
            add_constraint(
                F.mul(
                    qi["lactive"],
                    F.mul(F.sub(ap_ext, sp_ext), F.sub(ap_ext, ap_prev)),
                )
            )

        for lg, lde in zip(cs.logups, qi["logups"]):
            a_exts = [
                _compress(tup, th, ev_e, (n_ext, 32)) for tup in lg.inputs
            ]
            t_ext = _compress(lg.table, th, ev_e, (n_ext, 32))
            h_exts = lde["hs"]
            ht_ext, m_ext, phi_ext = lde["ht"], lde["m"], lde["phi"]
            phi_w = jnp.roll(phi_ext, -rot_scale, axis=0)
            add_constraint(F.mul(qi["l0"], phi_ext))
            add_constraint(F.mul(qi["llast"], phi_ext))
            for h_ext_j, a_ext_j in zip(h_exts, a_exts):
                add_constraint(
                    F.mul(
                        qi["lactive"],
                        F.sub(F.mul(h_ext_j, F.add(a_ext_j, be)), one_s),
                    )
                )
            add_constraint(
                F.mul(
                    qi["lactive"],
                    F.sub(F.mul(ht_ext, F.add(t_ext, be)), m_ext),
                )
            )
            dsum = None
            for h_ext_j in h_exts:
                dsum = h_ext_j if dsum is None else F.add(dsum, h_ext_j)
            dsum = F.sub(dsum, ht_ext)
            add_constraint(
                F.mul(qi["lactive"], F.sub(F.sub(phi_w, phi_ext), dsum))
            )

        return F.mul(acc, qi["t_inv"])

    # ---- chunked quotient (single-device): rotations resolved OUTSIDE the
    # jit as wrapping row-window slices, so the compiled body is purely
    # elementwise over a FIXED chunk shape — XLA compiles one small kernel
    # reused for every chunk and every degree k, instead of one huge
    # n_ext-shaped graph per circuit+degree (the k=16 State quotient hit
    # XLA:CPU's "very slow compile" wall).  The y-fold order mirrors
    # _quotient_body exactly (the verifier recomputes it).
    def _quotient_chunked():
        CHUNK = min(n_ext, 1 << 15)
        nchunks = n_ext // CHUNK

        src = {
            "fixed": np.asarray(pk.fixed_ext),
            "advice": np.asarray(advice_ext),
            "instance": np.asarray(instance_ext),
        }
        queries = sorted(
            {
                (k_, c_, r_) for (k_, c_, r_) in cs.all_queries()
                if k_ in ("fixed", "advice", "instance")
            }
            | {(kind, col, 0) for (kind, col) in perm_cols}
        )
        # aux sources: (name, array, shift) — shift s means the body sees
        # rows [start+s, start+s+CHUNK) i.e. the jnp.roll(arr, -s) window
        aux_src: list[tuple[str, np.ndarray, int]] = [
            ("l0", np.asarray(pk.l0_ext), 0),
            ("llast", np.asarray(pk.llast_ext), 0),
            ("lactive", np.asarray(pk.lactive_ext), 0),
            ("x", np.asarray(pk.x_ext), 0),
            ("tinv", np.asarray(pk.t_inv_ext), 0),
        ]
        for ci in range(len(perm_cols)):
            aux_src.append((f"sigma{ci}", np.asarray(pk.sigma_ext[ci]), 0))
        if perm_cols:
            zp = np.asarray(qin["z_perm"])
            aux_src += [("zp", zp, 0), ("zp_w", zp, rot_scale)]
        for i, lde in enumerate(qin["lookups"]):
            ap, sp = np.asarray(lde["ap"]), np.asarray(lde["sp"])
            z = np.asarray(lde["z"])
            aux_src += [
                (f"lk{i}_ap", ap, 0), (f"lk{i}_ap_prev", ap, -rot_scale),
                (f"lk{i}_sp", sp, 0),
                (f"lk{i}_z", z, 0), (f"lk{i}_z_w", z, rot_scale),
            ]
        for i, lde in enumerate(qin["logups"]):
            for j, h in enumerate(lde["hs"]):
                aux_src.append((f"lg{i}_h{j}", np.asarray(h), 0))
            phi = np.asarray(lde["phi"])
            aux_src += [
                (f"lg{i}_ht", np.asarray(lde["ht"]), 0),
                (f"lg{i}_m", np.asarray(lde["m"]), 0),
                (f"lg{i}_phi", phi, 0), (f"lg{i}_phi_w", phi, rot_scale),
            ]
        scal = {
            "theta": qin["theta"], "beta": qin["beta"],
            "gamma": qin["gamma"], "y": qin["y"],
            "challenges": dict(challenges),
        }

        def _win(arr, shift, start):
            st = (start + shift) % n_ext
            if st + CHUNK <= n_ext:
                return arr[st : st + CHUNK]
            head = arr[st:]
            return np.concatenate([head, arr[: CHUNK - head.shape[0]]])

        from .expression import PreRolledEvaluator

        # constraint GROUPS, each its own small jit: XLA's optimization
        # passes are superlinear in graph size, so one giant fused body
        # hits the "very slow compile" wall at SuperCircuit/State scale;
        # ~50-poly kernels compile in seconds each and land in the
        # persistent cache.  Groups combine with acc = acc * y^|g| + g
        # (exactly the flat y-fold the verifier recomputes).
        GATE_BATCH = 48

        def _fold(yv, cvals_list):
            acc = None
            for cvals in cvals_list:
                if cvals.ndim == 1:
                    cvals = jnp.broadcast_to(cvals, (CHUNK, 32))
                acc = cvals if acc is None else F.add(F.mul(acc, yv), cvals)
            return acc

        def gates_group(polys):
            def body(qc, aux, sc):
                ev_e = PreRolledEvaluator(qc, sc["challenges"])
                return _fold(sc["y"], [ev_e.eval(p_) for p_ in polys])

            return body, len(polys)

        def perm_group():
            def body(qc, aux, sc):
                be, ga, yv = sc["beta"], sc["gamma"], sc["y"]
                one_s = F.ones_mont(())
                z_ext_c, z_w = aux["zp"], aux["zp_w"]
                cons = [
                    F.mul(aux["l0"], F.sub(z_ext_c, one_s)),
                    F.mul(aux["llast"],
                          F.sub(F.mul(z_ext_c, z_ext_c), z_ext_c)),
                ]
                numx = None
                denx = None
                for ci, (kind, col) in enumerate(perm_cols):
                    v = qc[(kind, col, 0)]
                    idt = F.mul(aux["x"], delta_m[ci])
                    nt = F.add(v, F.add(F.mul(be, idt), ga))
                    dt_ = F.add(v, F.add(F.mul(be, aux[f"sigma{ci}"]), ga))
                    numx = nt if numx is None else F.mul(numx, nt)
                    denx = dt_ if denx is None else F.mul(denx, dt_)
                cons.append(
                    F.mul(aux["lactive"],
                          F.sub(F.mul(z_w, denx), F.mul(z_ext_c, numx)))
                )
                return _fold(yv, cons)

            return body, 3

        def lookup_group(i, lk):
            def body(qc, aux, sc):
                th, be, ga, yv = (sc["theta"], sc["beta"], sc["gamma"],
                                  sc["y"])
                ev_e = PreRolledEvaluator(qc, sc["challenges"])
                one_s = F.ones_mont(())
                a_ext = _compress(lk.inputs, th, ev_e, (CHUNK, 32))
                s_ext = _compress(lk.tables, th, ev_e, (CHUNK, 32))
                ap_ext, sp_ext = aux[f"lk{i}_ap"], aux[f"lk{i}_sp"]
                z_ext_c, z_w = aux[f"lk{i}_z"], aux[f"lk{i}_z_w"]
                ap_prev = aux[f"lk{i}_ap_prev"]
                lhs = F.mul(z_w,
                            F.mul(F.add(ap_ext, be), F.add(sp_ext, ga)))
                rhs = F.mul(z_ext_c,
                            F.mul(F.add(a_ext, be), F.add(s_ext, ga)))
                cons = [
                    F.mul(aux["l0"], F.sub(z_ext_c, one_s)),
                    F.mul(aux["llast"],
                          F.sub(F.mul(z_ext_c, z_ext_c), z_ext_c)),
                    F.mul(aux["lactive"], F.sub(lhs, rhs)),
                    F.mul(aux["l0"], F.sub(ap_ext, sp_ext)),
                    F.mul(aux["lactive"],
                          F.mul(F.sub(ap_ext, sp_ext),
                                F.sub(ap_ext, ap_prev))),
                ]
                return _fold(yv, cons)

            return body, 5

        def logup_group(i, lg):
            def body(qc, aux, sc):
                th, be, yv = sc["theta"], sc["beta"], sc["y"]
                ev_e = PreRolledEvaluator(qc, sc["challenges"])
                one_s = F.ones_mont(())
                ht_ext, m_ext = aux[f"lg{i}_ht"], aux[f"lg{i}_m"]
                phi_ext, phi_w = aux[f"lg{i}_phi"], aux[f"lg{i}_phi_w"]
                cons = [
                    F.mul(aux["l0"], phi_ext),
                    F.mul(aux["llast"], phi_ext),
                ]
                for j, tup in enumerate(lg.inputs):
                    a_ext_j = _compress(tup, th, ev_e, (CHUNK, 32))
                    cons.append(
                        F.mul(aux["lactive"],
                              F.sub(F.mul(aux[f"lg{i}_h{j}"],
                                          F.add(a_ext_j, be)), one_s))
                    )
                t_ext = _compress(lg.table, th, ev_e, (CHUNK, 32))
                cons.append(
                    F.mul(aux["lactive"],
                          F.sub(F.mul(ht_ext, F.add(t_ext, be)), m_ext))
                )
                dsum = None
                for j in range(len(lg.inputs)):
                    h_j = aux[f"lg{i}_h{j}"]
                    dsum = h_j if dsum is None else F.add(dsum, h_j)
                dsum = F.sub(dsum, ht_ext)
                cons.append(
                    F.mul(aux["lactive"],
                          F.sub(F.sub(phi_w, phi_ext), dsum))
                )
                return _fold(yv, cons)

            return body, len(lg.inputs) + 4

        groups = []
        gate_polys = [p_ for g in cs.gates for p_ in g.polys]
        for s_ in range(0, len(gate_polys), GATE_BATCH):
            groups.append(gates_group(gate_polys[s_ : s_ + GATE_BATCH]))
        if perm_cols:
            groups.append(perm_group())
        for i, lk in enumerate(cs.lookups):
            groups.append(lookup_group(i, lk))
        for i, lg in enumerate(cs.logups):
            groups.append(logup_group(i, lg))
        compiled = [(jax.jit(fn), cnt) for fn, cnt in groups]
        # y as a host int for the group-combine powers
        yh = F.to_int(np.asarray(F.from_mont(np.asarray(qin["y"]))))

        @jax.jit
        def _combine(acc, contrib, yp):
            return F._add(F._mul(acc, yp), contrib)

        @jax.jit
        def _finish(acc, tinv):
            return F._mul(acc, tinv)

        import time as _time2

        _qtrace = _os.environ.get("ZKEVM_PROVE_TRACE") == "1"
        pieces = []
        for cidx in range(nchunks):
            _tc = _time2.perf_counter()
            start = cidx * CHUNK
            qc = {
                (k_, c_, r_): jnp.asarray(
                    _win(src[k_][c_], r_ * rot_scale, start)
                )
                for (k_, c_, r_) in queries
            }
            auxc = {
                name: jnp.asarray(_win(arr, shift, start))
                for name, arr, shift in aux_src
            }
            _ts = _time2.perf_counter()
            acc = None
            for gi, (fn, cnt) in enumerate(compiled):
                _tg = _time2.perf_counter()
                contrib = fn(qc, auxc, scal)
                if acc is None:
                    acc = contrib
                else:
                    yp = _mont_scalar(pow(yh, cnt, R))
                    acc = _combine(acc, contrib,
                                   jnp.broadcast_to(yp, (CHUNK, 32)))
                if _qtrace and cidx == 0:
                    contrib.block_until_ready()
                    dt = _time2.perf_counter() - _tg
                    if dt > 2.0:
                        print(f"[quotient] chunk0 group {gi}/"
                              f"{len(compiled)}: {dt:.1f}s", flush=True)
            pieces.append(np.asarray(_finish(acc, auxc["tinv"])))
            if _qtrace:
                print(f"[quotient] chunk {cidx + 1}/{nchunks}: slice "
                      f"{_ts - _tc:.1f}s eval "
                      f"{_time2.perf_counter() - _ts:.1f}s", flush=True)
        return jnp.asarray(np.concatenate(pieces, axis=0))

    def _quotient_native():
        """Serialize the whole y-folded constraint fold to a postfix
        program and evaluate it in C++ over the extended domain — the
        challenges are host scalars at this point, so the quotient is a
        fixed arithmetic circuit over columns + constants (the JAX digit
        mul is ~150x native Montgomery on XLA:CPU)."""
        from .quotient_native import (
            AUX_L0, AUX_LACTIVE, AUX_LLAST, AUX_SIGMA0, AUX_TINV, AUX_X,
            AUX_ZP, eval_quotient,
        )

        def setup(em):
            for i in range(pk.fixed_ext.shape[0]):
                em.register("fixed", i, pk.fixed_ext[i])
            adv_np = np.asarray(advice_ext)
            for i in range(adv_np.shape[0]):
                em.register("advice", i, adv_np[i])
            inst_np = np.asarray(instance_ext)
            for i in range(inst_np.shape[0]):
                em.register("instance", i, inst_np[i])
            em.register("aux", AUX_L0, pk.l0_ext)
            em.register("aux", AUX_LLAST, pk.llast_ext)
            em.register("aux", AUX_LACTIVE, pk.lactive_ext)
            em.register("aux", AUX_X, pk.x_ext)
            em.register("aux", AUX_TINV, pk.t_inv_ext)
            if perm_cols:
                em.register("aux", AUX_ZP, qin["z_perm"])
            for ci in range(len(perm_cols)):
                em.register("aux", AUX_SIGMA0 + ci, pk.sigma_ext[ci])
            base = AUX_SIGMA0 + len(perm_cols)
            for i, lde in enumerate(qin["lookups"]):
                em.register("aux", base + 3 * i, lde["ap"])
                em.register("aux", base + 3 * i + 1, lde["sp"])
                em.register("aux", base + 3 * i + 2, lde["z"])
            off = base + 3 * len(qin["lookups"])
            for i, lde in enumerate(qin["logups"]):
                nh = len(lde["hs"])
                for j, h in enumerate(lde["hs"]):
                    em.register("aux", off + j, h)
                em.register("aux", off + nh, lde["ht"])
                em.register("aux", off + nh + 1, lde["m"])
                em.register("aux", off + nh + 2, lde["phi"])
                off += nh + 3

        return jnp.asarray(eval_quotient(
            cs, setup, challenge_ints, theta, beta, gamma, y,
            pk.delta_pows, perm_cols, len(cs.lookups), len(cs.logups),
            rot_scale, n_ext,
        ))

    _mark("ext transforms")
    _use_native = False
    if mesh is None and jax.default_backend() == "cpu":
        from ..crypto import hostcore as _hc

        _use_native = _hc.available()
    if _use_native:
        h_ext = _quotient_native()
    elif mesh is not None:
        h_ext = jax.jit(_quotient_body)(qin)
        h_ext.block_until_ready()
    else:
        h_ext = _quotient_chunked()
    _mark("quotient jit")
    h_coeffs = coset_intt_ext(h_ext)
    n_pieces = n_ext // n
    h_pieces = [h_coeffs[i * n : (i + 1) * n] for i in range(n_pieces)]
    for piece in h_pieces:
        t.write_point(commit(piece))

    _mark("h commit")
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

    # gather every opening claim in transcript order, then batch-evaluate
    # per distinct point — one device pass per point instead of a per-query
    # Horner loop (VERDICT r2 W3)
    claims: list[tuple[object, int]] = []
    for c, r in adv_queries:
        claims.append((adv_polys[c], rot_point(r)))
    for c, r in fix_queries:
        claims.append((fix_polys[c], rot_point(r)))
    for ci in range(len(perm_cols)):
        claims.append((sig_polys[ci], x))
    if perm_cols:
        claims.append((z_perm_coeffs, x))
        claims.append((z_perm_coeffs, rot_point(1)))
    for ld in lookup_data:
        claims += [
            (ld["z_coeffs"], x),
            (ld["z_coeffs"], rot_point(1)),
            (ld["ap_coeffs"], x),
            (ld["ap_coeffs"], rot_point(-1)),
            (ld["sp_coeffs"], x),
        ]
    for ld in logup_data:
        claims += [(c, x) for c in ld["h_coeffs"]]
        claims += [
            (ld["h_t_coeffs"], x),
            (ld["m_coeffs"], x),
            (ld["phi_coeffs"], x),
            (ld["phi_coeffs"], rot_point(1)),
        ]

    # combined h poly: sum_i x^{n*i} h_i (evaluated but NOT written — the
    # verifier recomputes it from the gate/argument evals)
    h_comb = F.zeros((n,))
    xn = pow(x, n, R)
    for i, piece in enumerate(h_pieces):
        h_comb = F.add(h_comb, F.mul(piece, _mont_scalar(pow(xn, i, R))))
    h_claim_idx = len(claims)
    claims.append((h_comb, x))

    from ..poly.kzg import eval_batch

    by_point: dict[int, list[int]] = {}
    for qi, (_, pt) in enumerate(claims):
        by_point.setdefault(pt, []).append(qi)
    evals_out: list[int] = [0] * len(claims)
    for pt, idxs in by_point.items():
        stack = jnp.stack([jnp.asarray(claims[i][0]) for i in idxs])
        for i, v in zip(idxs, eval_batch(stack, pt)):
            evals_out[i] = v

    queries: list[Query] = []
    for qi, (poly, pt) in enumerate(claims):
        if qi != h_claim_idx:
            t.write_scalar(evals_out[qi])
        queries.append(Query(poly, pt, evals_out[qi], None))

    from ..poly.kzg import shplonk_open

    _mark("evaluations")
    shplonk_open(srs, queries, t)
    _mark("shplonk open")
    return bytes(t.proof)
