"""Per-circuit prove benchmarks at reference degrees.

TPU-native analogue of the reference's `circuit-benchmarks` crate
(reference circuit-benchmarks/src/state_circuit.rs, evm_circuit.rs:39-120:
`DEGREE=18 make state_bench` / `evm_bench` time keygen -> prove(SHPLONK)
-> verify with ark-std timers; SURVEY.md §6 pins State/EVM at DEGREE=18).

`state_prove_bench(k)` builds a synthetic-but-constraint-complete RW
workload that fills the usable rows of 2^k (memory write/read pairs over
several call frames plus stack traffic — every lexicographic-ordering,
range-decomposition and tag-rule path of the State circuit is exercised),
then runs the real pipeline: keygen (SRS, fixed commits, coset tables),
prove (full SHPLONK proof), verify.  Returns per-phase wall-clock.
"""

from __future__ import annotations

import time

import numpy as np

from ..circuits.state import StateCircuit, StateParams
from ..plonk.keygen import keygen
from ..plonk.prover import prove
from ..plonk.verifier import verify
from ..poly.kzg import Srs
from ..witness.rw import Rw, RwTag


def synthetic_rw_workload(n_rows: int) -> list[Rw]:
    """`n_rows` RW rows shaped like real execution traffic: per call frame
    a burst of memory writes, re-reads, and stack push/pops.  Rows carry
    distinct (tag, id, address) groups so the lexicographic-ordering
    first-diff logic runs across all limb positions."""
    rows: list[Rw] = []
    ctr = 1
    call_id = 1
    addr = 0
    while len(rows) < n_rows:
        burst = min(64, n_rows - len(rows))
        half = burst // 2
        for j in range(half):
            rows.append(Rw(
                rw_counter=ctr, is_write=True, tag=RwTag.Memory,
                id=call_id, address=addr + j, value=(j * 37 + call_id) & 0xFF,
            ))
            ctr += 1
        for j in range(burst - half):
            jj = min(j, half - 1) if half else 0
            rows.append(Rw(
                rw_counter=ctr, is_write=False, tag=RwTag.Memory,
                id=call_id, address=addr + jj,
                value=(jj * 37 + call_id) & 0xFF if half else 0,
            ))
            ctr += 1
        call_id += 1
        addr += 1 << 12
    # state circuit sorts by (tag, id, address, ..., rw_counter)
    rows.sort(key=lambda r: (
        int(r.tag), r.id, r.address, int(r.field_tag), r.storage_key,
        r.rw_counter,
    ))
    return rows[:n_rows]


def state_prove_bench(k: int = 18, payload_rows: int | None = None,
                      tau: int = 0xB_E2C4) -> dict:
    """keygen + prove + verify the State circuit at degree `k`.

    Returns {"k", "rows", "keygen_s", "witness_rows", "prove_s",
    "verify_s", "ok"} — the reference's DEGREE=18 state_bench analogue."""
    from ..plonk.circuit import usable_rows

    n = 1 << k
    t = usable_rows(n) - 8
    payload = payload_rows if payload_rows is not None else t
    payload = min(payload, t)
    rows = synthetic_rw_workload(payload)

    def _mark(msg):
        # phase progress (r4 lesson: the k=18 run was opaque for hours)
        print(f"[state_bench k={k}] {msg}", flush=True)

    _mark(f"witness rows built: {len(rows)}")
    t0 = time.perf_counter()
    srs = Srs.unsafe_setup(k, tau=tau)
    srs_s = time.perf_counter() - t0
    _mark(f"srs: {srs_s:.1f}s")

    circuit = StateCircuit(rows, StateParams())
    t0 = time.perf_counter()
    pk, vk = keygen(circuit, k, srs)
    keygen_s = time.perf_counter() - t0
    _mark(f"keygen: {keygen_s:.1f}s")

    t0 = time.perf_counter()
    proof = prove(pk, circuit, [], srs,
                  rng=np.random.default_rng(7))
    prove_s = time.perf_counter() - t0
    _mark(f"prove: {prove_s:.1f}s")

    t0 = time.perf_counter()
    ok = verify(vk, [], proof)
    verify_s = time.perf_counter() - t0
    _mark(f"verify: {verify_s:.1f}s ok={ok}")
    return {
        "k": k, "rows": payload, "srs_s": round(srs_s, 2),
        "keygen_s": round(keygen_s, 2), "prove_s": round(prove_s, 2),
        "verify_s": round(verify_s, 2), "ok": bool(ok),
        "proof_bytes": len(proof),
    }
