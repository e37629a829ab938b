"""Service-layer tests: ChunkProver artifact caching, Proof serialization,
capacity checking, and variadic-size real proofs.

Covers VERDICT.md round-1 item 8 (reference prover/src/zkevm/prover.rs:42
load-or-gen behavior; integration-tests/src/integration_test_circuits.rs
:291-309 variadic-size soundness).
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.circuit import Circuit, ConstraintSystem
from zkevm_circuits_tpu.plonk.expression import Advice, Fixed
from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.prover import prove
from zkevm_circuits_tpu.plonk.verifier import verify
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.service.prover import (
    ChunkProver, CircuitCapacityChecker, Proof,
)
from zkevm_circuits_tpu.tracer import Account, Interpreter, StateDB, Tx
from zkevm_circuits_tpu.types import Bytecode
from zkevm_circuits_tpu.witness.builder import CircuitInputBuilder

F = fr()
K = 5


def test_proof_json_roundtrip():
    p = Proof(proof=b"\x01\x02\xff" * 11, instances=[[5, R - 1], []], k=13)
    q = Proof.from_json(p.to_json())
    assert q.proof == p.proof and q.instances == p.instances and q.k == p.k


def test_chunk_prover_load_or_gen(tmp_path, monkeypatch):
    """gen_chunk_proof memoizes by witness digest: the second call for the
    same witness must be a cache HIT (prove not invoked again), a
    different witness a MISS (reference load_or_gen_* file memoization)."""
    calls = []

    import zkevm_circuits_tpu.service.prover as sp

    def fake_prove(pk, circuit, instances, srs, **kw):
        calls.append(1)
        return b"proof-bytes"

    monkeypatch.setattr(sp, "prove", fake_prove)
    monkeypatch.setattr(
        ChunkProver, "keys", lambda self, c: (None, None)
    )
    monkeypatch.setattr(ChunkProver, "srs", lambda self: None)

    cp = ChunkProver(str(tmp_path / "params"), str(tmp_path / "out"), k=9)

    def witness(push_val):
        code = Bytecode().push(1, push_val).op("POP").op("STOP")
        st = StateDB({0xA: Account(balance=10**15),
                      0xB: Account(code=code.to_bytes())})
        tr = Interpreter(st).run_tx(Tx(from_addr=0xA, to=0xB))
        b = CircuitInputBuilder()
        b.handle_tx(dict(from_addr=0xA, to_addr=0xB, value=0, calldata=b""),
                    tr)
        return b, [code]

    b1, bcs1 = witness(7)
    p1 = cp.gen_chunk_proof(b1, bcs1, txs=[])
    assert len(calls) == 1 and p1.proof == b"proof-bytes"
    p2 = cp.gen_chunk_proof(b1, bcs1, txs=[])
    assert len(calls) == 1, "second identical call must hit the file cache"
    assert p2.proof == p1.proof
    b3, bcs3 = witness(9)
    cp.gen_chunk_proof(b3, bcs3, txs=[])
    assert len(calls) == 2, "different witness must re-prove"


def test_capacity_checker_estimates():
    code = Bytecode().push(1, 1).push(1, 2).op("ADD").op("POP").op("STOP")
    st = StateDB({0xA: Account(balance=10**15),
                  0xB: Account(code=code.to_bytes())})
    tr = Interpreter(st).run_tx(Tx(from_addr=0xA, to=0xB))
    b = CircuitInputBuilder()
    b.handle_tx(dict(from_addr=0xA, to_addr=0xB, value=0, calldata=b""), tr)
    from zkevm_circuits_tpu.circuits.super_circuit import SuperParams

    cc = CircuitCapacityChecker(SuperParams(), k=13)
    usage = cc.estimate(b, [code])
    assert usage["evm"] >= len(b.steps)
    assert usage["state"] >= len(b.rws.rws)
    assert all(v >= 0 for v in usage.values())


# ---------------------------------------------------------------------------
# variadic-size soundness: same circuit/vk, two witness sizes, both REAL
# proofs verify (reference test_variadic, integration_test_circuits.rs:291)
# ---------------------------------------------------------------------------
class VariadicAdd(Circuit):
    """q = 1 on every usable row; unused rows pad with a = b = c = 0
    (satisfying), so the witness size is free under one vk."""

    def __init__(self, n_rows: int):
        self.n_rows = n_rows

    def configure(self, cs: ConstraintSystem):
        self.q = cs.fixed_column()
        self.tbl = cs.fixed_column()
        self.a = cs.advice_column()
        self.b = cs.advice_column()
        self.c = cs.advice_column()
        cs.create_gate(
            "add", Fixed(self.q) * (Advice(self.a) + Advice(self.b)
                                    - Advice(self.c))
        )
        cs.lookup("rng16", [(Advice(self.b), Fixed(self.tbl))])

    def fixed_columns(self, n):
        mont = lambda vals: F.from_ints([v % R * F.R % R for v in vals])
        from zkevm_circuits_tpu.plonk.circuit import usable_rows

        u = usable_rows(n)
        return np.stack([
            mont([1 if i < u else 0 for i in range(n)]),
            mont([i if i < 16 else 0 for i in range(n)]),
        ])

    def copy_constraints(self, n):
        return []

    def synthesize(self, phase, n, challenges, instances):
        mont = lambda vals: F.from_ints(
            [v % R * F.R % R for v in vals] + [0] * (n - len(vals))
        )
        a = [3 * i + 1 for i in range(self.n_rows)]
        b = [i % 16 for i in range(self.n_rows)]
        c = [(x + y) % R for x, y in zip(a, b)]
        return {self.a: mont(a), self.b: mont(b), self.c: mont(c)}


def test_variadic_sizes_one_vk():
    srs = Srs.unsafe_setup(K, tau=424242)
    pk, vk = keygen(VariadicAdd(4), K, srs)
    proofs = []
    for n_rows in (4, 20):
        proof = prove(pk, VariadicAdd(n_rows), [], srs,
                      rng=np.random.default_rng(n_rows))
        assert verify(vk, [], proof), f"n_rows={n_rows} proof must verify"
        proofs.append(proof)
    # the two proofs are different objects but verify under the SAME vk —
    # padding/dynamic-row logic does not change the statement
    assert proofs[0] != proofs[1]
