"""In-circuit KZG-accumulator aggregation (AggregationFoldCircuit).

Covers VERDICT.md round-2 Missing §1/§2 fold step (reference
aggregator/src/aggregation/circuit.rs:40 KZG accumulation): M
accumulator pairs fold with in-circuit Poseidon randomness and two
EcMsm walks; the verifier keeps ONE pairing.
"""

import numpy as np
import pytest

from zkevm_circuits_tpu.crypto.curve import host_g1_mul
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R, G1_GEN
from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.recursion.fold import (
    AggregationFoldCircuit, verify_fold,
)

TAU = 0xFADE0FF


def _valid_pairs(m: int):
    """(lhs, w2) with lhs = tau*w2 — exactly the pairs the KZG identity
    e(w2, [tau]_2) = e(lhs, [1]_2) accepts (testable via the unsafe SRS
    trapdoor)."""
    srs = Srs.unsafe_setup(4, tau=TAU)
    pairs = []
    for i in range(m):
        b = 0x1234 + 7 * i
        w2 = host_g1_mul(G1_GEN, b)
        lhs = host_g1_mul(G1_GEN, b * TAU % R)
        pairs.append((lhs, w2))
    return srs, pairs


class _VK:
    def __init__(self, srs):
        self.s_g2 = srs.s_g2
        self.g2 = srs.g2


def test_fold_statement_holds():
    srs, pairs = _valid_pairs(3)
    circ = AggregationFoldCircuit(pairs)
    assert verify_fold(_VK(srs), circ.instances()[0], 3)


def test_fold_rejects_one_bad_pair():
    srs, pairs = _valid_pairs(3)
    bad = list(pairs)
    bad[1] = (host_g1_mul(G1_GEN, 999), bad[1][1])  # lhs != tau*w2
    circ = AggregationFoldCircuit(bad)
    assert not verify_fold(_VK(srs), circ.instances()[0], 3)


@pytest.mark.slow
def test_fold_mock_satisfied():
    srs, pairs = _valid_pairs(2)
    circ = AggregationFoldCircuit(pairs)
    kk = circ.min_k()
    MockProver(kk, circ, circ.instances()).assert_satisfied()


@pytest.mark.slow
def test_fold_mock_catches_wrong_challenge_power():
    """Claiming a different c^1 must break either the tape mul chain or
    the scalar glue into the walk."""
    from zkevm_circuits_tpu.crypto.field import fr

    F = fr()
    srs, pairs = _valid_pairs(2)

    class Corrupt(AggregationFoldCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                # bend the glue's claimed scalar halves for term 1 of
                # program 0 (rows are [p0t0, p0t1, p1t0, p1t1])
                arr = np.asarray(cols[self.g_lo]).copy()
                v = int(F.to_int(F.from_mont(arr[1])))
                arr[1] = F.from_int((v + 1) % R * F.R % R)
                cols[self.g_lo] = arr
            return cols

    circ = Corrupt(pairs)
    failures = MockProver(circ.min_k(), circ, circ.instances()).verify()
    assert failures, "bent fold scalar must fail"


@pytest.mark.slow
def test_fold_mock_instance_tamper_rejected():
    srs, pairs = _valid_pairs(2)
    circ = AggregationFoldCircuit(pairs)
    vals = [list(circ.instances()[0])]
    vals[0][3] = (vals[0][3] + 1) % (1 << 128)  # bend an input limb
    failures = MockProver(circ.min_k(), circ, vals).verify()
    assert failures, "tampered accumulator limb must fail"


@pytest.mark.slow
def test_batch_in_circuit_end_to_end():
    """Two demo chunks -> layer-1 circuits (in-circuit EC) -> PROVEN
    in-circuit fold -> one pairing (reference gen_agg_evm_proof shape,
    prover/src/aggregator/prover.rs:69)."""
    import sys

    sys.path.insert(0, "tests")
    from test_plonk_prove import A_IN, DemoCircuit, K

    from zkevm_circuits_tpu.plonk.prover import prove as plonk_prove
    from zkevm_circuits_tpu.poly.transcript import PoseidonTranscript
    from zkevm_circuits_tpu.recursion.aggregation import ChunkHash
    from zkevm_circuits_tpu.recursion.layer import CompressionLayerCircuit
    from zkevm_circuits_tpu.service.prover import BatchProver, LayerProver

    srs = Srs.unsafe_setup(K, tau=987654321)
    pk, vk = keygen(DemoCircuit(), K, srs)
    items = []
    for seed in (3, 5):
        proof = plonk_prove(pk, DemoCircuit(), [[A_IN]], srs,
                            transcript=PoseidonTranscript(),
                            rng=np.random.default_rng(seed))
        layer = CompressionLayerCircuit(vk, proof, [[A_IN]])
        items.append((layer.claim, layer.instances()[0]))
    hashes = [
        ChunkHash(chain_id=1337,
                  prev_state_root=int.from_bytes(b"\x01" * 32, "big"),
                  post_state_root=int.from_bytes(b"\x02" * 32, "big"),
                  withdraw_root=int.from_bytes(b"\x03" * 32, "big"),
                  data_hash=int.from_bytes(bytes([i]) * 32, "big"))
        for i in (7, 8)
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        layers = LayerProver(params_dir=d)
        rec = BatchProver().gen_batch_in_circuit(layers, items, hashes, vk)
    assert rec["n_chunks"] == 2
    assert len(rec["folded_acc"]) == 8
    assert rec["fold_proof"].proof


def test_batch_in_circuit_glue(monkeypatch, tmp_path):
    """Service glue for the in-circuit fold, with proving mocked (the
    real-prove path is the slow e2e test above)."""
    import zkevm_circuits_tpu.service.prover as sp
    from zkevm_circuits_tpu.recursion.aggregation import ChunkHash
    from zkevm_circuits_tpu.recursion.fold import AggregationFoldCircuit

    srs, pairs = _valid_pairs(2)

    # fabricate layer items whose accumulators are the valid pairs
    class FakeClaim:
        n_inner_instance = 0
        w2_ref = ("p", 0)

    items = []
    for lhs, w2 in pairs:
        vals = [w2[0] & ((1 << 128) - 1), w2[0] >> 128,
                w2[1] & ((1 << 128) - 1), w2[1] >> 128,
                lhs[0] & ((1 << 128) - 1), lhs[0] >> 128,
                lhs[1] & ((1 << 128) - 1), lhs[1] >> 128]
        items.append((FakeClaim(), vals))

    monkeypatch.setattr(sp, "keygen", lambda c, k, s: ("pk", "vk"))
    monkeypatch.setattr(sp, "prove", lambda *a, **k: b"fold-proof")
    import zkevm_circuits_tpu.plonk.verifier as pv

    monkeypatch.setattr(pv, "verify", lambda *a, **k: True)
    hashes = [ChunkHash(
        chain_id=1,
        prev_state_root=int.from_bytes(b"\x01" * 32, "big"),
        post_state_root=int.from_bytes(b"\x02" * 32, "big"),
        withdraw_root=int.from_bytes(b"\x03" * 32, "big"),
        data_hash=int.from_bytes(b"\x04" * 32, "big"),
    )]
    layers = sp.LayerProver(params_dir=str(tmp_path))
    monkeypatch.setattr(layers, "srs", lambda k: srs)
    rec = sp.BatchProver().gen_batch_in_circuit(
        layers, items, hashes, _VK(srs)
    )
    assert rec["fold_proof"].proof == b"fold-proof"
    assert len(rec["folded_acc"]) == 8
