"""Aggregation layer: folded claim verification, chunk/batch hashes,
and the layered service pipeline (inner -> compression -> batch fold).

Covers the reference's accumulator folding + ChunkHash/BatchHash
(aggregator/src/{aggregation/circuit.rs,chunk.rs,batch.rs}) and the
prover crate's layer pipeline (prover/src/config.rs:36-48).
"""

import numpy as np
import pytest

from test_plonk_prove import A_IN, DemoCircuit, K

from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.prover import prove
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.poly.transcript import PoseidonTranscript
from zkevm_circuits_tpu.recursion.aggregation import (
    BatchHash, ChunkHash, fold_and_verify_claims,
)
from zkevm_circuits_tpu.recursion.compression import CompressionCircuit
from zkevm_circuits_tpu.service.prover import LayerProver, BatchProver, Proof


@pytest.fixture(scope="module")
def inner():
    srs = Srs.unsafe_setup(K, tau=987654321)
    pk, vk = keygen(DemoCircuit(), K, srs)
    proofs = [
        prove(pk, DemoCircuit(), [[A_IN]], srs,
              transcript=PoseidonTranscript(),
              rng=np.random.default_rng(seed))
        for seed in (10, 11, 12)
    ]
    return srs, pk, vk, proofs


def test_fold_many_claims(inner):
    srs, pk, vk, proofs = inner
    items = []
    for p in proofs:
        comp = CompressionCircuit(vk, p, [[A_IN]])
        items.append((vk, comp.claim, comp.instances()[0]))
    assert fold_and_verify_claims(items)


def test_fold_rejects_one_bad_claim(inner):
    srs, pk, vk, proofs = inner
    items = []
    for i, p in enumerate(proofs):
        if i == 1:
            bad = bytearray(p)
            bad[3] ^= 0x40
            p = bytes(bad)
        comp = CompressionCircuit(vk, p, [[A_IN]])
        items.append((vk, comp.claim, comp.instances()[0]))
    assert not fold_and_verify_claims(items)


def test_chunk_batch_hashes():
    c1 = ChunkHash(chain_id=1, prev_state_root=0xAA, post_state_root=0xBB,
                   withdraw_root=0, data_hash=0x11)
    c2 = ChunkHash(chain_id=1, prev_state_root=0xBB, post_state_root=0xCC,
                   withdraw_root=0, data_hash=0x22)
    b = BatchHash([c1, c2])
    assert b.pi_hash() != c1.pi_hash()
    with pytest.raises(AssertionError):
        BatchHash([c1, c1])  # state roots do not chain


def test_layer_pipeline(tmp_path, inner):
    """inner proof -> layer1 compression proof (real, cached) -> batch."""
    srs, pk, vk, proofs = inner
    lp = LayerProver(str(tmp_path / "params"), str(tmp_path / "out"))
    inner_proof = Proof(proof=proofs[0], instances=[[A_IN]], k=K)
    cproof, comp = lp.gen_compression_proof(vk, inner_proof)
    assert lp.verify_compression_proof(f"layer1_k{cproof.k}", cproof)
    # load-or-gen: second call must hit the proof cache
    cproof2, _ = lp.gen_compression_proof(vk, inner_proof)
    assert cproof2.proof == cproof.proof
    ch = ChunkHash(chain_id=1, prev_state_root=1, post_state_root=2,
                   withdraw_root=0, data_hash=3)
    out = BatchProver().gen_batch(
        [(vk, comp.claim, comp.instances()[0])], [ch]
    )
    assert out["n_chunks"] == 1 and out["batch_pi_hash"].startswith("0x")
