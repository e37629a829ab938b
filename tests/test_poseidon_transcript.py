"""Poseidon transcript: prove/verify roundtrip on the k=5 demo circuit.

The recursion path (reference prover/src/common/prover/utils.rs:24 hashes
with Poseidon via snark-verifier-sdk) needs a transcript the
CompressionCircuit can re-derive with in-circuit Poseidon rows.
"""

import numpy as np

from test_plonk_prove import A_IN, DemoCircuit, K

from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.prover import prove
from zkevm_circuits_tpu.plonk.verifier import verify
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.poly.transcript import (
    PoseidonReader, PoseidonSponge, PoseidonTranscript,
)


def test_sponge_consecutive_squeezes_differ():
    sp = PoseidonSponge()
    sp.absorb(7)
    a = sp.squeeze()
    b = sp.squeeze()
    assert a != b
    # absorb order matters
    s1, s2 = PoseidonSponge(), PoseidonSponge()
    s1.absorb(1, 2)
    s2.absorb(2, 1)
    assert s1.squeeze() != s2.squeeze()


def test_prove_verify_poseidon_roundtrip():
    srs = Srs.unsafe_setup(K, tau=987654321)
    pk, vk = keygen(DemoCircuit(), K, srs)
    proof = prove(
        pk, DemoCircuit(), [[A_IN]], srs,
        transcript=PoseidonTranscript(),
        rng=np.random.default_rng(1),
    )
    assert verify(vk, [[A_IN]], proof, transcript=PoseidonReader(proof))
    # a Blake2b verification of a Poseidon proof must fail (challenges
    # diverge) — the transcripts are not interchangeable
    assert not verify(vk, [[A_IN]], proof)
    # wrong instance fails under the right reader too
    assert not verify(vk, [[A_IN + 1]], proof,
                      transcript=PoseidonReader(proof))
