"""Layer-1 recursion: CompressionCircuit verifies an inner PLONK proof.

Covers VERDICT.md round-1 Missing §1 first step (reference
aggregator/src/compression/circuit.rs:39): the inner proof's FULL scalar
verification — Poseidon Fiat-Shamir replay, challenges, quotient
identity, SHPLONK multiopen reductions — runs in-circuit; the deferred
elliptic claim (MSM + pairing) is exposed as the public instance and
checked by finish_deferred.
"""

import numpy as np
import pytest

from test_plonk_prove import A_IN, DemoCircuit, K

from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.plonk.prover import prove
from zkevm_circuits_tpu.plonk.verifier import verify
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.poly.transcript import PoseidonReader, PoseidonTranscript
from zkevm_circuits_tpu.recursion.compression import (
    CompressionCircuit, finish_deferred,
)


@pytest.fixture(scope="module")
def inner():
    srs = Srs.unsafe_setup(K, tau=987654321)
    pk, vk = keygen(DemoCircuit(), K, srs)
    proof = prove(pk, DemoCircuit(), [[A_IN]], srs,
                  transcript=PoseidonTranscript(),
                  rng=np.random.default_rng(3))
    assert verify(vk, [[A_IN]], proof, transcript=PoseidonReader(proof))
    return srs, pk, vk, proof


def test_compression_mock_and_deferred(inner):
    srs, pk, vk, proof = inner
    comp = CompressionCircuit(vk, proof, [[A_IN]])
    kc = comp.min_k()
    insts = comp.instances()
    MockProver(kc, comp, insts).assert_satisfied()
    assert finish_deferred(vk, comp.claim, insts[0]), (
        "deferred MSM + pairing must accept an honest inner proof"
    )


def test_compression_rejects_bad_inner_proof(inner):
    srs, pk, vk, proof = inner
    bad = bytearray(proof)
    bad[7] ^= 1  # corrupt an advice commitment coordinate
    comp = CompressionCircuit(vk, bytes(bad), [[A_IN]])
    # the tape still computes faithfully (the circuit proves the scalar
    # verification OF THE CLAIMED proof) — rejection comes from the
    # deferred elliptic check
    assert not finish_deferred(vk, comp.claim, comp.instances()[0])


def test_compression_instance_tamper_rejected(inner):
    srs, pk, vk, proof = inner
    comp = CompressionCircuit(vk, proof, [[A_IN]])
    insts = comp.instances()
    tampered = [list(insts[0])]
    tampered[0][-1] = (tampered[0][-1] + 1) % (2**64)  # u
    failures = MockProver(comp.min_k(), comp, tampered).verify()
    assert failures, "tampered exposed challenge must break a copy"


def test_compression_real_prove(inner):
    """The actual compression: the scalar verification of the inner proof
    is itself PROVEN (and verified) as a PLONK proof."""
    srs, pk, vk, proof = inner
    comp = CompressionCircuit(vk, proof, [[A_IN]])
    kc = comp.min_k()
    srs_c = Srs.unsafe_setup(kc, tau=777)
    pk_c, vk_c = keygen(comp, kc, srs_c)
    insts = comp.instances()
    cproof = prove(pk_c, comp, insts, srs_c, rng=np.random.default_rng(4))
    assert verify(vk_c, insts, cproof)
    assert finish_deferred(vk, comp.claim, insts[0])
