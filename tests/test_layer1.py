"""Layer-1 recursion with the EC side IN-CIRCUIT.

Covers VERDICT.md round-2 Missing §1 (reference
aggregator/src/compression/circuit.rs:39 + snark-verifier's halo2-ecc
loader): the CompressionLayerCircuit composes the scalar-verification
tape, the Poseidon transcript circuit, the MulMod circuit, and an
EcMsmCircuit program computing the deferred claim's LHS point — leaving
the verifier exactly ONE pairing (`verify_layer1`).
"""

import numpy as np
import pytest

from test_plonk_prove import A_IN, DemoCircuit, K

from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.plonk.prover import prove
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.poly.transcript import PoseidonTranscript
from zkevm_circuits_tpu.recursion.layer import (
    CompressionLayerCircuit, verify_layer1,
)


@pytest.fixture(scope="module")
def inner():
    srs = Srs.unsafe_setup(K, tau=987654321)
    pk, vk = keygen(DemoCircuit(), K, srs)
    proof = prove(pk, DemoCircuit(), [[A_IN]], srs,
                  transcript=PoseidonTranscript(),
                  rng=np.random.default_rng(3))
    return srs, pk, vk, proof


def test_layer1_statement_holds(inner):
    """The in-circuit MSM program's result satisfies the final pairing —
    the whole KZG verification collapses to verify_layer1's one check."""
    srs, pk, vk, proof = inner
    layer = CompressionLayerCircuit(vk, proof, [[A_IN]])
    assert verify_layer1(vk, layer.claim, layer.instances()[0])
    # structurally-zero commitments were dropped AND zero-pinned
    assert len(layer._zero_limb_positions) % 4 == 0


def test_layer1_rejects_bad_inner_proof(inner):
    srs, pk, vk, proof = inner
    bad = bytearray(proof)
    bad[7] ^= 1  # corrupt an advice commitment coordinate
    # a corrupted proof yields an off-curve witnessed point: the honest
    # witness generator refuses (the walk's on-curve check), and any
    # prover that forged around it would fail verify_layer1's pairing
    try:
        layer = CompressionLayerCircuit(vk, bytes(bad), [[A_IN]])
    except AssertionError:
        return
    assert not verify_layer1(vk, layer.claim, layer.instances()[0])


def test_layer1_tampered_accumulator_rejected(inner):
    srs, pk, vk, proof = inner
    layer = CompressionLayerCircuit(vk, proof, [[A_IN]])
    vals = list(layer.instances()[0])
    vals[-1] = (vals[-1] + 1) % (1 << 128)  # bend the exposed LHS point
    assert not verify_layer1(vk, layer.claim, vals)


@pytest.mark.slow
def test_layer1_mock_satisfied(inner):
    """Full MockProver pass of the composed layer circuit (k=17, ~15 min
    on one CPU core — the k-scale evidence for the recursion path)."""
    srs, pk, vk, proof = inner
    layer = CompressionLayerCircuit(vk, proof, [[A_IN]])
    kk = layer.min_k()
    MockProver(kk, layer, layer.instances()).assert_satisfied()


@pytest.mark.slow
def test_layer1_mock_catches_msm_forgery(inner):
    """Bending one walk-accumulator limb must break the EcMsm chain."""
    from zkevm_circuits_tpu.crypto.field import fr
    from zkevm_circuits_tpu.crypto.params import FR_MODULUS as R

    F = fr()
    srs, pk, vk, proof = inner

    class Corrupt(CompressionLayerCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                lo_col = self.ecmsm.pairs["f1_rx"][0]
                arr = np.asarray(cols[lo_col]).copy()
                row = self.prog.rows - 1
                v = int(F.to_int(F.from_mont(arr[row])))
                arr[row] = F.from_int((v + 1) % R * F.R % R)
                cols[lo_col] = arr
            return cols

    layer = Corrupt(vk, proof, [[A_IN]])
    failures = MockProver(layer.min_k(), layer, layer.instances()).verify()
    assert failures, "forged MSM result must fail"
