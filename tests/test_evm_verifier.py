"""Standalone verifier artifact (the reference's EVM verifier analogue).

gen_verifier_artifact emits a stdlib-only .py hard-wired to one vk
(reference prover/src/common/prover/evm.rs gen_evm_verifier); evm_verify
runs it in a clean subprocess with no repo on the path.  The artifact
must accept the real proof and reject corrupted proofs / wrong instances.
"""

import os

import numpy as np
import pytest

from test_plonk_prove import A_IN, DemoCircuit, K

from zkevm_circuits_tpu.plonk.keygen import keygen
from zkevm_circuits_tpu.plonk.prover import prove
from zkevm_circuits_tpu.poly.kzg import Srs
from zkevm_circuits_tpu.recursion.evm_verifier import (
    evm_verify, gen_verifier_artifact,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    srs = Srs.unsafe_setup(K, tau=24680)
    pk, vk = keygen(DemoCircuit(), K, srs)
    proof = prove(pk, DemoCircuit(), [[A_IN]], srs,
                  rng=np.random.default_rng(5))
    path = str(tmp_path_factory.mktemp("artifact") / "verifier_demo.py")
    gen_verifier_artifact(vk, path)
    return path, proof


def test_artifact_verifies(artifact):
    path, proof = artifact
    assert os.path.getsize(path) > 10_000  # self-contained, not a stub
    src = open(path).read()
    # stdlib-only: no repo (or any non-stdlib) imports in the code
    import re

    mods = set(re.findall(r"^(?:import|from)\s+([\w.]+)", src, re.M))
    assert mods <= {"hashlib", "json", "sys"}, mods
    assert evm_verify(path, [[A_IN]], proof)


def test_artifact_rejects_corruption(artifact):
    path, proof = artifact
    bad = bytearray(proof)
    bad[len(bad) // 3] ^= 1
    assert not evm_verify(path, [[A_IN]], bytes(bad))


def test_artifact_rejects_wrong_instance(artifact):
    path, proof = artifact
    assert not evm_verify(path, [[A_IN + 1]], proof)
