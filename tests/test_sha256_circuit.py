"""SHA256 circuit tests: bit-plane compression rounds -> mock prove."""

import hashlib

import numpy as np

from zkevm_circuits_tpu.circuits.sha256 import Sha256Circuit
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.sha256 import pad, sha256_trace
from zkevm_circuits_tpu.plonk.mock import MockProver

F = fr()
K = 9

MSGS = [b"abc", b"", bytes(range(100))]  # 1, 1, 2 blocks


def test_trace_matches_hashlib():
    for m in MSGS:
        trs = sha256_trace(m)  # asserts digest == hashlib internally
        assert len(trs) == len(pad(m)) // 64


def test_sha256_circuit_satisfied():
    MockProver(K, Sha256Circuit(MSGS)).assert_satisfied()


def test_sha256_circuit_catches_flipped_schedule_bit():
    class Corrupt(Sha256Circuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_w[5]])
                row = 4 + 20  # a t>=16 schedule row of message 0
                cur = int(np.asarray(F.from_mont(arr[row]))[0] != 0)
                arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
                cols[self.c_w[5]] = arr
            return cols

    failures = MockProver(K, Corrupt([b"abc"])).verify()
    assert any("sha" in f for f in failures), failures


def test_sha256_circuit_catches_wrong_digest():
    class Corrupt(Sha256Circuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_a[0]])
                row = 71  # H'_0 word, last digest row
                cur = int(np.asarray(F.from_mont(arr[row]))[0] != 0)
                arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
                cols[self.c_a[0]] = arr
            return cols

    failures = MockProver(K, Corrupt([b"abc"])).verify()
    assert any("sha digest" in f or "sha" in f for f in failures), failures


def test_sha256_circuit_catches_broken_chain():
    """Two-block message: tamper the second block's init -> chain gate."""

    class Corrupt(Sha256Circuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_e[7]])
                row = 72 + 2  # block 1 init row
                cur = int(np.asarray(F.from_mont(arr[row]))[0] != 0)
                arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
                cols[self.c_e[7]] = arr
            return cols

    failures = MockProver(K, Corrupt([bytes(range(100))])).verify()
    assert any("chain" in f or "sha" in f for f in failures), failures
