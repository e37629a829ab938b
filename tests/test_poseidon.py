"""Poseidon host hash + circuit tests."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.poseidon import (
    ROWS_PER_BLOCK, PoseidonCircuit, PoseidonEvent,
)
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.crypto.params import FR_MODULUS as P
from zkevm_circuits_tpu.crypto.poseidon import (
    hash2, hash_msg, permute, permute_batch, round_states, spec,
)
from zkevm_circuits_tpu.plonk.mock import MockProver

F = fr()
K = 9  # 512 rows -> 7 blocks


def test_grain_params_deterministic_and_in_field():
    sp = spec()
    sp2 = spec()
    assert sp.rc == sp2.rc and sp.mds == sp2.mds
    assert len(sp.rc) == 65 and all(len(r) == 3 for r in sp.rc)
    assert all(0 <= c < P for row in sp.rc for c in row)
    # MDS invertible (Cauchy) and all entries nonzero
    assert all(0 < m < P for row in sp.mds for m in row)
    # permutation is a bijection sanity: different inputs -> different out
    assert permute([0, 1, 2]) != permute([0, 1, 3])


def test_hashes():
    h = hash2(123, 456)
    assert 0 < h < P
    assert h != hash2(456, 123)
    m = hash_msg([1, 2, 3])
    assert 0 < m < P
    assert m != hash_msg([1, 2, 3, 0])  # length domain separates


def test_batch_permute_matches_host():
    rng = np.random.default_rng(5)
    vals = [[int.from_bytes(rng.bytes(31), "little") for _ in range(3)]
            for _ in range(4)]
    states = np.stack([
        F.from_ints([v * F.R % P for v in row]) for row in vals
    ])
    out = np.asarray(permute_batch(states))
    got = [[x * pow(F.R, P - 2, P) % P for x in F.to_ints(out[i])]
           for i in range(4)]
    want = [permute(row) for row in vals]
    assert got == want


def test_poseidon_circuit_satisfied():
    events = [
        PoseidonEvent(domain=0, in0=123, in1=456),
        PoseidonEvent(domain=2 << 64, in0=7, in1=8),
    ]
    MockProver(K, PoseidonCircuit(events)).assert_satisfied()


def test_poseidon_circuit_catches_wrong_state():
    events = [PoseidonEvent(domain=0, in0=1, in1=2)]

    class Corrupt(PoseidonCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_s[0]])
                # tamper the final state (the claimed hash output)
                arr[65] = F.from_int(99 * F.R % P)
                cols[self.c_s[0]] = arr
            return cols

    failures = MockProver(K, Corrupt(events)).verify()
    assert any("poseidon" in f for f in failures), failures


def test_poseidon_circuit_table_binds_inputs():
    events = [PoseidonEvent(domain=0, in0=1, in1=2)]

    class Corrupt(PoseidonCircuit):
        """Claim different inputs in the carry columns: anchors must fail."""

        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_in0])
                arr[:ROWS_PER_BLOCK] = F.from_int(42 * F.R % P)
                cols[self.c_in0] = arr
            return cols

    failures = MockProver(K, Corrupt(events)).verify()
    assert any("anchor" in f for f in failures), failures
