"""Keccak-f permutation circuit tests (k=11: one permutation = 1600 rows)."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.keccak import KeccakFCircuit, ROWS_PER_PERM
from zkevm_circuits_tpu.crypto.keccak import keccak_f
from zkevm_circuits_tpu.plonk.mock import MockProver

K = 11


def _rand_state(rng):
    return [[int(rng.integers(0, 1 << 63)) * 2 + int(rng.integers(0, 2))
             for _ in range(5)] for _ in range(5)]


def test_keccak_f_circuit_satisfied(rng):
    st = _rand_state(rng)
    circ = KeccakFCircuit([st])
    MockProver(K, circ).assert_satisfied()
    # the witnessed final state must equal the reference permutation
    assert circ._final_states[0] == keccak_f(st)


def test_keccak_f_zero_state():
    circ = KeccakFCircuit([[[0] * 5 for _ in range(5)]])
    MockProver(K, circ).assert_satisfied()
    assert circ._final_states[0][0][0] == 0xF1258F7940E1DDE7


def test_keccak_f_catches_bit_flip(rng):
    st = _rand_state(rng)

    class Corrupt(KeccakFCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            from zkevm_circuits_tpu.crypto.field import fr
            F = fr()
            # flip one state bit in round block 5, lane (2,3), z=17
            col = self.c_a[2][3]
            arr = np.array(cols[col])
            row = 5 * 64 + 17
            cur = int(np.any(arr[row]))
            arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
            cols[col] = arr
            return cols

    failures = MockProver(K, Corrupt([st])).verify()
    assert failures
