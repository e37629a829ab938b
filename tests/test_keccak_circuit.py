"""Keccak-f permutation circuit tests.

Default packed layout (Z=8, 200 rows/perm, k=9 fits one permutation) +
differential check against the Z=1 bit-per-row oracle layout."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.keccak import KeccakFCircuit
from zkevm_circuits_tpu.crypto.keccak import keccak_f
from zkevm_circuits_tpu.plonk.mock import MockProver

K = 9


def _rand_state(rng):
    return [[int(rng.integers(0, 1 << 63)) * 2 + int(rng.integers(0, 2))
             for _ in range(5)] for _ in range(5)]


def test_keccak_f_circuit_satisfied(rng):
    st = _rand_state(rng)
    circ = KeccakFCircuit([st])
    assert circ.rows_per_perm == 200  # packed: beats the reference's 288
    MockProver(K, circ).assert_satisfied()
    # the witnessed final state must equal the reference permutation
    assert circ._final_states[0] == keccak_f(st)


def test_keccak_f_zero_state():
    circ = KeccakFCircuit([[[0] * 5 for _ in range(5)]])
    MockProver(K, circ).assert_satisfied()
    assert circ._final_states[0][0][0] == 0xF1258F7940E1DDE7


@pytest.mark.parametrize("z", [1, 2, 4])
def test_keccak_f_other_packings(rng, z):
    """Z=1 is the round-1..4 bit-per-row oracle layout; all packings must
    accept the same witness relation."""
    st = _rand_state(rng)
    circ = KeccakFCircuit([st], z_per_row=z)
    MockProver(12 if z == 1 else 11, circ).assert_satisfied()
    assert circ._final_states[0] == keccak_f(st)


def test_keccak_f_catches_bit_flip(rng):
    st = _rand_state(rng)

    class Corrupt(KeccakFCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            from zkevm_circuits_tpu.crypto.field import fr
            F = fr()
            # flip one state bit in round block 5, lane (2,3), z=17
            z = 17
            col = self.c_a[2][3][z % self.z]
            arr = np.array(cols[col])
            row = 5 * self.rpb + z // self.z
            cur = int(np.any(arr[row]))
            arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
            cols[col] = arr
            return cols

    failures = MockProver(K, Corrupt([st])).verify()
    assert failures
