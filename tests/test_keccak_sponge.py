"""Keccak sponge circuit tests: absorb chaining + KeccakTable RLCs (k=10)."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.keccak import KeccakCircuit
from zkevm_circuits_tpu.crypto.keccak import keccak256
from zkevm_circuits_tpu.plonk.mock import MockProver, mock_challenges
from zkevm_circuits_tpu.plonk.circuit import ConstraintSystem
from zkevm_circuits_tpu.crypto.field import fr

K = 10
F = fr()


def test_sponge_multiblock():
    msg = b"x" * 200  # 2-block message: exercises absorb chaining
    circ = KeccakCircuit([msg])
    mp = MockProver(K, circ)
    mp.assert_satisfied()
    # the witnessed output RLC must encode the true keccak256 digest
    ch = mock_challenges(mp.cs)[circ.r.index]
    r_int = F.to_int(np.asarray(F.from_mont(np.asarray(ch))))
    out_col = np.asarray(mp.advice[circ.c_out_rlc])
    first, count = circ._msg_perm_spans[0]
    assert count == 2
    row = (first + count - 1) * circ.rows_per_perm + 24 * circ.rpb
    got = F.to_int(np.asarray(F.from_mont(out_col[row])))
    want = sum(
        b * pow(r_int, i, F.modulus) for i, b in enumerate(keccak256(msg))
    ) % F.modulus
    assert got == want


def test_sponge_catches_corrupt_chain():
    class Corrupt(KeccakCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                # flip a data bit in the SECOND absorb block of msg 0
                # (lane 0, z = 8*3 -> plane 0, block-0 row 3 of perm 1)
                col = self.c_d[0][0]
                arr = np.array(cols[col])
                row = self.rows_per_perm + 3
                cur = int(arr[row].any())
                arr[row] = F.from_int((1 - cur) * F.R % F.modulus)
                cols[col] = arr
            return cols

    failures = MockProver(K, Corrupt([b"y" * 150])).verify()
    assert failures
