"""MPT circuit tests: zktrie updates -> Merkle-path proofs via Poseidon table."""

import numpy as np
import pytest

from zkevm_circuits_tpu.circuits.mpt import MptCircuit, MptParams
from zkevm_circuits_tpu.crypto.field import fr
from zkevm_circuits_tpu.plonk.mock import MockProver
from zkevm_circuits_tpu.witness.mpt import MptUpdates

F = fr()
K = 7


def _updates():
    ups = MptUpdates()
    # pre-state (applied without witness): keys 0b00 and 0b10 share bit 0,
    # so the right child of the root branch stays empty
    ups.trie.update(0b00, 5)
    ups.trie.update(0b10, 6)
    ups.write(0b00, 55)  # value update, depth 2
    ups.write(1, 77)  # insert into the empty slot, depth 1
    ups.write(1, 88)  # update the freshly inserted key
    return ups


def test_mpt_updates_witness():
    ups = _updates()
    assert [u.depth for u in ups.updates] == [2, 1, 1]
    assert ups.updates[1].was_empty and not ups.updates[2].was_empty
    assert ups.updates[0].old_value == 5 and ups.updates[0].new_value == 55
    # roots chain across updates
    for a, b in zip(ups.updates, ups.updates[1:]):
        assert a.new_root == b.old_root
    assert ups.trie.root() == ups.updates[-1].new_root


def test_mpt_leaf_split_witness():
    ups = MptUpdates()
    ups.write(0b00, 1)
    u = ups.write(0b10, 2)  # splits the root leaf
    assert u.is_split and u.was_empty
    assert u.split_key == 0b00 and u.split_value == 1
    assert u.depth > u.split_old_depth
    assert u.split_old_depth == 0  # the whole old tree was one leaf
    MockProver(K, MptCircuit(ups.updates)).assert_satisfied()


def test_mpt_leaf_split_circuit():
    ups = MptUpdates()
    # force a DEEP split: keys share two low bits
    ups.write(0b0100, 9)
    u = ups.write(0b0000, 3)  # shares bits 00, diverges at bit 2
    assert u.is_split and u.split_old_depth < u.depth
    ups.write(0b0000, 4)  # update after the split
    MockProver(K, MptCircuit(ups.updates)).assert_satisfied()


def test_mpt_leaf_split_circuit_catches_wrong_displaced_leaf():
    ups = MptUpdates()
    ups.write(0b0100, 9)
    ups.write(0b0000, 3)

    class Corrupt(MptCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                # claim a different displaced-leaf value on the split row
                arr = np.array(cols[self.c_v1])
                for i in range(arr.shape[0]):
                    v = F.to_int(np.asarray(F.from_mont(arr[i])))
                    if v == 9:
                        arr[i] = F.from_int(8 * F.R % F.modulus)
                cols[self.c_v1] = arr
            return cols

    failures = MockProver(K, Corrupt(ups.updates)).verify()
    assert failures


def test_mpt_circuit_satisfied():
    ups = _updates()
    MockProver(K, MptCircuit(ups.updates)).assert_satisfied()
    # padded variant
    MockProver(
        K, MptCircuit(ups.updates, MptParams(target_rows=20))
    ).assert_satisfied()


def test_mpt_circuit_catches_wrong_root():
    ups = _updates()

    class Corrupt(MptCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_new_root])
                bad = F.to_int(np.asarray(F.from_mont(arr[0]))) + 1
                for i in range(3):  # all rows of update 0's block
                    arr[i] = F.from_int(bad % F.modulus * F.R % F.modulus)
                cols[self.c_new_root] = arr
            return cols

    failures = MockProver(K, Corrupt(ups.updates)).verify()
    assert any("mpt new root" in f for f in failures), failures


def test_mpt_circuit_catches_tampered_sibling():
    ups = _updates()

    class Corrupt(MptCircuit):
        def synthesize(self, phase, n, challenges, instances):
            cols = super().synthesize(phase, n, challenges, instances)
            if phase == 0:
                arr = np.array(cols[self.c_sib])
                arr[1] = F.from_int(0xBAD * F.R % F.modulus)
                cols[self.c_sib] = arr
            return cols

    failures = MockProver(K, Corrupt(ups.updates)).verify()
    assert failures
