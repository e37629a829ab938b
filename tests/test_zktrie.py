"""zktrie tests: native C++ vs pure-Python equality + proof verification."""

import os

import pytest

from zkevm_circuits_tpu.crypto.params import FR_MODULUS as P
from zkevm_circuits_tpu.trie.zktrie import ZkTrie, _native, verify_proof

KEYS = [5, 6, 7, 2**200 + 1, 2**200 + 2, P - 1, 0]
VALS = [100 + i for i in range(len(KEYS))]

needs_native = pytest.mark.skipif(
    _native is None, reason="native library not built"
)


def _fill(trie):
    for k, v in zip(KEYS, VALS):
        trie.update(k, v)
    return trie


def test_python_trie_roots_and_proofs():
    t = _fill(ZkTrie(use_native=False))
    root = t.root()
    assert root != 0
    for k, v in zip(KEYS, VALS):
        pr = t.prove(k)
        assert pr.found and pr.leaf_key == k and pr.leaf_value == v
        assert verify_proof(root, pr)
    # non-inclusion
    pr = t.prove(123456789)
    assert not (pr.found and pr.leaf_key == 123456789)
    assert verify_proof(root, pr)
    # update changes the root, overwrite works
    t.update(5, 999)
    root2 = t.root()
    assert root2 != root
    pr = t.prove(5)
    assert pr.leaf_value == 999 and verify_proof(root2, pr)


@needs_native
def test_native_matches_python():
    tp = _fill(ZkTrie(use_native=False))
    tn = _fill(ZkTrie(use_native=True))
    assert tp.root() == tn.root()
    for k in KEYS + [987654321]:
        pp, pn = tp.prove(k), tn.prove(k)
        assert (pp.depth, pp.siblings, pp.found, pp.leaf_key, pp.leaf_value) \
            == (pn.depth, pn.siblings, pn.found, pn.leaf_key, pn.leaf_value)
        assert verify_proof(tn.root(), pn)
    tn.update(7, 2**250)
    tp.update(7, 2**250)
    assert tp.root() == tn.root()


@needs_native
def test_native_empty_and_single():
    tn = ZkTrie(use_native=True)
    assert tn.root() == 0
    tn.update(42, 7)
    pr = tn.prove(42)
    assert pr.depth == 0 and pr.found
    assert verify_proof(tn.root(), pr)
