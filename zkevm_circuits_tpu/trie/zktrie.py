"""Sparse Poseidon-Merkle trie (zktrie) — ctypes binding + Python fallback.

Equivalent of the reference's `zktrie` wrapper crate over Scroll's Go
zktrie library (reference zktrie/src/state.rs:16-156, SURVEY.md §2.1 item
9 and §2.3 item 3): the Poseidon-hashed sparse binary Merkle trie holding
account/storage state, producing the MPT update witness.

Two interchangeable backends with IDENTICAL hashing (cross-checked by
tests/test_zktrie.py):
  * native/zktrie.cc via ctypes (built by `make -C native`; Poseidon
    constants are generated from crypto/poseidon.py at build time), and
  * a pure-Python implementation here (used when the .so is absent).

Scheme (documented in zktrie.cc): empty = 0; leaf = H_1(key, value);
branch = H_2(left, right) where H_d = permute([d, a, b])[0]; path bits are
the little-endian bits of the key field element; the trie is compressed
(leaves sit at the first divergence depth).
"""

from __future__ import annotations

import ctypes
import dataclasses
import os

from ..crypto.params import FR_MODULUS as P
from ..crypto.poseidon import permute

DOM_LEAF = 1
DOM_BRANCH = 2
MAX_DEPTH = 256


def hash2_domain(domain: int, a: int, b: int) -> int:
    return permute([domain, a, b])[0]


# ---------------------------------------------------------------------------
# native binding
# ---------------------------------------------------------------------------
_native = None
_path = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "libzkevm_native.so"
)
try:  # pragma: no cover - depends on build state
    _lib = ctypes.CDLL(os.path.abspath(_path))
    _lib.zkevm_trie_new.restype = ctypes.c_void_p
    _lib.zkevm_trie_free.argtypes = [ctypes.c_void_p]
    _lib.zkevm_trie_update.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p
    ]
    _lib.zkevm_trie_root.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    _lib.zkevm_trie_prove.restype = ctypes.c_int
    _lib.zkevm_trie_prove.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_char_p,
    ]
    _native = _lib
except OSError:
    _native = None


def _b32(x: int) -> bytes:
    return int(x).to_bytes(32, "little")


@dataclasses.dataclass
class Proof:
    """Merkle path for `key` from the root: `siblings` top-down, plus the
    terminal leaf (absent => non-inclusion at an empty slot)."""

    key: int
    depth: int
    siblings: list[int]
    found: bool
    leaf_key: int
    leaf_value: int


class _PyNode:
    __slots__ = ("kind", "key", "value", "left", "right")

    def __init__(self):
        self.kind = 0  # 0 empty, 1 leaf, 2 branch
        self.key = 0
        self.value = 0
        self.left = None
        self.right = None

    def hash(self) -> int:
        if self.kind == 0:
            return 0
        if self.kind == 1:
            return hash2_domain(DOM_LEAF, self.key, self.value)
        l = self.left.hash() if self.left else 0
        r = self.right.hash() if self.right else 0
        return hash2_domain(DOM_BRANCH, l, r)


class ZkTrie:
    """update(key, value) / root() / prove(key) over int field elements."""

    def __init__(self, use_native: bool | None = None):
        self._use_native = (
            _native is not None if use_native is None else use_native
        )
        if self._use_native:
            assert _native is not None, "native library not built"
            self._h = _native.zkevm_trie_new()
        else:
            self._root = _PyNode()

    def __del__(self):
        if getattr(self, "_use_native", False) and _native is not None:
            _native.zkevm_trie_free(self._h)

    # ------------------------------------------------------------------
    def update(self, key: int, value: int):
        key %= P
        value %= P
        if self._use_native:
            _native.zkevm_trie_update(self._h, _b32(key), _b32(value))
            return
        self._insert(self._root, key, value, 0)

    def _insert(self, node: _PyNode, key: int, value: int, depth: int):
        if node.kind == 0:
            node.kind = 1
            node.key, node.value = key, value
            return
        if node.kind == 1:
            if node.key == key:
                node.value = value
                return
            old = _PyNode()
            old.kind, old.key, old.value = 1, node.key, node.value
            node.kind = 2
            node.left, node.right = _PyNode(), _PyNode()
            if (old.key >> depth) & 1:
                node.right = old
            else:
                node.left = old
            if node.left is None:
                node.left = _PyNode()
            if node.right is None:
                node.right = _PyNode()
            nxt = node.right if (key >> depth) & 1 else node.left
            self._insert(nxt, key, value, depth + 1)
            return
        nxt = node.right if (key >> depth) & 1 else node.left
        self._insert(nxt, key, value, depth + 1)

    def root(self) -> int:
        if self._use_native:
            out = ctypes.create_string_buffer(32)
            _native.zkevm_trie_root(self._h, out)
            return int.from_bytes(out.raw, "little")
        return self._root.hash()

    def prove(self, key: int) -> Proof:
        key %= P
        if self._use_native:
            sib = ctypes.create_string_buffer(32 * MAX_DEPTH)
            found = ctypes.c_int(0)
            lk = ctypes.create_string_buffer(32)
            lv = ctypes.create_string_buffer(32)
            d = _native.zkevm_trie_prove(
                self._h, _b32(key), MAX_DEPTH, sib, ctypes.byref(found), lk, lv
            )
            sibs = [
                int.from_bytes(sib.raw[32 * i : 32 * i + 32], "little")
                for i in range(d)
            ]
            return Proof(
                key=key, depth=d, siblings=sibs, found=bool(found.value),
                leaf_key=int.from_bytes(lk.raw, "little"),
                leaf_value=int.from_bytes(lv.raw, "little"),
            )
        node, d, sibs = self._root, 0, []
        while node.kind == 2 and d < MAX_DEPTH:
            if (key >> d) & 1:
                sibs.append(node.left.hash() if node.left else 0)
                node = node.right
            else:
                sibs.append(node.right.hash() if node.right else 0)
                node = node.left
            d += 1
        if node.kind == 1:
            return Proof(key, d, sibs, True, node.key, node.value)
        return Proof(key, d, sibs, False, 0, 0)


def verify_proof(root: int, proof: Proof) -> bool:
    """Recompute the root from the proof.  Inclusion: leaf_key must equal
    the queried key; non-inclusion: empty slot or a DIFFERENT leaf whose
    path prefix collides (proves the queried key is absent)."""
    if proof.found:
        acc = hash2_domain(DOM_LEAF, proof.leaf_key, proof.leaf_value)
    else:
        acc = 0
    for d in reversed(range(proof.depth)):
        sib = proof.siblings[d]
        if (proof.key >> d) & 1:
            acc = hash2_domain(DOM_BRANCH, sib, acc)
        else:
            acc = hash2_domain(DOM_BRANCH, acc, sib)
    return acc == root
