// Native sparse Poseidon-Merkle trie (zktrie) for MPT witness generation.
//
// Equivalent of the reference's Go zktrie library consumed over CGO
// (reference zktrie/Cargo.toml:12, `init_hash_scheme` C callback at
// zktrie/src/state/builder.rs:16; SURVEY.md §2.3 item 3): a sparse binary
// Merkle trie over BN254 Fr with Poseidon(t=3) node hashing, supporting
// update / root / merkle-proof generation through a C ABI (ctypes binding
// in zkevm_circuits_tpu/trie/zktrie.py, which carries a bit-identical
// pure-Python fallback).
//
// Hash scheme (self-consistent with the Python side):
//   empty subtree            -> 0
//   leaf   (key, value)      -> permute([DOM_LEAF,   key, value])[0]
//   branch (left, right)     -> permute([DOM_BRANCH, left, right])[0]
// Path bits: little-endian bits of the key field element; depth grows
// only to the first divergence (compressed SMT, like Scroll's zktrie).
//
// Build: make -C native (generates poseidon_params.h from the Python spec
// so C++ and Python hash identically).

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <vector>

#include "poseidon_params.h"

namespace {

// ---------------------------------------------------------------------------
// BN254 Fr Montgomery arithmetic, 4 x u64 limbs, R = 2^256
// ---------------------------------------------------------------------------
using u64 = uint64_t;
using u128 = unsigned __int128;

struct Fr {
  u64 v[4];
};

constexpr u64 kQ[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                       0xb85045b68181585dULL, 0x30644e72e131a029ULL};
// -q^{-1} mod 2^64
constexpr u64 kQInv = 0xc2e1f593efffffffULL;
// R^2 mod q (for to_mont)
constexpr u64 kR2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                        0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};

inline bool ge_q(const u64 a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > kQ[i]) return true;
    if (a[i] < kQ[i]) return false;
  }
  return true;  // equal
}

inline void sub_q(u64 a[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - kQ[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

inline Fr add(const Fr& a, const Fr& b) {
  Fr r;
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || ge_q(r.v)) sub_q(r.v);
  return r;
}

// CIOS Montgomery multiplication
inline Fr mul(const Fr& a, const Fr& b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (u64)s;
    t[5] = (u64)(s >> 64);
    u64 m = t[0] * kQInv;
    carry = ((u128)t[0] + (u128)m * kQ[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * kQ[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[4] + carry;
    t[3] = (u64)s;
    t[4] = t[5] + (u64)(s >> 64);
    t[5] = 0;
  }
  Fr r;
  std::memcpy(r.v, t, 32);
  if (t[4] || ge_q(r.v)) sub_q(r.v);
  return r;
}

inline Fr to_mont(const Fr& a) {
  Fr r2;
  std::memcpy(r2.v, kR2, 32);
  return mul(a, r2);
}

inline Fr from_mont(const Fr& a) {
  Fr one = {{1, 0, 0, 0}};
  return mul(a, one);
}

inline Fr from_bytes(const uint8_t b[32]) {  // little-endian canonical
  Fr r;
  for (int i = 0; i < 4; ++i) {
    u64 w = 0;
    for (int j = 7; j >= 0; --j) w = (w << 8) | b[8 * i + j];
    r.v[i] = w;
  }
  return to_mont(r);
}

inline void to_bytes(const Fr& a, uint8_t out[32]) {
  Fr c = from_mont(a);
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 8; ++j) out[8 * i + j] = (uint8_t)(c.v[i] >> (8 * j));
}

inline bool eq(const Fr& a, const Fr& b) {
  return std::memcmp(a.v, b.v, 32) == 0;
}

constexpr Fr kZero = {{0, 0, 0, 0}};

// ---------------------------------------------------------------------------
// Poseidon t=3 (constants generated from the Python spec, Montgomery form)
// ---------------------------------------------------------------------------
inline Fr pow5(const Fr& x) {
  Fr s = mul(x, x);
  return mul(mul(s, s), x);
}

void permute(Fr s[3]) {
  for (int r = 0; r < kRounds; ++r) {
    for (int i = 0; i < 3; ++i) {
      Fr rc;
      std::memcpy(rc.v, kRC[r][i], 32);
      s[i] = add(s[i], rc);
    }
    bool full = r < kHalfFull || r >= kRounds - kHalfFull;
    s[0] = pow5(s[0]);
    if (full) {
      s[1] = pow5(s[1]);
      s[2] = pow5(s[2]);
    }
    Fr out[3];
    for (int i = 0; i < 3; ++i) {
      out[i] = kZero;
      for (int j = 0; j < 3; ++j) {
        Fr m;
        std::memcpy(m.v, kMDS[i][j], 32);
        out[i] = add(out[i], mul(m, s[j]));
      }
    }
    std::memcpy(s, out, sizeof(out));
  }
}

// domain-tagged 2-to-1 hash: permute([domain, a, b])[0]
Fr hash2(u64 domain, const Fr& a, const Fr& b) {
  Fr d = {{domain, 0, 0, 0}};
  Fr s[3] = {to_mont(d), a, b};
  permute(s);
  return s[0];
}

constexpr u64 kDomLeaf = 1;
constexpr u64 kDomBranch = 2;

// ---------------------------------------------------------------------------
// compressed sparse Merkle trie
// ---------------------------------------------------------------------------
struct Node {
  enum Kind { kEmpty, kLeaf, kBranch } kind = kEmpty;
  Fr key{}, value{};                     // leaf
  std::unique_ptr<Node> left, right;     // branch
  Fr hash{};
  bool dirty = true;

  Fr rehash() {
    if (!dirty) return hash;
    switch (kind) {
      case kEmpty:
        hash = kZero;
        break;
      case kLeaf:
        hash = hash2(kDomLeaf, key, value);
        break;
      case kBranch: {
        Fr l = left ? left->rehash() : kZero;
        Fr r = right ? right->rehash() : kZero;
        hash = hash2(kDomBranch, l, r);
        break;
      }
    }
    dirty = false;
    return hash;
  }
};

inline int key_bit(const Fr& key_canon, int depth) {
  return (key_canon.v[depth / 64] >> (depth % 64)) & 1;
}

struct Trie {
  std::unique_ptr<Node> root = std::make_unique<Node>();

  // canonical (non-Montgomery) key bits drive the path
  void update(const Fr& key_m, const Fr& key_canon, const Fr& value_m) {
    insert(root, key_m, key_canon, value_m, 0);
  }

  void insert(std::unique_ptr<Node>& node, const Fr& key_m,
              const Fr& key_c, const Fr& val, int depth) {
    node->dirty = true;
    if (node->kind == Node::kEmpty) {
      node->kind = Node::kLeaf;
      node->key = key_m;
      node->value = val;
      return;
    }
    if (node->kind == Node::kLeaf) {
      if (eq(node->key, key_m)) {
        node->value = val;
        return;
      }
      // split: push the existing leaf down
      auto old = std::make_unique<Node>();
      old->kind = Node::kLeaf;
      old->key = node->key;
      old->value = node->value;
      Fr old_canon = from_mont(old->key);
      node->kind = Node::kBranch;
      node->left = std::make_unique<Node>();
      node->right = std::make_unique<Node>();
      int ob = key_bit(old_canon, depth);
      (ob ? node->right : node->left) = std::move(old);
      if (!node->left) node->left = std::make_unique<Node>();
      if (!node->right) node->right = std::make_unique<Node>();
      insert(key_bit(key_c, depth) ? node->right : node->left,
             key_m, key_c, val, depth + 1);
      return;
    }
    insert(key_bit(key_c, depth) ? node->right : node->left,
           key_m, key_c, val, depth + 1);
  }

  // proof: siblings root->down; returns depth; fills leaf info
  int prove(const Fr& key_c, Fr* siblings, int max_depth, int* found,
            Fr* leaf_key, Fr* leaf_value) {
    root->rehash();
    Node* n = root.get();
    int d = 0;
    while (n->kind == Node::kBranch && d < max_depth) {
      Node* l = n->left.get();
      Node* r = n->right.get();
      if (key_bit(key_c, d)) {
        siblings[d] = l ? l->rehash() : kZero;
        n = r;
      } else {
        siblings[d] = r ? r->rehash() : kZero;
        n = l;
      }
      ++d;
    }
    if (n->kind == Node::kLeaf) {
      *found = 1;
      *leaf_key = n->key;
      *leaf_value = n->value;
    } else {
      *found = 0;
      *leaf_key = kZero;
      *leaf_value = kZero;
    }
    return d;
  }
};

}  // namespace

extern "C" {

void* zkevm_trie_new() { return new Trie(); }

void zkevm_trie_free(void* h) { delete static_cast<Trie*>(h); }

void zkevm_trie_update(void* h, const uint8_t key[32], const uint8_t value[32]) {
  Fr key_m = from_bytes(key);
  Fr key_c = from_mont(key_m);
  static_cast<Trie*>(h)->update(key_m, key_c, from_bytes(value));
}

void zkevm_trie_root(void* h, uint8_t out[32]) {
  to_bytes(static_cast<Trie*>(h)->root->rehash(), out);
}

// out_siblings: caller buffer of max_depth*32 bytes. Returns proof depth.
int zkevm_trie_prove(void* h, const uint8_t key[32], int max_depth,
                     uint8_t* out_siblings, int* out_found,
                     uint8_t out_leaf_key[32], uint8_t out_leaf_value[32]) {
  std::vector<Fr> sib(max_depth);
  Fr key_m = from_bytes(key);
  Fr key_c = from_mont(key_m);
  Fr lk, lv;
  int found = 0;
  int d = static_cast<Trie*>(h)->prove(key_c, sib.data(), max_depth, &found,
                                       &lk, &lv);
  for (int i = 0; i < d; ++i) to_bytes(sib[i], out_siblings + 32 * i);
  *out_found = found;
  to_bytes(lk, out_leaf_key);
  to_bytes(lv, out_leaf_value);
  return d;
}

// exposed for cross-checking against the Python poseidon
void zkevm_poseidon_hash2(uint64_t domain, const uint8_t a[32],
                          const uint8_t b[32], uint8_t out[32]) {
  to_bytes(hash2(domain, from_bytes(a), from_bytes(b)), out);
}

}  // extern "C"
