// Native keccak256 for witness generation.
//
// The reference runs its hashing-heavy witness paths in native code (the
// keccak256 crate + rayon-parallel multi_keccak, SURVEY.md §2.1 items 7/8);
// this is the TPU build's host-side equivalent: a batch keccak256 with a
// C ABI consumed through ctypes (crypto/keccak.py picks it up when built).
//
// Build:  make -C native   (produces libzkevm_native.so)

#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t kRc[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

constexpr int kRotc[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                           25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

inline uint64_t rotl(uint64_t v, int s) {
  return s == 0 ? v : (v << s) | (v >> (64 - s));
}

// state indexed a[x + 5y]
void keccak_f(uint64_t a[25]) {
  uint64_t b[25], c[5], d[5];
  for (int rnd = 0; rnd < 24; ++rnd) {
    for (int x = 0; x < 5; ++x)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) a[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(a[x + 5 * y], kRotc[x + 5 * y]);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        a[x + 5 * y] =
            b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    a[0] ^= kRc[rnd];
  }
}

constexpr size_t kRate = 136;

void keccak256_one(const uint8_t* data, size_t len, uint8_t out[32]) {
  uint64_t st[25];
  std::memset(st, 0, sizeof(st));
  uint8_t block[kRate];
  size_t off = 0;
  while (true) {
    size_t take = len - off < kRate ? len - off : kRate;
    std::memcpy(block, data + off, take);
    bool last = take < kRate;
    if (last) {
      std::memset(block + take, 0, kRate - take);
      block[take] |= 0x01;
      block[kRate - 1] |= 0x80;
    }
    for (size_t i = 0; i < kRate / 8; ++i) {
      uint64_t lane;
      std::memcpy(&lane, block + 8 * i, 8);
      st[i] ^= lane;  // lane index i -> (x=i%5, y=i/5) == x+5y
    }
    keccak_f(st);
    off += kRate;
    if (last) break;
  }
  std::memcpy(out, st, 32);
}

}  // namespace

extern "C" {

// one-shot
void zkevm_keccak256(const uint8_t* data, uint64_t len, uint8_t out[32]) {
  keccak256_one(data, len, out);
}

// batch: n inputs, flattened `data` with offsets[n+1]; out = n*32 bytes
void zkevm_keccak256_batch(const uint8_t* data, const uint64_t* offsets,
                           uint64_t n, uint8_t* out) {
  for (uint64_t i = 0; i < n; ++i) {
    keccak256_one(data + offsets[i], offsets[i + 1] - offsets[i],
                  out + 32 * i);
  }
}
}
