// zkstark_native — host-side native runtime for the TPU STARK framework.
//
// The reference gets this layer from Rust (winterfell's blake3/f128 host
// code, `Cargo.toml:11`); here it is a single C++ translation unit exposed
// through a plain C ABI and loaded via ctypes (no pybind11 in the image).
//
// Contents:
//   * BLAKE3-256 (plain hashing mode) — compression, chunk chaining, the
//     left-heavy spec tree; used for the Fiat–Shamir transcript
//     (`prover/channel.py`) and Merkle path verification
//     (`verifier/verify.py`).  Bit-exact vs `ops/blake3_ref.py`.
//   * Merkle helpers — batched leaf hashing, level merging, path verify.
//   * f128 field ops on unsigned __int128 (modulus 2^128 - 45*2^40 + 1) —
//     array add/sub/mul/inv, MiMC-e7 cipher/sponge (`src/helper.rs:213-233`
//     semantics).  Bit-exact vs `ops/f128_ref.py`.
//
// Everything is deterministic, thread-free, and allocation-free (callers
// pass buffers) so ctypes wrapping stays trivial.

#include <cstdint>
#include <cstring>

extern "C" {

// ===========================================================================
// BLAKE3-256 (plain hash mode only)
// ===========================================================================

static const uint32_t IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};

static const uint8_t MSG_PERM[16] = {2, 6,  3, 10, 7, 0,  4,  13,
                                     1, 11, 12, 5, 9, 14, 15, 8};

enum {
  CHUNK_START = 1 << 0,
  CHUNK_END = 1 << 1,
  PARENT = 1 << 2,
  ROOT_FLAG = 1 << 3,
  BLOCK_LEN = 64,
  CHUNK_LEN = 1024,
};

static inline uint32_t rotr32(uint32_t x, int n) {
  return (x >> n) | (x << (32 - n));
}

static inline void g(uint32_t *s, int a, int b, int c, int d, uint32_t mx,
                     uint32_t my) {
  s[a] = s[a] + s[b] + mx;
  s[d] = rotr32(s[d] ^ s[a], 16);
  s[c] = s[c] + s[d];
  s[b] = rotr32(s[b] ^ s[c], 12);
  s[a] = s[a] + s[b] + my;
  s[d] = rotr32(s[d] ^ s[a], 8);
  s[c] = s[c] + s[d];
  s[b] = rotr32(s[b] ^ s[c], 7);
}

static void compress(const uint32_t cv[8], const uint32_t block[16],
                     uint64_t counter, uint32_t block_len, uint32_t flags,
                     uint32_t out[8]) {
  uint32_t s[16];
  std::memcpy(s, cv, 32);
  std::memcpy(s + 8, IV, 16);
  s[12] = (uint32_t)(counter & 0xFFFFFFFFu);
  s[13] = (uint32_t)(counter >> 32);
  s[14] = block_len;
  s[15] = flags;
  uint32_t m[16], t[16];
  std::memcpy(m, block, 64);
  for (int r = 0; r < 7; r++) {
    g(s, 0, 4, 8, 12, m[0], m[1]);
    g(s, 1, 5, 9, 13, m[2], m[3]);
    g(s, 2, 6, 10, 14, m[4], m[5]);
    g(s, 3, 7, 11, 15, m[6], m[7]);
    g(s, 0, 5, 10, 15, m[8], m[9]);
    g(s, 1, 6, 11, 12, m[10], m[11]);
    g(s, 2, 7, 8, 13, m[12], m[13]);
    g(s, 3, 4, 9, 14, m[14], m[15]);
    if (r < 6) {
      for (int i = 0; i < 16; i++) t[i] = m[MSG_PERM[i]];
      std::memcpy(m, t, 64);
    }
  }
  for (int i = 0; i < 8; i++) out[i] = s[i] ^ s[i + 8];
}

// Chaining value of one chunk (<= 1024 bytes).
static void chunk_cv(const uint8_t *data, uint64_t len, uint64_t counter,
                     int is_root, uint32_t out[8]) {
  uint32_t cv[8];
  std::memcpy(cv, IV, 32);
  uint64_t nblocks = len == 0 ? 1 : (len + BLOCK_LEN - 1) / BLOCK_LEN;
  for (uint64_t i = 0; i < nblocks; i++) {
    uint64_t off = i * BLOCK_LEN;
    uint32_t blen = (uint32_t)(len - off < BLOCK_LEN ? len - off : BLOCK_LEN);
    uint32_t block[16] = {0};
    std::memcpy(block, data + off, blen);  // LE word packing == memcpy
    uint32_t flags = 0;
    if (i == 0) flags |= CHUNK_START;
    if (i == nblocks - 1) {
      flags |= CHUNK_END;
      if (is_root) flags |= ROOT_FLAG;
    }
    compress(cv, block, counter, blen, flags, cv);
  }
  std::memcpy(out, cv, 32);
}

// Largest power of two strictly less than n (spec tree split rule).
static uint64_t left_chunks(uint64_t n) {
  uint64_t p = 1;
  while (p * 2 < n) p *= 2;
  return p;
}

static void subtree_cv(const uint8_t *data, uint64_t len, uint64_t counter,
                       int is_root, uint32_t out[8]) {
  uint64_t n_chunks = len == 0 ? 1 : (len + CHUNK_LEN - 1) / CHUNK_LEN;
  if (n_chunks == 1) {
    chunk_cv(data, len, counter, is_root, out);
    return;
  }
  uint64_t ln = left_chunks(n_chunks);
  uint32_t lr[16];
  subtree_cv(data, ln * CHUNK_LEN, counter, 0, lr);
  subtree_cv(data + ln * CHUNK_LEN, len - ln * CHUNK_LEN, counter + ln, 0,
             lr + 8);
  uint32_t flags = PARENT | (is_root ? ROOT_FLAG : 0);
  compress(IV, lr, 0, BLOCK_LEN, flags, out);
}

void zk_blake3(const uint8_t *data, uint64_t len, uint8_t out[32]) {
  uint32_t cv[8];
  subtree_cv(data, len, 0, 1, cv);
  std::memcpy(out, cv, 32);
}

void zk_blake3_merge(const uint8_t a[32], const uint8_t b[32],
                     uint8_t out[32]) {
  uint8_t buf[64];
  std::memcpy(buf, a, 32);
  std::memcpy(buf + 32, b, 32);
  zk_blake3(buf, 64, out);
}

// Hash n_rows equal-length messages (row_bytes each), 32-byte digests out.
void zk_blake3_rows(const uint8_t *rows, uint64_t n_rows, uint64_t row_bytes,
                    uint8_t *out) {
  for (uint64_t i = 0; i < n_rows; i++)
    zk_blake3(rows + i * row_bytes, row_bytes, out + i * 32);
}

// One Merkle level: out[i] = blake3(in[2i] || in[2i+1]); n = #pairs.
void zk_merkle_level(const uint8_t *digests, uint64_t n_pairs, uint8_t *out) {
  for (uint64_t i = 0; i < n_pairs; i++)
    zk_blake3(digests + i * 64, 64, out + i * 32);
}

// Verify an authentication path.  Returns 1 iff valid.
int zk_merkle_verify(const uint8_t leaf[32], uint64_t index,
                     const uint8_t *path, uint32_t depth,
                     const uint8_t root[32]) {
  uint8_t cur[32], buf[64];
  std::memcpy(cur, leaf, 32);
  for (uint32_t i = 0; i < depth; i++) {
    const uint8_t *sib = path + (uint64_t)i * 32;
    if (index & 1) {
      std::memcpy(buf, sib, 32);
      std::memcpy(buf + 32, cur, 32);
    } else {
      std::memcpy(buf, cur, 32);
      std::memcpy(buf + 32, sib, 32);
    }
    zk_blake3(buf, 64, cur);
    index >>= 1;
  }
  return std::memcmp(cur, root, 32) == 0 ? 1 : 0;
}

// ===========================================================================
// f128: GF(p), p = 2^128 - 45*2^40 + 1 (winterfell f128 modulus)
// ===========================================================================

typedef unsigned __int128 u128;

// p and the fold constant 2^128 mod p = 45*2^40 - 1.
static const u128 P_LO = 0xFFFFD30000000001ull;  // low 64 bits of p
static const u128 P_HI = 0xFFFFFFFFFFFFFFFFull;  // high 64 bits of p
#define F128_P ((P_HI << 64) | P_LO)
static const u128 FOLD = ((u128)45 << 40) - 1;  // 46-bit

static inline u128 f128_reduce_once(u128 x) {
  // callers guarantee x may exceed p by < p
  return x >= F128_P ? x - F128_P : x;
}

static inline u128 f128_add(u128 a, u128 b) {
  // a, b < p.  a + b may overflow 2^128: detect via wraparound.
  u128 s = a + b;
  if (s < a) s += FOLD;  // + 2^128 mod p
  return f128_reduce_once(s);
}

static inline u128 f128_sub(u128 a, u128 b) {
  return a >= b ? a - b : a + (F128_P - b);
}

// 128x128 -> 256-bit multiply, then fold twice: 2^128 == FOLD (mod p).
static inline u128 f128_mul(u128 a, u128 b) {
  uint64_t a0 = (uint64_t)a, a1 = (uint64_t)(a >> 64);
  uint64_t b0 = (uint64_t)b, b1 = (uint64_t)(b >> 64);
  u128 p00 = (u128)a0 * b0;
  u128 p01 = (u128)a0 * b1;
  u128 p10 = (u128)a1 * b0;
  u128 p11 = (u128)a1 * b1;
  // lo = p00 + (mid << 64), hi = p11 + (mid >> 64) + carries
  u128 mid = p01 + (uint64_t)(p10);  // p01 + low half of p10
  u128 hi = p11 + (p10 >> 64) + (mid < p01 ? ((u128)1 << 64) : 0);
  u128 lo = p00 + (mid << 64);
  if (lo < p00) hi += 1;
  hi += mid >> 64;
  // x = hi * 2^128 + lo == hi * FOLD + lo (mod p).
  // hi*FOLD: hi < 2^128, FOLD < 2^46 -> product < 2^174; split again.
  uint64_t h0 = (uint64_t)hi, h1 = (uint64_t)(hi >> 64);
  u128 f0 = (u128)h0 * (uint64_t)FOLD;          // < 2^110
  u128 f1 = (u128)h1 * (uint64_t)FOLD;          // < 2^110, shifted by 64
  u128 add = f0 + (f1 << 64);
  u128 carry = (f1 >> 64) + (add < f0 ? 1 : 0);  // 2^128-overflow of add
  // result = lo + add + carry*FOLD (carry < 2^46+1, so carry*FOLD < 2^92)
  u128 r = lo + add;
  u128 c2 = (r < lo) ? 1 : 0;
  u128 extra = (carry + c2) * FOLD;  // still needs one more fold pass
  u128 r2 = r + extra;
  if (r2 < r) r2 += FOLD;  // overflow adds one more 2^128 == FOLD
  // r2 < 2^128; reduce to < p (at most twice: 2^128 < 2p)
  r2 = f128_reduce_once(r2);
  return f128_reduce_once(r2);
}

static inline u128 f128_pow(u128 base, u128 exp) {
  u128 acc = 1;
  while (exp) {
    if ((uint64_t)exp & 1) acc = f128_mul(acc, base);
    base = f128_mul(base, base);
    exp >>= 1;
  }
  return acc;
}

static inline u128 f128_inv(u128 a) { return f128_pow(a, F128_P - 2); }

static inline u128 load_u128(const uint64_t *p) {
  return ((u128)p[1] << 64) | p[0];
}
static inline void store_u128(uint64_t *p, u128 x) {
  p[0] = (uint64_t)x;
  p[1] = (uint64_t)(x >> 64);
}

// Array ops: elements are 2 x u64 little-endian (lo, hi), canonical (< p).
void zk_f128_add_arrays(const uint64_t *a, const uint64_t *b, uint64_t *out,
                        uint64_t n) {
  for (uint64_t i = 0; i < n; i++)
    store_u128(out + 2 * i,
               f128_add(load_u128(a + 2 * i), load_u128(b + 2 * i)));
}

void zk_f128_sub_arrays(const uint64_t *a, const uint64_t *b, uint64_t *out,
                        uint64_t n) {
  for (uint64_t i = 0; i < n; i++)
    store_u128(out + 2 * i,
               f128_sub(load_u128(a + 2 * i), load_u128(b + 2 * i)));
}

void zk_f128_mul_arrays(const uint64_t *a, const uint64_t *b, uint64_t *out,
                        uint64_t n) {
  for (uint64_t i = 0; i < n; i++)
    store_u128(out + 2 * i,
               f128_mul(load_u128(a + 2 * i), load_u128(b + 2 * i)));
}

void zk_f128_inv_arrays(const uint64_t *a, uint64_t *out, uint64_t n) {
  for (uint64_t i = 0; i < n; i++)
    store_u128(out + 2 * i, f128_inv(load_u128(a + 2 * i)));
}

void zk_f128_pow_arrays(const uint64_t *a, const uint64_t *e, uint64_t *out,
                        uint64_t n) {
  for (uint64_t i = 0; i < n; i++)
    store_u128(out + 2 * i,
               f128_pow(load_u128(a + 2 * i), load_u128(e + 2 * i)));
}

// Horner evaluation of a polynomial (coeffs low->high) at x.
void zk_f128_poly_eval(const uint64_t *coeffs, uint64_t n, const uint64_t *x,
                       uint64_t *out) {
  u128 xx = load_u128(x), acc = 0;
  for (uint64_t i = n; i-- > 0;)
    acc = f128_add(f128_mul(acc, xx), load_u128(coeffs + 2 * i));
  store_u128(out, acc);
}

// ===========================================================================
// MiMC-e7 over f128 (`src/helper.rs:213-233` semantics)
// ===========================================================================

static inline u128 pow7(u128 x) {
  u128 x2 = f128_mul(x, x);
  u128 x4 = f128_mul(x2, x2);
  return f128_mul(f128_mul(x4, x2), x);
}

static inline u128 mimc_cipher1(u128 inp, u128 rc, u128 z) {
  u128 x = inp;
  u128 rcz = f128_add(rc, z);
  for (int r = 0; r < 64; r++) x = pow7(f128_add(x, rcz));
  return f128_add(x, z);
}

void zk_mimc_cipher(const uint64_t *inp, const uint64_t *rc,
                    const uint64_t *z, uint64_t *out) {
  store_u128(out, mimc_cipher1(load_u128(inp), load_u128(rc), load_u128(z)));
}

// Sequential sponge: z <- cipher(cells[i], rcs[rc_idx[i]], z).
void zk_mimc_hash_state(const uint64_t *cells, uint64_t n_cells,
                        const uint64_t *rcs, const uint32_t *rc_idx,
                        uint64_t *out) {
  u128 z = 0;
  for (uint64_t i = 0; i < n_cells; i++)
    z = mimc_cipher1(load_u128(cells + 2 * i), load_u128(rcs + 2 * rc_idx[i]),
                     z);
  store_u128(out, z);
}

}  // extern "C"
