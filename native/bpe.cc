// GPT-2 byte-level BPE encoder (the hot half of tokenization).
//
// The reference tokenizes with HF's GPT2Tokenizer, whose fast path is
// Rust-native (train_full_model.py:386-421); this is the C++ equivalent
// for the rgrg_tpu host runtime. Exactness contract:
//
//  * Pre-tokenization replicates GPT-2's pattern
//      's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+
//      |\s+(?!\S)|\s+
//    for ASCII input only (classes measured against the `regex` module:
//    \s = {\t \n \v \f \r ' '}, \p{L} = [A-Za-z], \p{N} = [0-9]).
//    Any byte >= 0x80 makes rgrg_bpe_encode return -2 and the Python
//    caller falls back to its regex path - no approximation is ever used.
//  * The merge loop is the published BPE: repeatedly merge the
//    lowest-rank adjacent pair, all left-to-right occurrences per pass -
//    formulated over token IDS (each raw byte starts as its single-char
//    token; a merge (a, b, rank) produces the id of token a+b), which is
//    equivalent to the string formulation because vocab is a bijection.
//    Per-word results are cached like the Python tokenizer's dict cache.
//
// Parity is pinned in tests/test_text.py against both the Python
// implementation and an HF-oracle tokenizer.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct BpeCtx {
  // (a << 32 | b) -> (rank << 32 | merged_id)
  std::unordered_map<uint64_t, uint64_t> merges;
  int32_t byte_to_id[256];
  std::unordered_map<std::string, std::vector<int32_t>> cache;
  std::mutex mu;
};

inline bool is_ws(uint8_t c) {
  return c == ' ' || (c >= '\t' && c <= '\r');  // \t \n \v \f \r
}
inline bool is_letter(uint8_t c) {
  return (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z');
}
inline bool is_digit(uint8_t c) { return c >= '0' && c <= '9'; }

// Longest match of one pattern alternative starting at s[i]; returns the
// match length (>= 1; a match always exists for any ASCII byte).
int next_pretoken(const uint8_t* s, int len, int i) {
  // 1. contractions (case-sensitive, in pattern order)
  if (s[i] == '\'' && i + 1 < len) {
    static const char* two[] = {"'s", "'t", "'m", "'d"};
    static const char* three[] = {"'re", "'ve", "'ll"};
    for (const char* t : three)
      if (i + 2 < len && s[i + 1] == (uint8_t)t[1] && s[i + 2] == (uint8_t)t[2])
        return 3;
    for (const char* t : two)
      if (s[i + 1] == (uint8_t)t[1]) return 2;
  }
  int j = i;
  bool lead_space = (s[j] == ' ' && j + 1 < len);
  int k = lead_space ? j + 1 : j;
  // 2. " ?letters+"
  if (is_letter(s[k])) {
    int e = k;
    while (e < len && is_letter(s[e])) e++;
    return e - i;
  }
  // 3. " ?digits+"
  if (is_digit(s[k])) {
    int e = k;
    while (e < len && is_digit(s[e])) e++;
    return e - i;
  }
  // 4. " ?other+" (not ws, not letter, not digit)
  if (!is_ws(s[k])) {
    int e = k;
    while (e < len && !is_ws(s[e]) && !is_letter(s[e]) && !is_digit(s[e]))
      e++;
    return e - i;
  }
  // 5./6. whitespace runs: \s+(?!\S) then \s+.
  // A run of n ws chars followed by non-space yields n-1 (when n >= 2,
  // the last ws becomes the next token's optional leading space); a run
  // at end-of-string (or length 1 before non-space) matches whole.
  int e = i;
  while (e < len && is_ws(s[e])) e++;
  if (e < len && e - i >= 2) return e - i - 1;  // (?!\S) backtrack
  return e - i;                                 // n == 1 or end of input
}

void bpe_word(const BpeCtx* ctx, const uint8_t* s, int n,
              std::vector<int32_t>& out) {
  std::vector<int32_t> syms(n);
  for (int i = 0; i < n; i++) syms[i] = ctx->byte_to_id[s[i]];
  while (syms.size() >= 2) {
    uint32_t best_rank = UINT32_MAX;
    int32_t best_a = 0, best_b = 0, best_m = 0;
    for (size_t i = 0; i + 1 < syms.size(); i++) {
      uint64_t key = ((uint64_t)(uint32_t)syms[i] << 32) |
                     (uint32_t)syms[i + 1];
      auto it = ctx->merges.find(key);
      if (it != ctx->merges.end()) {
        uint32_t rank = (uint32_t)(it->second >> 32);
        if (rank < best_rank) {
          best_rank = rank;
          best_a = syms[i];
          best_b = syms[i + 1];
          best_m = (int32_t)(uint32_t)it->second;
        }
      }
    }
    if (best_rank == UINT32_MAX) break;
    std::vector<int32_t> merged;
    merged.reserve(syms.size());
    for (size_t i = 0; i < syms.size();) {
      if (i + 1 < syms.size() && syms[i] == best_a && syms[i + 1] == best_b) {
        merged.push_back(best_m);
        i += 2;
      } else {
        merged.push_back(syms[i]);
        i += 1;
      }
    }
    syms.swap(merged);
  }
  out.insert(out.end(), syms.begin(), syms.end());
}

}  // namespace

extern "C" {

void* rgrg_bpe_create(const int32_t* abm, int n_merges,
                      const int32_t* byte_to_id) {
  auto* ctx = new BpeCtx();
  ctx->merges.reserve((size_t)n_merges * 2);
  for (int r = 0; r < n_merges; r++) {
    uint64_t key = ((uint64_t)(uint32_t)abm[3 * r] << 32) |
                   (uint32_t)abm[3 * r + 1];
    // assignment: a duplicated pair keeps its LAST rank, matching the
    // Python dict comprehension {merge: rank} (no valid file has one)
    ctx->merges[key] =
        ((uint64_t)(uint32_t)r << 32) | (uint32_t)abm[3 * r + 2];
  }
  std::memcpy(ctx->byte_to_id, byte_to_id, 256 * sizeof(int32_t));
  return ctx;
}

void rgrg_bpe_destroy(void* h) { delete static_cast<BpeCtx*>(h); }

// Returns the number of ids written, -1 if out_cap is too small, or -2
// for non-ASCII input (caller must use the Python/regex path).
int rgrg_bpe_encode(void* h, const uint8_t* text, int len, int32_t* out,
                    int out_cap) {
  auto* ctx = static_cast<BpeCtx*>(h);
  for (int i = 0; i < len; i++)
    if (text[i] >= 0x80) return -2;
  std::vector<int32_t> ids;
  ids.reserve(len);
  std::lock_guard<std::mutex> lock(ctx->mu);
  for (int i = 0; i < len;) {
    int n = next_pretoken(text, len, i);
    std::string word(reinterpret_cast<const char*>(text + i), (size_t)n);
    auto it = ctx->cache.find(word);
    if (it != ctx->cache.end()) {
      ids.insert(ids.end(), it->second.begin(), it->second.end());
    } else {
      std::vector<int32_t> w;
      bpe_word(ctx, text + i, n, w);
      ids.insert(ids.end(), w.begin(), w.end());
      ctx->cache.emplace(std::move(word), std::move(w));
    }
    i += n;
  }
  if ((int)ids.size() > out_cap) return -1;
  std::memcpy(out, ids.data(), ids.size() * sizeof(int32_t));
  return (int)ids.size();
}

}  // extern "C"
