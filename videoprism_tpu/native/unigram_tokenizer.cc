// Native unigram-Viterbi tokenizer core for videoprism_tpu.
//
// The reference consumes SentencePiece through its C++ wheel; this is our
// equivalent native tier: a trie + Viterbi segmenter over codepoints,
// exposed through a minimal C ABI consumed via ctypes
// (videoprism_tpu/native/__init__.py).  Semantics match the pure-Python
// implementation in videoprism_tpu/io/tokenizers.py exactly (same lattice,
// same kUnkPenalty handling); the Python path remains the portable
// fallback and the correctness oracle.
//
// Build: g++ -O3 -fPIC -shared -o libvp_tokenizer.so unigram_tokenizer.cc

#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct TrieNode {
  std::unordered_map<char32_t, int32_t> children;  // codepoint -> node idx
  int32_t piece_id = -1;
};

struct Tokenizer {
  std::vector<TrieNode> nodes;  // nodes[0] = root
  std::vector<float> scores;
  float unk_score = 0.f;
  int32_t unk_id = 0;
};

// Decodes UTF-8 into codepoints.  Invalid bytes decode as themselves
// (latin-1 style) so we never crash on malformed input.
std::vector<char32_t> DecodeUtf8(const char* s, int64_t len) {
  std::vector<char32_t> out;
  out.reserve(len);
  int64_t i = 0;
  while (i < len) {
    uint8_t b = static_cast<uint8_t>(s[i]);
    char32_t cp;
    int n;
    if (b < 0x80) {
      cp = b;
      n = 1;
    } else if ((b >> 5) == 0x6) {
      cp = b & 0x1F;
      n = 2;
    } else if ((b >> 4) == 0xE) {
      cp = b & 0x0F;
      n = 3;
    } else if ((b >> 3) == 0x1E) {
      cp = b & 0x07;
      n = 4;
    } else {
      out.push_back(b);
      ++i;
      continue;
    }
    if (i + n > len) {
      out.push_back(b);
      ++i;
      continue;
    }
    bool ok = true;
    for (int k = 1; k < n; ++k) {
      uint8_t c = static_cast<uint8_t>(s[i + k]);
      if ((c >> 6) != 0x2) {
        ok = false;
        break;
      }
      cp = (cp << 6) | (c & 0x3F);
    }
    if (!ok) {
      out.push_back(b);
      ++i;
      continue;
    }
    out.push_back(cp);
    i += n;
  }
  return out;
}

}  // namespace

extern "C" {

// pieces: flattened utf8 bytes; offsets[i]..offsets[i+1] delimit piece i.
// matchable[i] != 0 iff the piece participates in the lattice
// (NORMAL / USER_DEFINED types).
void* vp_tokenizer_create(const char* pieces_utf8, const int64_t* offsets,
                          const float* scores, const uint8_t* matchable,
                          int32_t num_pieces, int32_t unk_id,
                          float unk_score) {
  auto* tok = new Tokenizer();
  tok->nodes.emplace_back();  // root
  tok->scores.assign(scores, scores + num_pieces);
  tok->unk_id = unk_id;
  tok->unk_score = unk_score;

  for (int32_t p = 0; p < num_pieces; ++p) {
    if (!matchable[p]) continue;
    const char* start = pieces_utf8 + offsets[p];
    const int64_t len = offsets[p + 1] - offsets[p];
    std::vector<char32_t> cps = DecodeUtf8(start, len);
    int32_t node = 0;
    for (char32_t cp : cps) {
      auto it = tok->nodes[node].children.find(cp);
      if (it == tok->nodes[node].children.end()) {
        int32_t next = static_cast<int32_t>(tok->nodes.size());
        tok->nodes[node].children.emplace(cp, next);
        tok->nodes.emplace_back();
        node = next;
      } else {
        node = it->second;
      }
    }
    tok->nodes[node].piece_id = p;
  }
  return tok;
}

void vp_tokenizer_destroy(void* handle) {
  delete static_cast<Tokenizer*>(handle);
}

// Viterbi-encodes normalized UTF-8 text.  Returns the number of ids
// written, or -1 if out_capacity was insufficient.
int32_t vp_tokenizer_encode(void* handle, const char* text, int64_t text_len,
                            int32_t* out_ids, int32_t out_capacity) {
  const auto* tok = static_cast<const Tokenizer*>(handle);
  std::vector<char32_t> cps = DecodeUtf8(text, text_len);
  const int64_t n = static_cast<int64_t>(cps.size());
  if (n == 0) return 0;

  constexpr float kNegInf = -std::numeric_limits<float>::infinity();
  std::vector<float> best(n + 1, kNegInf);
  std::vector<int64_t> back_pos(n + 1, -1);
  std::vector<int32_t> back_id(n + 1, -1);
  best[0] = 0.f;

  for (int64_t start = 0; start < n; ++start) {
    const float base = best[start];
    if (base == kNegInf) continue;
    bool matched_single = false;
    int32_t node = 0;
    for (int64_t i = start; i < n; ++i) {
      const auto& children = tok->nodes[node].children;
      auto it = children.find(cps[i]);
      if (it == children.end()) break;
      node = it->second;
      const int32_t pid = tok->nodes[node].piece_id;
      if (pid >= 0) {
        if (i == start) matched_single = true;
        const float score = base + tok->scores[pid];
        if (score > best[i + 1]) {
          best[i + 1] = score;
          back_pos[i + 1] = start;
          back_id[i + 1] = pid;
        }
      }
    }
    if (!matched_single) {
      const float score = base + tok->unk_score;
      if (score > best[start + 1]) {
        best[start + 1] = score;
        back_pos[start + 1] = start;
        back_id[start + 1] = tok->unk_id;
      }
    }
  }

  // Walk back.
  std::vector<int32_t> rev;
  int64_t pos = n;
  while (pos > 0) {
    rev.push_back(back_id[pos]);
    pos = back_pos[pos];
  }
  const int32_t count = static_cast<int32_t>(rev.size());
  if (count > out_capacity) return -1;
  for (int32_t i = 0; i < count; ++i) {
    out_ids[i] = rev[count - 1 - i];
  }
  return count;
}

}  // extern "C"
