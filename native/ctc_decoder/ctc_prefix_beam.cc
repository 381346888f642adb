// CTC prefix beam search (Hannun et al. 2014) — native fast path.
//
// Replaces the reference's external `ctcdecode` C++ dependency
// (reference: src/utils.py:246-253, src/infer.py:99-112) with an in-repo
// implementation exposed through a plain C ABI for ctypes.  Log-probs are
// computed by the jitted model on device; this decoder runs on host,
// multithreaded over the batch.
//
// The Python implementation in openasr_tpu/ops/prefix_beam.py is the
// correctness oracle; tests assert bit-level agreement of tokens and
// near-equality of scores.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kLogZero = -std::numeric_limits<float>::infinity();

inline float LogAdd(float a, float b) {
  if (a == kLogZero) return b;
  if (b == kLogZero) return a;
  const float m = a > b ? a : b;
  return m + std::log1p(std::exp(-std::fabs(a - b)));
}

// A prefix is interned in a trie; each beam entry is a trie node id, so
// prefix extension is O(1) and map keys are ints.
struct TrieNode {
  int32_t parent;
  int32_t token;
  int32_t depth;
};

struct Beam {
  int32_t node;  // trie id
  float pb;      // log p(prefix ends in blank)
  float pnb;     // log p(prefix ends in non-blank)
  float total() const { return LogAdd(pb, pnb); }
};

void DecodeOne(const float* lp, int t_max, int vocab, int beam_width,
               int blank, int cutoff_top_n, float cutoff_logp,
               int max_out_len, int32_t* out_tokens, int32_t* out_lengths,
               float* out_scores) {
  std::vector<TrieNode> trie;
  trie.push_back({-1, -1, 0});  // root = empty prefix

  std::unordered_map<int64_t, int32_t> child_index;  // (node<<20|tok) -> id
  auto child_of = [&](int32_t node, int32_t tok) -> int32_t {
    const int64_t key = (static_cast<int64_t>(node) << 20) | tok;
    auto it = child_index.find(key);
    if (it != child_index.end()) return it->second;
    const int32_t id = static_cast<int32_t>(trie.size());
    trie.push_back({node, tok, trie[node].depth + 1});
    child_index.emplace(key, id);
    return id;
  };

  std::vector<Beam> beams{{0, 0.0f, kLogZero}};
  std::unordered_map<int32_t, std::pair<float, float>> next;
  std::vector<int> cand;
  std::vector<int> order(vocab);

  const int top_n = std::min(cutoff_top_n, vocab);
  for (int t = 0; t < t_max; ++t) {
    const float* frame = lp + static_cast<int64_t>(t) * vocab;

    // candidate symbols: top-n by log-prob above the cutoff, plus blank
    for (int v = 0; v < vocab; ++v) order[v] = v;
    std::partial_sort(order.begin(), order.begin() + top_n, order.end(),
                      [&](int a, int b) { return frame[a] > frame[b]; });
    cand.clear();
    bool has_blank = false;
    for (int i = 0; i < top_n; ++i) {
      if (frame[order[i]] < cutoff_logp) break;
      cand.push_back(order[i]);
      has_blank |= (order[i] == blank);
    }
    if (!has_blank) cand.push_back(blank);

    next.clear();
    auto acc = [&](int32_t node, float pb, float pnb) {
      auto& slot = next.try_emplace(
          node, std::make_pair(kLogZero, kLogZero)).first->second;
      slot.first = LogAdd(slot.first, pb);
      slot.second = LogAdd(slot.second, pnb);
    };

    for (const Beam& b : beams) {
      const float p_tot = b.total();
      const int32_t last = trie[b.node].token;
      for (int c : cand) {
        const float plc = frame[c];
        if (c == blank) {
          acc(b.node, p_tot + plc, kLogZero);
        } else if (c == last) {
          acc(b.node, kLogZero, b.pnb + plc);
          acc(child_of(b.node, c), kLogZero, b.pb + plc);
        } else {
          acc(child_of(b.node, c), kLogZero, p_tot + plc);
        }
      }
    }

    beams.clear();
    beams.reserve(next.size());
    for (const auto& kv : next) {
      beams.push_back({kv.first, kv.second.first, kv.second.second});
    }
    const size_t keep = std::min<size_t>(beam_width, beams.size());
    std::partial_sort(beams.begin(), beams.begin() + keep, beams.end(),
                      [](const Beam& a, const Beam& b) {
                        return a.total() > b.total();
                      });
    beams.resize(keep);
  }

  // emit n-best (pad slots past the surviving beams)
  for (int k = 0; k < beam_width; ++k) {
    int32_t* row = out_tokens + static_cast<int64_t>(k) * max_out_len;
    if (k < static_cast<int>(beams.size())) {
      const Beam& b = beams[k];
      int depth = trie[b.node].depth;
      const int n = std::min(depth, max_out_len);
      int32_t node = b.node;
      // walk up the trie, fill reversed
      std::vector<int32_t> rev;
      rev.reserve(depth);
      while (node != 0) {
        rev.push_back(trie[node].token);
        node = trie[node].parent;
      }
      for (int i = 0; i < n; ++i) row[i] = rev[depth - 1 - i];
      out_lengths[k] = n;
      out_scores[k] = b.total();
    } else {
      out_lengths[k] = 0;
      out_scores[k] = -std::numeric_limits<float>::max();
    }
  }
}

}  // namespace

extern "C" {

// Batched decode.  log_probs: [B, T, V] float32; lengths: [B] int32.
// Outputs: tokens [B, beam, max_out_len], out_lengths [B, beam],
// scores [B, beam].  Runs `num_threads` host threads over the batch.
void ctc_prefix_beam_decode_batch(
    const float* log_probs, int batch, int t_max, int vocab,
    const int32_t* lengths, int beam_width, int blank, int cutoff_top_n,
    float cutoff_logp, int max_out_len, int num_threads,
    int32_t* out_tokens, int32_t* out_lengths, float* out_scores) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  std::atomic_int counter{0};
  auto worker = [&]() {
    for (;;) {
      const int i = counter.fetch_add(1);
      if (i >= batch) return;
      const int t = std::min(lengths[i], t_max);
      DecodeOne(log_probs + static_cast<int64_t>(i) * t_max * vocab, t,
                vocab, beam_width, blank, cutoff_top_n, cutoff_logp,
                max_out_len,
                out_tokens + static_cast<int64_t>(i) * beam_width * max_out_len,
                out_lengths + static_cast<int64_t>(i) * beam_width,
                out_scores + static_cast<int64_t>(i) * beam_width);
    }
  };
  const int n = std::min(num_threads, batch);
  pool.reserve(n);
  for (int i = 0; i < n; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
