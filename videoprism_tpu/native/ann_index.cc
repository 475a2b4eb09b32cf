// Approximate-nearest-neighbor index: HNSW over inner-product similarity.
//
// Host-side retrieval runtime for videoprism_tpu.retrieval.ANNVideoIndex.
// The exact VideoIndex sweep is a full-corpus matmul per query (O(N*D) at
// memory bandwidth); this graph index answers the same top-k in O(log N)
// distance evaluations, which is what makes >=10^6-clip corpora servable
// at interactive latency.  Vectors are expected l2-normalized by the
// Python wrapper, so inner product == cosine similarity.
//
// Algorithm: Malkov & Yashunin, "Efficient and robust approximate nearest
// neighbor search using Hierarchical Navigable Small World graphs"
// (IEEE TPAMI 2020) — greedy descent on the upper layers, ef-bounded
// best-first search on layer 0, and the distance-diversity neighbor
// selection heuristic (their Algorithm 4) on insertion.
//
// Concurrency contract (enforced by the Python wrapper): searches are
// read-only and may run concurrently (ctypes releases the GIL); inserts
// must be exclusive.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Index {
  int dim = 0;
  int M = 16;        // max links per node on upper layers
  int M0 = 32;       // max links per node on layer 0 (2*M)
  int efc = 200;     // ef during construction
  double mult = 0.0; // level multiplier: 1/ln(M)
  std::mt19937_64 rng;

  int64_t size = 0;
  int entry = -1;
  int max_level = -1;
  std::vector<float> data;              // size * dim
  std::vector<int> level;               // per node
  std::vector<int> links0;              // size * (M0 + 1): [count, ids...]
  std::vector<std::vector<int>> upper;  // per node: level * (M + 1)

  const float* vec(int64_t id) const { return data.data() + id * dim; }

  // Four accumulators break the loop-carried FP dependence so the
  // compiler can pipeline/vectorize without -ffast-math (the build also
  // passes -ffast-math, which turns this into full-width SIMD).
  float sim(const float* a, const float* b) const {
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    int i = 0;
    for (; i + 4 <= dim; i += 4) {
      s0 += a[i] * b[i];
      s1 += a[i + 1] * b[i + 1];
      s2 += a[i + 2] * b[i + 2];
      s3 += a[i + 3] * b[i + 3];
    }
    for (; i < dim; ++i) s0 += a[i] * b[i];
    return (s0 + s1) + (s2 + s3);
  }

  int* link_block(int id, int lvl) {
    if (lvl == 0) return links0.data() + static_cast<int64_t>(id) * (M0 + 1);
    return upper[id].data() + static_cast<int64_t>(lvl - 1) * (M + 1);
  }
  const int* link_block(int id, int lvl) const {
    return const_cast<Index*>(this)->link_block(id, lvl);
  }
  int link_cap(int lvl) const { return lvl == 0 ? M0 : M; }

  // Greedy hill climb on one upper layer: monotone improvement, no
  // visited set needed.
  int greedy(const float* q, int start, int lvl) const {
    int cur = start;
    float cur_sim = sim(q, vec(cur));
    bool improved = true;
    while (improved) {
      improved = false;
      const int* blk = link_block(cur, lvl);
      for (int i = 1; i <= blk[0]; ++i) {
        float s = sim(q, vec(blk[i]));
        if (s > cur_sim) {
          cur_sim = s;
          cur = blk[i];
          improved = true;
        }
      }
    }
    return cur;
  }

  // ef-bounded best-first search on one layer.  Returns up to ef
  // (similarity, id) pairs, unsorted.
  std::vector<std::pair<float, int>> search_layer(
      const float* q, int start, int ef, int lvl) const {
    std::vector<uint8_t> visited(size, 0);
    // Max-heap of frontier candidates by similarity.
    std::priority_queue<std::pair<float, int>> cand;
    // Min-heap of current best ef results.
    std::priority_queue<std::pair<float, int>,
                        std::vector<std::pair<float, int>>,
                        std::greater<std::pair<float, int>>> best;
    float s0 = sim(q, vec(start));
    visited[start] = 1;
    cand.push({s0, start});
    best.push({s0, start});
    while (!cand.empty()) {
      auto [cs, cid] = cand.top();
      cand.pop();
      if (static_cast<int>(best.size()) >= ef && cs < best.top().first) break;
      const int* blk = link_block(cid, lvl);
      for (int i = 1; i <= blk[0]; ++i) {
        int nb = blk[i];
        if (visited[nb]) continue;
        visited[nb] = 1;
        float s = sim(q, vec(nb));
        if (static_cast<int>(best.size()) < ef || s > best.top().first) {
          cand.push({s, nb});
          best.push({s, nb});
          if (static_cast<int>(best.size()) > ef) best.pop();
        }
      }
    }
    std::vector<std::pair<float, int>> out;
    out.reserve(best.size());
    while (!best.empty()) {
      out.push_back(best.top());
      best.pop();
    }
    return out;
  }

  // Distance-diversity selection (Algorithm 4): scan candidates by
  // similarity to the query, keep one only if it is closer to the query
  // than to every already-kept neighbor.
  std::vector<int> select_neighbors(
      std::vector<std::pair<float, int>> cands, int m) const {
    std::sort(cands.begin(), cands.end(),
              [](const auto& a, const auto& b) { return a.first > b.first; });
    std::vector<int> kept;
    for (const auto& [s_q, cid] : cands) {
      if (static_cast<int>(kept.size()) >= m) break;
      bool ok = true;
      for (int kid : kept) {
        if (sim(vec(cid), vec(kid)) > s_q) {
          ok = false;
          break;
        }
      }
      if (ok) kept.push_back(cid);
    }
    return kept;
  }

  void connect(int id, int nb, int lvl) {
    int* blk = link_block(nb, lvl);
    int cap = link_cap(lvl);
    if (blk[0] < cap) {
      blk[++blk[0]] = id;
      return;
    }
    // Over capacity: re-select among existing links + the newcomer.
    std::vector<std::pair<float, int>> cands;
    cands.reserve(cap + 1);
    const float* nv = vec(nb);
    for (int i = 1; i <= blk[0]; ++i)
      cands.push_back({sim(nv, vec(blk[i])), blk[i]});
    cands.push_back({sim(nv, vec(id)), id});
    std::vector<int> kept = select_neighbors(std::move(cands), cap);
    blk[0] = static_cast<int>(kept.size());
    for (size_t i = 0; i < kept.size(); ++i) blk[1 + i] = kept[i];
  }

  void add_one(const float* v) {
    int id = static_cast<int>(size++);
    data.insert(data.end(), v, v + dim);
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    double u = unif(rng);
    if (u < 1e-12) u = 1e-12;
    int lvl = static_cast<int>(-std::log(u) * mult);
    level.push_back(lvl);
    links0.insert(links0.end(), M0 + 1, 0);
    upper.emplace_back(static_cast<size_t>(lvl) * (M + 1), 0);

    if (entry < 0) {
      entry = id;
      max_level = lvl;
      return;
    }
    int cur = entry;
    for (int l = max_level; l > lvl; --l) cur = greedy(v, cur, l);
    for (int l = std::min(lvl, max_level); l >= 0; --l) {
      auto cands = search_layer(v, cur, efc, l);
      // Continue the descent from the best candidate found at this layer.
      float best_s = -1e30f;
      for (const auto& [s, cid] : cands)
        if (s > best_s) {
          best_s = s;
          cur = cid;
        }
      for (int nb : select_neighbors(cands, M)) {
        if (nb == id) continue;
        int* blk = link_block(id, l);
        if (blk[0] < link_cap(l)) blk[++blk[0]] = nb;
        connect(id, nb, l);
      }
    }
    if (lvl > max_level) {
      entry = id;
      max_level = lvl;
    }
  }

  int search(const float* q, int k, int ef, int* out_ids,
             float* out_scores) const {
    if (size == 0) return 0;
    int cur = entry;
    for (int l = max_level; l >= 1; --l) cur = greedy(q, cur, l);
    auto res = search_layer(q, cur, std::max(ef, k), 0);
    std::sort(res.begin(), res.end(),
              [](const auto& a, const auto& b) { return a.first > b.first; });
    int n = std::min<int>(k, static_cast<int>(res.size()));
    for (int i = 0; i < n; ++i) {
      out_ids[i] = res[i].second;
      out_scores[i] = res[i].first;
    }
    return n;
  }

  // Filtered layer-0 search (the standard filtered-HNSW scheme, as in
  // hnswlib's filter functor): EVERY node stays traversable — the
  // allowed subgraph may be disconnected, so routing must flow through
  // excluded nodes — but only ``allowed`` nodes enter the result heap.
  // Termination mirrors search_layer with ``best`` counting allowed
  // results only, so a selective filter keeps expanding until ef
  // allowed nodes are found or the frontier dies; ``max_visits``
  // bounds that expansion (<= 0: unbounded).
  std::vector<std::pair<float, int>> search_layer_filtered(
      const float* q, int start, int ef, const uint8_t* allowed,
      int64_t max_visits) const {
    std::vector<uint8_t> visited(size, 0);
    std::priority_queue<std::pair<float, int>> cand;
    std::priority_queue<std::pair<float, int>,
                        std::vector<std::pair<float, int>>,
                        std::greater<std::pair<float, int>>> best;
    float s0 = sim(q, vec(start));
    visited[start] = 1;
    int64_t visits = 1;
    cand.push({s0, start});
    if (allowed[start]) best.push({s0, start});
    while (!cand.empty()) {
      auto [cs, cid] = cand.top();
      cand.pop();
      if (static_cast<int>(best.size()) >= ef && cs < best.top().first) break;
      if (max_visits > 0 && visits >= max_visits) break;
      const int* blk = link_block(cid, 0);
      for (int i = 1; i <= blk[0]; ++i) {
        int nb = blk[i];
        if (visited[nb]) continue;
        visited[nb] = 1;
        ++visits;
        float s = sim(q, vec(nb));
        if (static_cast<int>(best.size()) < ef || s > best.top().first) {
          cand.push({s, nb});
          if (allowed[nb]) {
            best.push({s, nb});
            if (static_cast<int>(best.size()) > ef) best.pop();
          }
        }
      }
    }
    std::vector<std::pair<float, int>> out;
    out.reserve(best.size());
    while (!best.empty()) {
      out.push_back(best.top());
      best.pop();
    }
    return out;
  }

  int search_filtered(const float* q, int k, int ef, const uint8_t* allowed,
                      int64_t max_visits, int* out_ids,
                      float* out_scores) const {
    if (size == 0) return 0;
    int cur = entry;
    for (int l = max_level; l >= 1; --l) cur = greedy(q, cur, l);
    auto res =
        search_layer_filtered(q, cur, std::max(ef, k), allowed, max_visits);
    std::sort(res.begin(), res.end(),
              [](const auto& a, const auto& b) { return a.first > b.first; });
    int n = std::min<int>(k, static_cast<int>(res.size()));
    for (int i = 0; i < n; ++i) {
      out_ids[i] = res[i].second;
      out_scores[i] = res[i].first;
    }
    return n;
  }
};

constexpr char kMagic[8] = {'V', 'P', 'A', 'N', 'N', '0', '0', '1'};

bool write_all(FILE* f, const void* p, size_t n) {
  return fwrite(p, 1, n, f) == n;
}
bool read_all(FILE* f, void* p, size_t n) { return fread(p, 1, n, f) == n; }

}  // namespace

extern "C" {

void* vp_ann_create(int dim, int m, int ef_construction, uint64_t seed) {
  if (dim <= 0 || m < 2 || ef_construction < 1) return nullptr;
  auto* idx = new Index();
  idx->dim = dim;
  idx->M = m;
  idx->M0 = 2 * m;
  idx->efc = ef_construction;
  idx->mult = 1.0 / std::log(static_cast<double>(m));
  idx->rng.seed(seed);
  return idx;
}

void vp_ann_destroy(void* h) { delete static_cast<Index*>(h); }

int64_t vp_ann_size(void* h) { return static_cast<Index*>(h)->size; }

int vp_ann_dim(void* h) { return static_cast<Index*>(h)->dim; }

int vp_ann_add(void* h, const float* vecs, int64_t n) {
  auto* idx = static_cast<Index*>(h);
  if (idx->size + n > (1LL << 31) - 1) return -1;  // int node ids
  for (int64_t i = 0; i < n; ++i) idx->add_one(vecs + i * idx->dim);
  return 0;
}

// out_ids/out_scores are [nq, k]; rows past the result count are filled
// with id -1 / score 0.  Returns 0, or -1 on bad args.
int vp_ann_search(void* h, const float* queries, int64_t nq, int k, int ef,
                  int* out_ids, float* out_scores) {
  auto* idx = static_cast<Index*>(h);
  if (k < 1 || ef < 1) return -1;
  for (int64_t i = 0; i < nq; ++i) {
    int* ids = out_ids + i * k;
    float* scores = out_scores + i * k;
    int n = idx->search(queries + i * idx->dim, k, ef, ids, scores);
    for (int j = n; j < k; ++j) {
      ids[j] = -1;
      scores[j] = 0.f;
    }
  }
  return 0;
}

// Filtered variant: ``allowed`` is a uint8[size] mask — only set rows
// may appear in results, every row stays traversable for routing.
// ``max_visits`` (<= 0: unbounded) caps layer-0 expansion per query.
// Output convention matches vp_ann_search (-1 id padding).
int vp_ann_search_filtered(void* h, const float* queries, int64_t nq, int k,
                           int ef, const uint8_t* allowed,
                           int64_t max_visits, int* out_ids,
                           float* out_scores) {
  auto* idx = static_cast<Index*>(h);
  if (k < 1 || ef < 1 || allowed == nullptr) return -1;
  for (int64_t i = 0; i < nq; ++i) {
    int* ids = out_ids + i * k;
    float* scores = out_scores + i * k;
    int n = idx->search_filtered(queries + i * idx->dim, k, ef, allowed,
                                 max_visits, ids, scores);
    for (int j = n; j < k; ++j) {
      ids[j] = -1;
      scores[j] = 0.f;
    }
  }
  return 0;
}

int vp_ann_save(void* h, const char* path) {
  auto* idx = static_cast<Index*>(h);
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  bool ok = write_all(f, kMagic, sizeof(kMagic));
  int32_t header[4] = {idx->dim, idx->M, idx->M0, idx->efc};
  ok = ok && write_all(f, header, sizeof(header));
  int64_t size = idx->size;
  int32_t meta[2] = {idx->entry, idx->max_level};
  ok = ok && write_all(f, &size, sizeof(size));
  ok = ok && write_all(f, meta, sizeof(meta));
  ok = ok && write_all(f, idx->level.data(), sizeof(int) * size);
  ok = ok && write_all(f, idx->data.data(), sizeof(float) * size * idx->dim);
  ok = ok && write_all(f, idx->links0.data(),
                       sizeof(int) * size * (idx->M0 + 1));
  for (int64_t i = 0; ok && i < size; ++i) {
    const auto& up = idx->upper[i];
    ok = write_all(f, up.data(), sizeof(int) * up.size());
  }
  return (fclose(f) == 0 && ok) ? 0 : -1;
}

void* vp_ann_load(const char* path, uint64_t seed) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  char magic[8];
  int32_t header[4];
  int64_t size;
  int32_t meta[2];
  bool ok = read_all(f, magic, sizeof(magic)) &&
            memcmp(magic, kMagic, sizeof(kMagic)) == 0 &&
            read_all(f, header, sizeof(header)) &&
            read_all(f, &size, sizeof(size)) && read_all(f, meta, sizeof(meta));
  if (!ok || header[0] <= 0 || size < 0) {
    fclose(f);
    return nullptr;
  }
  auto* idx = static_cast<Index*>(
      vp_ann_create(header[0], header[1], header[3], seed));
  if (!idx) {
    fclose(f);
    return nullptr;
  }
  idx->M0 = header[2];
  idx->size = size;
  idx->entry = meta[0];
  idx->max_level = meta[1];
  idx->level.resize(size);
  idx->data.resize(size * idx->dim);
  idx->links0.resize(size * (idx->M0 + 1));
  ok = read_all(f, idx->level.data(), sizeof(int) * size) &&
       read_all(f, idx->data.data(), sizeof(float) * size * idx->dim) &&
       read_all(f, idx->links0.data(), sizeof(int) * size * (idx->M0 + 1));
  idx->upper.resize(size);
  for (int64_t i = 0; ok && i < size; ++i) {
    idx->upper[i].resize(static_cast<size_t>(idx->level[i]) * (idx->M + 1));
    ok = read_all(f, idx->upper[i].data(),
                  sizeof(int) * idx->upper[i].size());
  }
  fclose(f);
  if (!ok) {
    delete idx;
    return nullptr;
  }
  return idx;
}

}  // extern "C"
