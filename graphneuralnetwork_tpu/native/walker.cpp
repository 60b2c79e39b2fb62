// Native random-walk engine (host-side data pipeline).
//
// The reference parallelises walk generation with joblib worker processes
// (GraphEmbedding/DeepWalk/data_utils.py:48-50, GATNE/utils/
// sample_utils.py:23-31). This is the TPU-framework equivalent: an
// OpenMP-threaded C++ kernel over CSR arrays, loaded via ctypes
// (graphneuralnetwork_tpu/sampling/native.py), with the vectorised numpy
// walkers as the portable fallback.
//
// All functions are extern "C", operate on caller-owned buffers, and use
// a counter-based splitmix64/xorshift RNG so results are reproducible for
// a given seed regardless of thread count.

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  // splitmix64
  inline uint64_t next_u64() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // uniform in [0, n)
  inline uint64_t next_below(uint64_t n) { return next_u64() % n; }
  // uniform float in [0, 1)
  inline double next_double() {
    return (next_u64() >> 11) * (1.0 / 9007199254740992.0);
  }
};

}  // namespace

extern "C" {

// Uniform random walks: walks[w, t]; dead ends self-absorb.
void uniform_walks(const int64_t* indptr, const int32_t* indices,
                   const int64_t* starts, int64_t n_walks, int64_t length,
                   uint64_t seed, int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t w = 0; w < n_walks; ++w) {
    Rng rng(seed * 0x2545F4914F6CDD1DULL + (uint64_t)w * 0x9E3779B9ULL + 1);
    int64_t cur = starts[w];
    out[w * length] = (int32_t)cur;
    for (int64_t t = 1; t < length; ++t) {
      int64_t lo = indptr[cur], hi = indptr[cur + 1];
      if (hi > lo) cur = indices[lo + (int64_t)rng.next_below(hi - lo)];
      out[w * length + t] = (int32_t)cur;
    }
  }
}

// Weighted walks via per-node alias tables laid out on the CSR edge
// positions: accept[e] / alias[e] are local within each node's segment.
void alias_walks(const int64_t* indptr, const int32_t* indices,
                 const float* accept, const int32_t* alias,
                 const int64_t* starts, int64_t n_walks, int64_t length,
                 uint64_t seed, int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t w = 0; w < n_walks; ++w) {
    Rng rng(seed * 0x2545F4914F6CDD1DULL + (uint64_t)w * 0x9E3779B9ULL + 1);
    int64_t cur = starts[w];
    out[w * length] = (int32_t)cur;
    for (int64_t t = 1; t < length; ++t) {
      int64_t lo = indptr[cur], hi = indptr[cur + 1];
      int64_t deg = hi - lo;
      if (deg > 0) {
        int64_t k = (int64_t)rng.next_below(deg);
        if (rng.next_double() >= accept[lo + k]) k = alias[lo + k];
        cur = indices[lo + k];
      }
      out[w * length + t] = (int32_t)cur;
    }
  }
}

// Second-order node2vec walks with per-EDGE alias tables: for the edge at
// CSR position e (u -> v), edge_accept/edge_alias index v's neighbor list
// locally. First hop uses the node tables.
void node2vec_walks(const int64_t* indptr, const int32_t* indices,
                    const float* node_accept, const int32_t* node_alias,
                    const float* edge_accept, const int32_t* edge_alias,
                    const int64_t* edge_tab_off,  // per-edge offset into
                                                  // edge tables (= indptr of
                                                  // the DESTINATION node)
                    const int64_t* starts, int64_t n_walks, int64_t length,
                    uint64_t seed, int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t w = 0; w < n_walks; ++w) {
    Rng rng(seed * 0x2545F4914F6CDD1DULL + (uint64_t)w * 0x9E3779B9ULL + 1);
    int64_t cur = starts[w];
    out[w * length] = (int32_t)cur;
    if (length == 1) continue;
    int64_t lo = indptr[cur], hi = indptr[cur + 1];
    int64_t edge_pos = -1;
    if (hi > lo) {
      int64_t k = (int64_t)rng.next_below(hi - lo);
      if (rng.next_double() >= node_accept[lo + k]) k = node_alias[lo + k];
      edge_pos = lo + k;
      cur = indices[edge_pos];
    }
    out[w * length + 1] = (int32_t)cur;
    for (int64_t t = 2; t < length; ++t) {
      int64_t clo = indptr[cur], chi = indptr[cur + 1];
      int64_t deg = chi - clo;
      if (deg > 0 && edge_pos >= 0) {
        int64_t base = edge_tab_off[edge_pos];
        int64_t k = (int64_t)rng.next_below(deg);
        if (rng.next_double() >= edge_accept[base + k])
          k = edge_alias[base + k];
        edge_pos = clo + k;
        cur = indices[edge_pos];
      }
      out[w * length + t] = (int32_t)cur;
    }
  }
}

// Fanout neighbor sampling with replacement (GraphSAGE): out[i*fanout+j].
void sample_neighbors(const int64_t* indptr, const int32_t* indices,
                      const int64_t* nodes, int64_t n_nodes_in,
                      int64_t fanout, uint64_t seed, int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_nodes_in; ++i) {
    Rng rng(seed * 0x2545F4914F6CDD1DULL + (uint64_t)i * 0x9E3779B9ULL + 1);
    int64_t v = nodes[i];
    int64_t lo = indptr[v], hi = indptr[v + 1];
    int64_t deg = hi - lo;
    for (int64_t j = 0; j < fanout; ++j) {
      out[i * fanout + j] =
          deg > 0 ? indices[lo + (int64_t)rng.next_below(deg)] : (int32_t)v;
    }
  }
}

int num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
