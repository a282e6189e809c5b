// Native per-pixel communication-graph builder.
//
// C++ equivalent of the reference's hottest setup loop: one graph
// construction per pixel over all n = N^2 pixels
// (/root/reference/block_3_graph_and_precisions.py:150-187, built there with
// networkx in pure Python — SURVEY HOT LOOP #1). Semantics mirror
// dip_admm_tpu/graph/topology.py exactly (same tie-breaking: first index
// wins), so the Python and native backends are interchangeable; equivalence
// is enforced by tests.
//
// Layout: weights q[p][i][j] pixel-major ([n, P, P], float32, symmetric,
// zero diagonal); output keep[p][i][j] ([n, P, P], uint8).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC pixel_graphs.cpp
//        -o libpixelgraphs.so

#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr float NEG = -1e30f;

// Prim's maximum spanning tree on the complete graph (first-max tie-break,
// matching jnp.argmax over the flattened [P, P] score matrix).
void prim_max_tree(const float* q, int P, uint8_t* adj) {
  std::vector<uint8_t> in_tree(P, 0);
  in_tree[0] = 1;
  std::memset(adj, 0, P * P);
  for (int step = 0; step < P - 1; ++step) {
    float best = NEG;
    int bu = 0, bv = 0;
    for (int u = 0; u < P; ++u) {
      if (!in_tree[u]) continue;
      for (int v = 0; v < P; ++v) {
        if (in_tree[v]) continue;
        float w = q[u * P + v];
        if (w > best) {  // strict: first (u, v) in row-major order wins
          best = w;
          bu = u;
          bv = v;
        }
      }
    }
    adj[bu * P + bv] = 1;
    adj[bv * P + bu] = 1;
    in_tree[bv] = 1;
  }
}

bool connected(const uint8_t* adj, int P) {
  std::vector<uint8_t> seen(P, 0);
  std::vector<int> stack{0};
  seen[0] = 1;
  int count = 1;
  while (!stack.empty()) {
    int u = stack.back();
    stack.pop_back();
    for (int v = 0; v < P; ++v) {
      if (adj[u * P + v] && !seen[v]) {
        seen[v] = 1;
        ++count;
        stack.push_back(v);
      }
    }
  }
  return count == P;
}

// Top-k per node on the symmetrized weights, OR-symmetrized; ties toward
// lower index (jax.lax.top_k returns the first of equal values).
void knn_adj(const float* q, int P, int k, uint8_t* adj) {
  std::memset(adj, 0, P * P);
  int k_eff = k < P - 1 ? k : P - 1;
  if (k_eff <= 0) return;
  for (int i = 0; i < P; ++i) {
    std::vector<uint8_t> used(P, 0);
    used[i] = 1;
    for (int t = 0; t < k_eff; ++t) {
      float best = NEG;
      int bj = -1;
      for (int j = 0; j < P; ++j) {
        if (used[j]) continue;
        float w = q[i * P + j];
        if (w > best) {
          best = w;
          bj = j;
        }
      }
      if (bj < 0) break;
      used[bj] = 1;
      adj[i * P + bj] = 1;
      adj[bj * P + i] = 1;
    }
  }
}

}  // namespace

extern "C" {

// strategy: 0 = knn (with max-spanning-tree reconnects), 1 = mst.
void build_pixel_masks(const float* q, int64_t n, int P, int strategy, int k,
                       uint8_t* keep) {
#pragma omp parallel
  {
    std::vector<uint8_t> tree(P * P);
#pragma omp for schedule(static)
    for (int64_t p = 0; p < n; ++p) {
      const float* qp = q + p * P * P;
      uint8_t* out = keep + p * P * P;
      if (strategy == 1) {
        prim_max_tree(qp, P, out);
      } else {
        knn_adj(qp, P, k, out);
        if (!connected(out, P)) {
          prim_max_tree(qp, P, tree.data());
          for (int e = 0; e < P * P; ++e) out[e] |= tree[e];
        }
      }
    }
  }
}

int pixel_graphs_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
