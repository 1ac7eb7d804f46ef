// dgn_tpu native runtime: graph batch packer + Pallas block-layout builder.
//
// The training input pipeline packs thousands of small graphs per step into
// one fixed-shape batch (the moral equivalent of the reference's dgl.batch +
// collate, /root/reference/realworld_benchmark/data/molecules.py:219-230 —
// whose heavy lifting lived in DGL's C++ core).  This is the TPU framework's
// own native core: one pass over the edge lists producing globally-offset,
// (dst, src)-lexicographically sorted COO with masks, size-normalizers and
// in-degrees, plus the chunked edge re-packing consumed by the Pallas fused
// segment kernel (dgn_tpu/ops/pallas/segment_kernels.py).
//
// Sorting is two stable counting sorts (src then dst): O(E + N), no
// comparisons — vs the numpy lexsort O(E log E) path in graph.py, and
// bit-identical to it (pads at the end, same tie-break).
//
// C ABI only; loaded from Python via ctypes (runtime/native.py).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pack g graphs' edges into fixed-shape arrays.
//   n_nodes/n_edges: per-graph sizes [g]
//   src_cat/dst_cat: per-graph-local edge endpoints, concatenated [E]
// Outputs (caller-allocated):
//   src_out/dst_out[e_pad]   global node ids, sorted by (dst, src), pads last
//   perm_out[e_pad]          output slot -> concatenated input edge index
//                            (pad slots -> -1); lets the caller permute edge
//                            features without a second native call
//   edge_mask[e_pad]         1 for real edges
//   snorm_e[e_pad]           sqrt(1/E_graph) per edge
//   node_graph[n_pad]        graph id per node (pads -> g_pad-1)
//   node_mask[n_pad], snorm_n[n_pad], in_degree[n_pad]
// Returns 0 on success, nonzero on overflow.
int dgn_pack(int32_t g, const int32_t* n_nodes, const int32_t* n_edges,
             const int32_t* src_cat, const int32_t* dst_cat,
             int64_t n_pad, int64_t e_pad, int32_t g_pad, int32_t sort_edges,
             int32_t* src_out, int32_t* dst_out, int32_t* perm_out,
             uint8_t* edge_mask, float* snorm_e,
             int32_t* node_graph, uint8_t* node_mask, float* snorm_n,
             int32_t* in_degree) {
  int64_t tot_n = 0, tot_e = 0;
  for (int32_t i = 0; i < g; ++i) {
    tot_n += n_nodes[i];
    tot_e += n_edges[i];
  }
  if (tot_n > n_pad || tot_e > e_pad || g > g_pad) return 1;

  // node-side arrays
  for (int64_t v = 0; v < n_pad; ++v) {
    node_graph[v] = g_pad - 1;
    node_mask[v] = 0;
    snorm_n[v] = 0.0f;
    in_degree[v] = 0;
  }
  {
    int64_t off = 0;
    for (int32_t i = 0; i < g; ++i) {
      // double-precision sqrt then round, bit-identical to numpy's
      // float32(np.sqrt(1.0/n)) in the reference collate math
      const float sn =
          (float)__builtin_sqrt(1.0 / (double)(n_nodes[i] > 0 ? n_nodes[i] : 1));
      for (int32_t v = 0; v < n_nodes[i]; ++v) {
        node_graph[off + v] = i;
        node_mask[off + v] = 1;
        snorm_n[off + v] = sn;
      }
      off += n_nodes[i];
    }
  }

  // globally-offset edges (unsorted), per-edge snorm
  std::vector<int32_t> gsrc(tot_e), gdst(tot_e);
  std::vector<float> esn(tot_e);
  {
    int64_t eo = 0, no = 0;
    for (int32_t i = 0; i < g; ++i) {
      const float se =
          (float)__builtin_sqrt(1.0 / (double)(n_edges[i] > 0 ? n_edges[i] : 1));
      for (int32_t e = 0; e < n_edges[i]; ++e) {
        gsrc[eo + e] = src_cat[eo + e] + (int32_t)no;
        gdst[eo + e] = dst_cat[eo + e] + (int32_t)no;
        esn[eo + e] = se;
      }
      eo += n_edges[i];
      no += n_nodes[i];
    }
  }

  // order: identity or two stable counting sorts -> lexicographic (dst, src)
  std::vector<int32_t> order(tot_e);
  for (int64_t e = 0; e < tot_e; ++e) order[e] = (int32_t)e;
  if (sort_edges && tot_e > 0) {
    std::vector<int32_t> tmp(tot_e);
    std::vector<int32_t> count((size_t)n_pad + 1, 0);
    // pass 1: by src
    for (int64_t e = 0; e < tot_e; ++e) count[gsrc[e] + 1]++;
    for (int64_t v = 0; v < n_pad; ++v) count[v + 1] += count[v];
    for (int64_t e = 0; e < tot_e; ++e) tmp[count[gsrc[order[e]]]++] = order[e];
    // pass 2: by dst (stable -> src order preserved within a dst)
    std::fill(count.begin(), count.end(), 0);
    for (int64_t e = 0; e < tot_e; ++e) count[gdst[e] + 1]++;
    for (int64_t v = 0; v < n_pad; ++v) count[v + 1] += count[v];
    for (int64_t e = 0; e < tot_e; ++e) order[count[gdst[tmp[e]]]++] = tmp[e];
  }

  for (int64_t s = 0; s < e_pad; ++s) {
    if (s < tot_e) {
      const int32_t e = order[s];
      src_out[s] = gsrc[e];
      dst_out[s] = gdst[e];
      perm_out[s] = e;
      edge_mask[s] = 1;
      snorm_e[s] = esn[e];
      in_degree[gdst[e]]++;
    } else {
      src_out[s] = 0;
      dst_out[s] = 0;
      perm_out[s] = -1;
      edge_mask[s] = 0;
      snorm_e[s] = 0.0f;
    }
  }
  return 0;
}

// Re-pack dst-sorted edges so each tile_n-node block owns whole e_chunk-edge
// chunks (the Pallas fused-kernel layout; mirrors build_block_layout in
// dgn_tpu/ops/pallas/segment_kernels.py but in one O(E + blocks) pass).
// Caller allocates perm/slot_valid/local_dst at worst case
//   cap = e_real_max + n_blocks*(e_chunk-1)  (rounded up to e_chunk)
// and chunk_block at cap/e_chunk.  Returns 0 on success; outputs actual
// packed length and chunk count.
int dgn_block_layout(const int32_t* dst, const uint8_t* edge_mask,
                     int64_t e_pad, int64_t n_pad, int32_t tile_n,
                     int32_t e_chunk, int64_t cap,
                     int32_t* perm, uint8_t* slot_valid, int32_t* local_dst,
                     int32_t* chunk_block, uint8_t* block_visited,
                     int64_t* e_packed_out, int64_t* n_chunks_out) {
  const int64_t n_blocks = (n_pad + tile_n - 1) / tile_n;
  std::vector<int64_t> bcount(n_blocks, 0);
  for (int64_t e = 0; e < e_pad; ++e)
    if (edge_mask[e]) bcount[dst[e] / tile_n]++;

  // padded sizes + offsets
  std::vector<int64_t> boff(n_blocks + 1, 0);
  for (int64_t b = 0; b < n_blocks; ++b) {
    int64_t padded =
        bcount[b] ? ((bcount[b] + e_chunk - 1) / e_chunk) * e_chunk : 0;
    boff[b + 1] = boff[b] + padded;
  }
  int64_t e_packed = boff[n_blocks];
  if (e_packed == 0) e_packed = e_chunk;  // degenerate: one masked chunk
  if (e_packed > cap) return 1;

  for (int64_t s = 0; s < e_packed; ++s) {
    perm[s] = 0;
    slot_valid[s] = 0;
    local_dst[s] = 0;
  }
  std::vector<int64_t> cursor(boff.begin(), boff.end() - 1);
  // dst-sorted input: edges of a block are contiguous, but walk generally
  for (int64_t e = 0; e < e_pad; ++e) {
    if (!edge_mask[e]) continue;
    const int64_t b = dst[e] / tile_n;
    const int64_t s = cursor[b]++;
    perm[s] = (int32_t)e;
    slot_valid[s] = 1;
    local_dst[s] = dst[e] - (int32_t)(b * tile_n);
  }
  const int64_t n_chunks = e_packed / e_chunk;
  for (int64_t b = 0; b < n_blocks; ++b) block_visited[b] = 0;
  if (boff[n_blocks] == 0) {
    chunk_block[0] = 0;
    block_visited[0] = 1;
  } else {
    for (int64_t b = 0; b < n_blocks; ++b) {
      for (int64_t c = boff[b] / e_chunk; c < boff[b + 1] / e_chunk; ++c) {
        chunk_block[c] = (int32_t)b;
        block_visited[b] = 1;
      }
    }
  }
  *e_packed_out = e_packed;
  *n_chunks_out = n_chunks;
  return 0;
}

}  // extern "C"
