// Native SpMM-plan builder for sagnn_tpu.
//
// Builds the chunk schedule consumed by ops/spmm_pallas.py (one-hot-matmul
// segment sum): target-sorted COO edges -> fixed-size chunks, each chunk's
// targets confined to one R-row output block, sources stable-sorted within a
// block for gather locality. Byte-identical to the Python planner
// (np.lexsort((src, tgt // R)) is stable; std::stable_sort over the
// block-contiguous ranges reproduces it exactly), ~50-100x faster — the
// Python loop costs ~10 s at 16M edges, which matters for the 100M-edge
// out-of-core configs (BASELINE.json config 5).
//
// C ABI consumed via ctypes (sagnn_tpu/ops/native_planner.py).
// Build: make -C sagnn_tpu/native (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

// number of chunks the schedule needs: one per C-edge piece of each block's
// edge run, plus one all-padding chunk per empty block.
int64_t count_chunks(const int32_t* tgt, int64_t num_edges, int32_t num_tgt,
                     int32_t R, int32_t C) {
  int64_t num_blocks = std::max<int64_t>(1, (num_tgt + R - 1) / R);
  int64_t chunks = 0;
  int64_t e = 0;
  for (int64_t b = 0; b < num_blocks; ++b) {
    int32_t hi = (int32_t)std::min<int64_t>((b + 1) * R, num_tgt);
    int64_t start = e;
    while (e < num_edges && tgt[e] < hi) ++e;
    int64_t n = e - start;
    chunks += n == 0 ? 1 : (n + C - 1) / C;
  }
  return chunks;
}

}  // namespace

extern "C" {

int64_t plan_count(const int32_t* tgt, int64_t num_edges, int32_t num_tgt,
                   int32_t R, int32_t C) {
  return count_chunks(tgt, num_edges, num_tgt, R, C);
}

// Fill the padded schedule arrays. num_chunks is the (already padded) chunk
// count; pad chunks point at the dump block with chunk_first=1. Returns the
// number of REAL chunks written, or -1 if num_chunks was too small.
//
// out_eslot (len num_chunks*C) is filled with edge ids (edge_ids[] if given,
// else the edge's position) when non-null; pad slots get pad_id.
int64_t plan_fill(const int32_t* src, const int32_t* tgt,
                  const int32_t* edge_ids,  // nullable
                  int64_t num_edges, int32_t num_tgt, int32_t R, int32_t C,
                  int64_t num_chunks, int32_t pad_id, int32_t sort_sources,
                  int32_t* out_src, int32_t* out_tl, int32_t* out_cb,
                  int32_t* out_cf, int32_t* out_eslot) {
  int64_t num_blocks = std::max<int64_t>(1, (num_tgt + R - 1) / R);

  // block boundaries (edges are target-sorted): bounds[b] = first edge with
  // tgt >= b*R
  std::vector<int64_t> bounds(num_blocks + 1);
  bounds[0] = 0;
#pragma omp parallel for schedule(static)
  for (int64_t b = 1; b <= num_blocks; ++b) {
    int32_t lo_tgt = (int32_t)std::min<int64_t>(b * R, num_tgt);
    bounds[b] = std::lower_bound(tgt, tgt + num_edges, lo_tgt) - tgt;
  }
  bounds[num_blocks] = num_edges;

  // per-block chunk offsets (prefix sum)
  std::vector<int64_t> chunk_at(num_blocks + 1);
  chunk_at[0] = 0;
  for (int64_t b = 0; b < num_blocks; ++b) {
    int64_t n = bounds[b + 1] - bounds[b];
    chunk_at[b + 1] = chunk_at[b] + (n == 0 ? 1 : (n + C - 1) / C);
  }
  int64_t real = chunk_at[num_blocks];
  if (real > num_chunks) return -1;

  // order[] = per-block stable sort of edge positions by source id
  std::vector<int64_t> order(num_edges);
  std::iota(order.begin(), order.end(), 0);

#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t b = 0; b < num_blocks; ++b) {
    int64_t start = bounds[b], end = bounds[b + 1];
    int64_t n = end - start;
    if (sort_sources && n > 1) {
      std::stable_sort(order.begin() + start, order.begin() + end,
                       [src](int64_t a, int64_t c) { return src[a] < src[c]; });
    }
    int64_t pieces = n == 0 ? 1 : (n + C - 1) / C;
    for (int64_t piece = 0; piece < pieces; ++piece) {
      int64_t chunk = chunk_at[b] + piece;
      int64_t lo = start + piece * C;
      int64_t cnt = n == 0 ? 0 : std::min<int64_t>(C, end - lo);
      int32_t* s_out = out_src + chunk * C;
      int32_t* t_out = out_tl + chunk * C;
      for (int64_t j = 0; j < cnt; ++j) {
        int64_t pos = order[lo + j];
        s_out[j] = src[pos];
        t_out[j] = tgt[pos] - (int32_t)(b * R);
      }
      for (int64_t j = cnt; j < C; ++j) {
        s_out[j] = 0;
        t_out[j] = R;
      }
      if (out_eslot) {
        int32_t* e_out = out_eslot + chunk * C;
        for (int64_t j = 0; j < cnt; ++j) {
          int64_t pos = order[lo + j];
          e_out[j] = edge_ids ? edge_ids[pos] : (int32_t)pos;
        }
        for (int64_t j = cnt; j < C; ++j) e_out[j] = pad_id;
      }
      out_cb[chunk] = (int32_t)b;
      out_cf[chunk] = piece == 0 ? 1 : 0;
    }
  }

  // pad chunks -> dump block
#pragma omp parallel for schedule(static)
  for (int64_t chunk = real; chunk < num_chunks; ++chunk) {
    std::fill(out_src + chunk * C, out_src + (chunk + 1) * C, 0);
    std::fill(out_tl + chunk * C, out_tl + (chunk + 1) * C, R);
    if (out_eslot)
      std::fill(out_eslot + chunk * C, out_eslot + (chunk + 1) * C, pad_id);
    out_cb[chunk] = (int32_t)num_blocks;
    out_cf[chunk] = 1;
  }
  return real;
}

}  // extern "C"
