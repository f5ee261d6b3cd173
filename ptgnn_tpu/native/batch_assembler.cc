// Native batch assembler: the hot host-side loop of GraphBatcher.finalize
// (graph/batching.py) in C++.
//
// Builds the unified (receiver row block, edge type, receiver)-sorted edge
// layout with (block, type) segments padded to tile multiples, in one pass:
// counting sort by (block, type) key + within-bucket receiver sort. Exposed
// through a plain C ABI for ctypes (no pybind11 dependency).
//
// The Python reference implementation stays as the fallback and as the
// correctness oracle (tests/test_native_assembler.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Returns 0 on success, negative error codes otherwise.
//   -1: edge budget exceeded
// Inputs:
//   senders/receivers/types: [num_edges] raw (already offset) edge arrays
//   num_edges, num_nodes(real), max_nodes, e_pad, tile, agg_rows, num_types
// Outputs (caller-allocated):
//   out_senders[e_pad], out_receivers[e_pad], out_types[e_pad],
//   out_local_rows[e_pad], out_mask[e_pad] (uint8),
//   out_tile_types[e_pad/tile], out_tile_row_blocks[e_pad/tile],
//   out_counts[num_row_blocks * agg_rows]
int assemble_edge_layout_v3(
    const int32_t* senders, const int32_t* receivers, const int32_t* types,
    const int32_t* payload,  // per-edge auxiliary ids carried through the sort
    int64_t num_edges, int32_t max_nodes, int64_t e_pad, int32_t tile,
    int32_t agg_rows, int32_t num_types,
    int32_t align,  // supertile alignment of each block's slot run (>= tile)
    int32_t* out_senders, int32_t* out_receivers, int32_t* out_types,
    int32_t* out_local_rows, uint8_t* out_mask, int32_t* out_tile_types,
    int32_t* out_tile_row_blocks, int32_t* out_counts, int32_t* out_payload) {
  const int32_t num_blocks = (max_nodes + agg_rows - 1) / agg_rows;
  const int64_t n_tiles = e_pad / tile;
  const int64_t num_buckets = static_cast<int64_t>(num_blocks) * num_types;

  // Bucket = block * num_types + type. Counting sort.
  std::vector<int64_t> bucket_count(num_buckets, 0);
  std::vector<int32_t> edge_bucket(num_edges);
  for (int64_t i = 0; i < num_edges; ++i) {
    const int32_t b = receivers[i] / agg_rows;
    edge_bucket[i] = b * num_types + types[i];
    ++bucket_count[edge_bucket[i]];
  }

  // Slot offsets: walk blocks in order; each nonempty bucket padded to a
  // tile multiple; empty blocks get one all-padding tile.
  std::vector<int64_t> bucket_offset(num_buckets, -1);
  if (align < tile) align = tile;
  int64_t cursor = 0;
  int64_t tile_cursor = 0;
  for (int32_t b = 0; b < num_blocks; ++b) {
    const int64_t block_start = cursor;
    for (int32_t t = 0; t < num_types; ++t) {
      const int64_t k = static_cast<int64_t>(b) * num_types + t;
      if (bucket_count[k] == 0) continue;
      bucket_offset[k] = cursor;
      const int64_t seg = ((bucket_count[k] + tile - 1) / tile) * tile;
      if (cursor + seg > e_pad) return -1;
      const int64_t seg_tiles = seg / tile;
      for (int64_t j = 0; j < seg_tiles; ++j) {
        out_tile_types[tile_cursor + j] = t;
        out_tile_row_blocks[tile_cursor + j] = b;
      }
      // type id fills the padded tail of the segment too (tile purity)
      for (int64_t j = 0; j < seg; ++j) out_types[cursor + j] = t;
      cursor += seg;
      tile_cursor += seg_tiles;
    }
    // Pad the block's run to the supertile alignment; empty blocks get one
    // full aligned run so their output block initializes (mirrors
    // graph/batching.py's aligned layout).
    int64_t run = cursor - block_start;
    if (run < 1) run = 1;
    const int64_t target = block_start + ((run + align - 1) / align) * align;
    if (target > e_pad) return -1;
    while (cursor < target) {
      out_tile_types[tile_cursor] = 0;
      out_tile_row_blocks[tile_cursor] = b;
      cursor += tile;
      ++tile_cursor;
    }
  }
  for (int64_t j = tile_cursor; j < n_tiles; ++j) {
    out_tile_types[j] = 0;
    out_tile_row_blocks[j] = num_blocks - 1;
  }

  // Defaults for padding slots.
  std::memset(out_senders, 0, sizeof(int32_t) * e_pad);
  for (int64_t i = 0; i < e_pad; ++i) out_receivers[i] = max_nodes;
  for (int64_t i = 0; i < e_pad; ++i) out_local_rows[i] = agg_rows;
  for (int64_t i = 0; i < e_pad; ++i) out_payload[i] = -1;
  std::memset(out_mask, 0, e_pad);

  // Scatter edges into their buckets (stable within input order), then sort
  // each bucket's slice by receiver.
  std::vector<int64_t> fill(num_buckets, 0);
  for (int64_t i = 0; i < num_edges; ++i) {
    const int64_t k = edge_bucket[i];
    const int64_t pos = bucket_offset[k] + fill[k]++;
    out_senders[pos] = senders[i];
    out_receivers[pos] = receivers[i];
    out_payload[pos] = payload[i];
    out_mask[pos] = 1;
  }
  for (int64_t k = 0; k < num_buckets; ++k) {
    if (bucket_count[k] == 0) continue;
    const int64_t s0 = bucket_offset[k];
    const int64_t s1 = s0 + bucket_count[k];
    // sort (receiver, sender, payload) triples of the slice by receiver
    struct Rec { int32_t recv, send, pay; };
    std::vector<Rec> tmp(bucket_count[k]);
    for (int64_t i = s0; i < s1; ++i)
      tmp[i - s0] = {out_receivers[i], out_senders[i], out_payload[i]};
    std::stable_sort(tmp.begin(), tmp.end(),
                     [](const Rec& a, const Rec& b) { return a.recv < b.recv; });
    const int32_t block_base = (k / num_types) * agg_rows;
    for (int64_t i = s0; i < s1; ++i) {
      out_receivers[i] = tmp[i - s0].recv;
      out_senders[i] = tmp[i - s0].send;
      out_payload[i] = tmp[i - s0].pay;
      out_local_rows[i] = tmp[i - s0].recv - block_base;
    }
  }

  // In-degree counts.
  std::memset(out_counts, 0, sizeof(int32_t) * num_blocks * agg_rows);
  for (int64_t i = 0; i < num_edges; ++i) ++out_counts[receivers[i]];
  return 0;
}

}  // extern "C"
