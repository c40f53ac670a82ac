// Native host-side graph batcher for phc-gnn-tpu.
//
// The TPU input pipeline's host hot path: stable edge sorting by receiver,
// CSR row-pointer construction, and padded
// batch packing.  Replaces the per-batch Python/numpy loops (and stands in for
// the C-assisted PyG collation the reference leans on — SURVEY.md section 2.4)
// with O(E) C++ over preallocated numpy buffers, called via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC batcher.cpp -o libbatcher.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Stable argsort of receivers (counting sort: receivers < num_nodes).
// perm_out[e] = original index of the e-th edge in sorted order.
void sort_edges_by_receiver(const int32_t* receivers, int64_t num_edges,
                            int32_t num_nodes, int64_t* perm_out) {
  std::vector<int64_t> count(static_cast<size_t>(num_nodes) + 1, 0);
  for (int64_t i = 0; i < num_edges; ++i) count[receivers[i] + 1]++;
  std::partial_sum(count.begin(), count.end(), count.begin());
  for (int64_t i = 0; i < num_edges; ++i) {
    perm_out[count[receivers[i]]++] = i;
  }
}

// CSR row pointers from sorted receivers: rowptr has num_nodes+1 entries.
void build_csr_rowptr(const int32_t* recv_sorted, int64_t num_edges,
                      int32_t num_nodes, int64_t* rowptr_out) {
  std::memset(rowptr_out, 0, sizeof(int64_t) * (num_nodes + 1));
  for (int64_t i = 0; i < num_edges; ++i) rowptr_out[recv_sorted[i] + 1]++;
  for (int32_t n = 0; n < num_nodes; ++n) rowptr_out[n + 1] += rowptr_out[n];
}

// Pack a batch of graphs into padded buffers.
//
// Inputs are the concatenation of all graphs' arrays plus per-graph offsets:
//   node_feats  [total_nodes * fx]   (int32)
//   edge_feats  [total_edges * fe]   (int32)
//   senders / receivers [total_edges] (graph-local indices, int32)
//   node_offsets / edge_offsets [num_graphs + 1]
// Outputs (preallocated, padded):
//   out_nodes [num_nodes_pad * fx], out_edges [num_edges_pad * fe],
//   out_senders / out_receivers [num_edges_pad] (pad -> num_nodes_pad-1),
//   out_graph_ids [num_nodes_pad] (pad -> num_graphs_pad-1),
//   out_node_mask / out_edge_mask / out_graph_mask (uint8)
// Edges are emitted sorted by (global) receiver via counting sort.
// Returns 0 on success, -1 if the batch does not fit.
int32_t pack_batch(const int32_t* node_feats, const int32_t* edge_feats,
                   const int32_t* senders, const int32_t* receivers,
                   const int64_t* node_offsets, const int64_t* edge_offsets,
                   int32_t num_graphs, int32_t fx, int32_t fe,
                   int64_t num_nodes_pad, int64_t num_edges_pad,
                   int32_t num_graphs_pad,
                   int32_t* out_nodes, int32_t* out_edges,
                   int32_t* out_senders, int32_t* out_receivers,
                   int32_t* out_graph_ids, uint8_t* out_node_mask,
                   uint8_t* out_edge_mask, uint8_t* out_graph_mask) {
  const int64_t total_nodes = node_offsets[num_graphs];
  const int64_t total_edges = edge_offsets[num_graphs];
  if (total_nodes > num_nodes_pad - 1 || total_edges > num_edges_pad ||
      num_graphs > num_graphs_pad - 1) {
    return -1;
  }
  // nodes: straight copy + graph ids + mask
  std::memcpy(out_nodes, node_feats, sizeof(int32_t) * total_nodes * fx);
  std::memset(out_nodes + total_nodes * fx, 0,
              sizeof(int32_t) * (num_nodes_pad - total_nodes) * fx);
  for (int32_t g = 0; g < num_graphs; ++g) {
    for (int64_t n = node_offsets[g]; n < node_offsets[g + 1]; ++n) {
      out_graph_ids[n] = g;
      out_node_mask[n] = 1;
    }
  }
  for (int64_t n = total_nodes; n < num_nodes_pad; ++n) {
    out_graph_ids[n] = num_graphs_pad - 1;
    out_node_mask[n] = 0;
  }
  // globalize edge endpoints, then counting-sort by receiver
  std::vector<int32_t> g_send(total_edges), g_recv(total_edges);
  for (int32_t g = 0; g < num_graphs; ++g) {
    const int64_t off = node_offsets[g];
    for (int64_t e = edge_offsets[g]; e < edge_offsets[g + 1]; ++e) {
      g_send[e] = senders[e] + static_cast<int32_t>(off);
      g_recv[e] = receivers[e] + static_cast<int32_t>(off);
    }
  }
  std::vector<int64_t> perm(total_edges);
  sort_edges_by_receiver(g_recv.data(), total_edges,
                         static_cast<int32_t>(num_nodes_pad), perm.data());
  for (int64_t i = 0; i < total_edges; ++i) {
    const int64_t src = perm[i];
    out_senders[i] = g_send[src];
    out_receivers[i] = g_recv[src];
    out_edge_mask[i] = 1;
    std::memcpy(out_edges + i * fe, edge_feats + src * fe,
                sizeof(int32_t) * fe);
  }
  for (int64_t i = total_edges; i < num_edges_pad; ++i) {
    out_senders[i] = static_cast<int32_t>(num_nodes_pad - 1);
    out_receivers[i] = static_cast<int32_t>(num_nodes_pad - 1);
    out_edge_mask[i] = 0;
  }
  std::memset(out_edges + total_edges * fe, 0,
              sizeof(int32_t) * (num_edges_pad - total_edges) * fe);
  for (int32_t g = 0; g < num_graphs_pad; ++g) {
    out_graph_mask[g] = (g < num_graphs) ? 1 : 0;
  }
  return 0;
}

}  // extern "C"
