"""Statically padded edge-list graph batches (the TPU-native Batch).

The reference relies on PyG's dynamic-shape `Batch` collation (C-assisted host
code); on TPU everything under jit needs static shapes, so a batch of disjoint
graphs is padded to fixed ``(num_nodes, num_edges, num_graphs)`` bucket sizes:

- padding *nodes* live at the tail, assigned to the padding graph (the last
  graph slot) with ``node_mask=False``;
- padding *edges* point sender/receiver at the last (padding) node with
  ``edge_mask=False`` — their messages are masked before any segment reduce;
- padding *graphs* carry ``graph_mask=False`` and zero labels.

Replaces PyG Batch/DataLoader collation (reference: train scripts e.g.
benchmarks/train_hiv.py:488-493) per SURVEY.md section 2.4.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["GraphsTuple", "pad_graph_batch", "batch_graphs"]


@struct.dataclass
class GraphsTuple:
    """A padded batch of disjoint graphs, jit-stable.

    Edge arrays are receiver-sorted (batch_graphs / the native packer
    guarantee it); the optional scan-plan fields feed the streaming
    segmented-scan kernels (ops/stream_scan.py).
    """

    nodes: jax.Array      # [N_pad, ...] node features (int categorical or float)
    edges: jax.Array      # [E_pad, ...] edge features
    senders: jax.Array    # [E_pad] int32 source node index
    receivers: jax.Array  # [E_pad] int32 destination node index
    graph_ids: jax.Array  # [N_pad] int32 node -> graph index
    node_mask: jax.Array  # [N_pad] bool
    edge_mask: jax.Array  # [E_pad] bool
    graph_mask: jax.Array  # [G_pad] bool
    y: Optional[jax.Array] = None  # [G_pad, target_dim] labels (NaN = missing)
    # streaming-scan plan (optional; ops/stream_scan.py — requires edges
    # sorted by receiver, which batch_graphs/the native packer guarantee)
    scan_flags: Optional[jax.Array] = None   # [EB, 2*log2(B)+2] f32 packed scan gates
    scan_cont: Optional[jax.Array] = None    # [NB] i32 block continuation bits
    last_edge: Optional[jax.Array] = None    # [N_pad] i32 last edge per node (-1 none)
    # node-sharded halo plan (parallel/halo.py): per-shard send lists; when
    # set, ``senders`` index the augmented [NS + S*H] local+halo feature array
    # and ``receivers`` are shard-local
    halo_send: Optional[jax.Array] = None    # [S, H] i32 local rows per peer
    # sender-sorted plan (ops/stream_scan.py build_sender_plan): turns the
    # message gather's backward scatter dx[senders] += g into a streamed
    # segment-sum over sorted senders (the >=16k gather-locality fix)
    snd_perm: Optional[jax.Array] = None     # [E_pad] i32 sort-by-sender perm
    snd_flags: Optional[jax.Array] = None    # [EB, 2*log2(B)+2] f32 packed scan gates
    snd_cont: Optional[jax.Array] = None     # [NB] i32 continuation bits
    snd_last: Optional[jax.Array] = None     # [N_src] i32 last sorted edge/-1

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    def count_nodes(self) -> jax.Array:
        return jnp.sum(self.node_mask)

    def count_edges(self) -> jax.Array:
        return jnp.sum(self.edge_mask)

    def count_graphs(self) -> jax.Array:
        return jnp.sum(self.graph_mask)


def batch_graphs(
    graphs: Sequence[dict],
    num_nodes: int,
    num_edges: int,
    num_graphs: int,
    y_shape: Optional[tuple] = None,
    node_dtype=None,
    edge_dtype=None,
    sort_edges_by_receiver: bool = True,
) -> GraphsTuple:
    """Host-side collation of per-graph dicts into one padded GraphsTuple.

    Each graph dict: {"x": [n, Fx], "edge_index": [2, e] (senders; receivers),
    "edge_attr": [e, Fe], "y": [target]}.  Edges are optionally sorted by
    receiver so downstream fused kernels see quasi-contiguous segments.
    Padding edges attach to the last node slot; padding nodes to the last graph.
    """
    assert len(graphs) <= num_graphs - 1 or all(
        g["x"].shape[0] > 0 for g in graphs
    ), "reserve one padding graph slot"
    total_n = sum(int(g["x"].shape[0]) for g in graphs)
    total_e = sum(int(g["edge_index"].shape[1]) for g in graphs)
    if total_n > num_nodes - 1 or total_e > num_edges or len(graphs) > num_graphs - 1:
        raise ValueError(
            f"batch does not fit bucket: nodes {total_n}/{num_nodes - 1}, "
            f"edges {total_e}/{num_edges}, graphs {len(graphs)}/{num_graphs - 1}")

    fx = graphs[0]["x"].shape[1:] if graphs[0]["x"].ndim > 1 else ()
    fe = graphs[0]["edge_attr"].shape[1:] if graphs[0]["edge_attr"].ndim > 1 else ()

    def _feat_dtype(explicit, arr):
        # infer: keep integer features int32, continuous features float32 —
        # an int default would silently floor float features to zero
        if explicit is not None:
            return explicit
        return (np.int32 if np.issubdtype(np.asarray(arr).dtype, np.integer)
                else np.float32)

    node_dtype = _feat_dtype(node_dtype, graphs[0]["x"])
    edge_dtype = _feat_dtype(edge_dtype, graphs[0]["edge_attr"])
    nodes = np.zeros((num_nodes,) + fx, dtype=node_dtype)
    edges = np.zeros((num_edges,) + fe, dtype=edge_dtype)
    senders = np.full((num_edges,), num_nodes - 1, dtype=np.int32)
    receivers = np.full((num_edges,), num_nodes - 1, dtype=np.int32)
    graph_ids = np.full((num_nodes,), num_graphs - 1, dtype=np.int32)
    node_mask = np.zeros((num_nodes,), dtype=bool)
    edge_mask = np.zeros((num_edges,), dtype=bool)
    graph_mask = np.zeros((num_graphs,), dtype=bool)

    y = None
    if y_shape is not None:
        y = np.full((num_graphs,) + tuple(y_shape), np.nan, dtype=np.float32)

    n_off = e_off = 0
    for gi, g in enumerate(graphs):
        n, e = int(g["x"].shape[0]), int(g["edge_index"].shape[1])
        nodes[n_off:n_off + n] = g["x"]
        graph_ids[n_off:n_off + n] = gi
        node_mask[n_off:n_off + n] = True
        if e:
            edges[e_off:e_off + e] = g["edge_attr"]
            senders[e_off:e_off + e] = g["edge_index"][0] + n_off
            receivers[e_off:e_off + e] = g["edge_index"][1] + n_off
            edge_mask[e_off:e_off + e] = True
        graph_mask[gi] = True
        if y is not None and g.get("y") is not None:
            y[gi] = np.asarray(g["y"], dtype=np.float32).reshape(y_shape)
        n_off += n
        e_off += e

    if sort_edges_by_receiver:
        order = np.argsort(receivers, kind="stable")
        edges, senders, receivers, edge_mask = (
            edges[order], senders[order], receivers[order], edge_mask[order])

    return GraphsTuple(
        nodes=jnp.asarray(nodes), edges=jnp.asarray(edges),
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        graph_ids=jnp.asarray(graph_ids),
        node_mask=jnp.asarray(node_mask), edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        y=jnp.asarray(y) if y is not None else None)


def pad_graph_batch(batch: GraphsTuple, num_nodes: int, num_edges: int,
                    num_graphs: int) -> GraphsTuple:
    """Pad an existing GraphsTuple up to larger static sizes (bucket promote)."""
    def pad_to(arr, size, fill=0):
        pad = size - arr.shape[0]
        if pad <= 0:
            return arr
        cfg = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, cfg, constant_values=fill)

    # scan-plan fields do not survive re-padding; drop them
    return GraphsTuple(
        nodes=pad_to(batch.nodes, num_nodes),
        edges=pad_to(batch.edges, num_edges),
        senders=pad_to(batch.senders, num_edges, num_nodes - 1),
        receivers=pad_to(batch.receivers, num_edges, num_nodes - 1),
        graph_ids=pad_to(batch.graph_ids, num_nodes, num_graphs - 1),
        node_mask=pad_to(batch.node_mask, num_nodes, False),
        edge_mask=pad_to(batch.edge_mask, num_edges, False),
        graph_mask=pad_to(batch.graph_mask, num_graphs, False),
        y=pad_to(batch.y, num_graphs, np.nan) if batch.y is not None else None)
