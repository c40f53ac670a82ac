"""Pallas TPU kernel: sorted-segment reduction as block-diagonal one-hot matmul.

The GNN aggregation hot loop — scatter-add of E edge messages into N node rows —
maps poorly onto the TPU's dense tiles if done as a generic scatter.  With edges
pre-sorted by receiver (our batcher guarantees it, graph/batch.py), the edge
stream decomposes into *node tiles*: each block of BE edges writes into one
TN-row output tile.  Inside the kernel the block's contribution is computed as

    out_tile += S @ msgs_block,      S[t, e] = 1 iff recv_local[e] == t

an (TN x BE) x (BE x D) matmul that rides the MXU while the streaming of
``msgs`` from HBM stays the bandwidth bottleneck — i.e. the reduction runs at
speed-of-light memory bandwidth with zero scatter serialization.

Host-side planning (numpy; destined for the C++ batcher) splits the sorted edge
list at node-tile boundaries and pads each tile's edge range to a multiple of
BE, so the device work is fully static.  Multiple blocks of one tile accumulate
across sequential grid steps (Pallas keeps the revisited output tile in VMEM);
``block_first`` selects init-vs-accumulate.

Replaces torch_scatter's CUDA segment kernels (SURVEY.md section 2.4) for the
sum / softmax-weighted-sum paths.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.utils import round_up
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["SegmentPlan", "build_segment_plan", "segment_sum_sorted",
           "DEFAULT_TILE_NODES", "DEFAULT_BLOCK_EDGES"]

DEFAULT_TILE_NODES = 256   # TN: node rows per output tile
DEFAULT_BLOCK_EDGES = 256  # BE: edges per block (MXU-friendly)


class SegmentPlan(NamedTuple):
    """Static per-batch plan (host-built, shipped once per bucket shape)."""

    edge_perm: np.ndarray    # [EB] gather index into the edge arrays (-1 = pad)
    recv_local: np.ndarray   # [EB] receiver row within the tile (TN-1 for pad)
    block_tile: np.ndarray   # [NB] node-tile index per block
    block_first: np.ndarray  # [NB] 1 if first block of its tile
    tile_nodes: int
    block_edges: int
    num_tiles: int


def build_segment_plan(receivers: np.ndarray, num_nodes: int,
                       tile_nodes: int = DEFAULT_TILE_NODES,
                       block_edges: int = DEFAULT_BLOCK_EDGES) -> SegmentPlan:
    """Plan for a receiver array sorted ascending.  Every tile gets >= 1 block
    (so all output rows are written).  Padding slots get edge_perm = -1 and
    recv_local pointing at the tile's last row with zero contribution (the
    wrapper zeroes their messages)."""
    receivers = np.asarray(receivers)
    assert num_nodes % tile_nodes == 0, (num_nodes, tile_nodes)
    num_tiles = num_nodes // tile_nodes
    bounds = np.searchsorted(receivers, np.arange(0, num_nodes + 1, tile_nodes))
    perm, recvl, btile, bfirst = [], [], [], []
    for t in range(num_tiles):
        lo, hi = int(bounds[t]), int(bounds[t + 1])
        cnt = hi - lo
        nblocks = max(1, -(-cnt // block_edges))
        padded = nblocks * block_edges
        idx = np.full(padded, -1, np.int64)
        idx[:cnt] = np.arange(lo, hi)
        rl = np.full(padded, tile_nodes - 1, np.int32)
        rl[:cnt] = receivers[lo:hi] - t * tile_nodes
        perm.append(idx)
        recvl.append(rl)
        btile.extend([t] * nblocks)
        bfirst.extend([1] + [0] * (nblocks - 1))
    return SegmentPlan(
        edge_perm=np.concatenate(perm),
        recv_local=np.concatenate(recvl),
        block_tile=np.asarray(btile, np.int32),
        block_first=np.asarray(bfirst, np.int32),
        tile_nodes=tile_nodes, block_edges=block_edges, num_tiles=num_tiles)


def _kernel(block_tile_ref, block_first_ref, recv_ref, msgs_ref, out_ref):
    b = pl.program_id(0)
    tn = out_ref.shape[0]
    be = msgs_ref.shape[0]
    # one-hot S: [TN, BE]; recv block holds 8 rows (TPU sublane tiling), row
    # b % 8 belongs to this grid step
    rows = jax.lax.broadcasted_iota(jnp.int32, (tn, be), 0)
    onehot = (rows == recv_ref[b % 8, :][None, :]).astype(msgs_ref.dtype)
    contrib = jax.lax.dot_general(
        onehot, msgs_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact f32: no bf16 input rounding
    ).astype(out_ref.dtype)

    @pl.when(block_first_ref[b] == 1)
    def _():
        out_ref[...] = contrib

    @pl.when(block_first_ref[b] == 0)
    def _():
        out_ref[...] = out_ref[...] + contrib



@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "tile_nodes", "block_edges",
                                    "num_tiles", "interpret"))
def _segment_sum_call(msgs, edge_perm, recv_local, block_tile, block_first,
                      num_nodes: int, tile_nodes: int, block_edges: int,
                      num_tiles: int, interpret: bool = False):
    eb = edge_perm.shape[0]
    d = msgs.shape[1]
    d_pad = round_up(d, 128)
    # permute messages into block order; pad slots (-1) become zero rows
    if msgs.shape[0] == 0:
        gathered = jnp.zeros((eb, d), msgs.dtype)
    else:
        gathered = jnp.take(msgs, jnp.clip(edge_perm, 0, msgs.shape[0] - 1),
                            axis=0)
        gathered = jnp.where((edge_perm >= 0)[:, None], gathered, 0.0)
    if d_pad != d:
        gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d)))

    nb = block_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_tile, block_first
        grid=(nb,),
        in_specs=[
            # 8-row blocks to satisfy TPU sublane tiling; kernel picks b % 8
            pl.BlockSpec((8, block_edges), lambda b, bt, bf: (b // 8, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, bt, bf: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tile_nodes, d_pad),
                               lambda b, bt, bf: (bt[b], 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * tile_nodes, d_pad),
                                       msgs.dtype),
        interpret=interpret,
    )(block_tile, block_first, recv_local.reshape(nb, block_edges), gathered)
    return out[:num_nodes, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _seg_sum(num_nodes, tile_nodes, block_edges, num_tiles, interpret,
             msgs, edge_perm, recv_local, slot_recv, block_tile, block_first):
    return _segment_sum_call(msgs, edge_perm, recv_local, block_tile,
                             block_first, num_nodes=num_nodes,
                             tile_nodes=tile_nodes, block_edges=block_edges,
                             num_tiles=num_tiles, interpret=interpret)


def _seg_sum_fwd(num_nodes, tile_nodes, block_edges, num_tiles, interpret,
                 msgs, edge_perm, recv_local, slot_recv, block_tile,
                 block_first):
    out = _seg_sum(num_nodes, tile_nodes, block_edges, num_tiles, interpret,
                   msgs, edge_perm, recv_local, slot_recv, block_tile,
                   block_first)
    return out, (edge_perm, slot_recv, msgs.shape[0])


def _seg_sum_bwd(num_nodes, tile_nodes, block_edges, num_tiles, interpret,
                 res, g):
    edge_perm, slot_recv, num_edges = res
    if num_edges == 0:
        grad = jnp.zeros((0, g.shape[1]), g.dtype)
    else:
        # d/d msgs of (S @ msgs) is the gather g[receiver] routed back through
        # the block permutation
        rows = jnp.take(g, jnp.clip(slot_recv, 0, num_nodes - 1), axis=0)
        valid = edge_perm >= 0
        rows = jnp.where(valid[:, None], rows, 0.0)
        grad = jnp.zeros((num_edges, g.shape[1]), g.dtype).at[
            jnp.clip(edge_perm, 0, num_edges - 1)].add(rows)
    return (grad, None, None, None, None, None)


_seg_sum.defvjp(_seg_sum_fwd, _seg_sum_bwd)


def segment_sum_sorted(msgs: jax.Array, plan: SegmentPlan, num_nodes: int,
                       edge_mask: jax.Array | None = None,
                       interpret: bool = False) -> jax.Array:
    """Segment-sum of ``msgs`` [E, D] into [num_nodes, D] using a host-built
    plan for the (sorted) receiver array.  Exact replacement for
    jax.ops.segment_sum on sorted ids, differentiable (custom VJP = gather).
    Interpret mode is forced automatically off-TPU."""
    interpret = interpret or jax.default_backend() != "tpu"
    if edge_mask is not None:
        msgs = jnp.where(edge_mask[:, None], msgs, 0.0)
    slot_recv = (plan.block_tile.repeat(plan.block_edges) * plan.tile_nodes
                 + plan.recv_local)
    return _seg_sum(num_nodes, plan.tile_nodes, plan.block_edges,
                    plan.num_tiles, interpret, msgs,
                    jnp.asarray(plan.edge_perm), jnp.asarray(plan.recv_local),
                    jnp.asarray(slot_recv), jnp.asarray(plan.block_tile),
                    jnp.asarray(plan.block_first))
