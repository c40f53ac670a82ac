"""Pallas TPU kernel: fused segment-softmax aggregation (the conv hot loop).

Softmax aggregation `out_n = sum_e softmax_e(beta*m)[e] * m_e` over edges sorted
by receiver costs ~7 passes over the [E, D] message array in the composite XLA
form (segment max, exp, two segment sums, two gathers, normalize) — measured at
~35 % of the whole train step.  This kernel fuses everything after the segment
max into ONE pass:

    per block:  Mg    = S^T @ M_tile          (max gather as MXU matmul)
                e     = exp(beta*m - Mg)      (VPU)
                acc  += S @ [e*m, e]          (numer & denom in one matmul)

with S the block's one-hot receiver matrix (see fused_segment.py for the
tile/block planning).  The segment max itself stays in XLA (one cheap pass,
stop-gradient).  The backward pass is closed-form in XLA (2 gathers +
elementwise):  dm = g[r] * w * (1 + beta*(m - y[r])),
               dbeta = sum g[r] * w * m * (m - y[r]).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phc_gnn_tpu.ops.fused_segment import SegmentPlan
from phc_gnn_tpu.utils import round_up

__all__ = ["fused_softmax_aggregate",
           "fused_softmax_aggregate_planned", "pad_plan_to"]


def pad_plan_to(plan: SegmentPlan, num_blocks: int) -> SegmentPlan:
    """Pad a plan to a fixed block count (shape-stable across batches of one
    bucket).  Padding blocks point at the last tile (consecutive revisit) with
    all-invalid slots, contributing zeros."""
    nb = plan.block_tile.shape[0]
    assert num_blocks >= nb, (num_blocks, nb)
    if num_blocks == nb:
        return plan
    extra = num_blocks - nb
    be = plan.block_edges
    return SegmentPlan(
        edge_perm=np.concatenate(
            [plan.edge_perm, np.full(extra * be, -1, np.int64)]),
        recv_local=np.concatenate(
            [plan.recv_local, np.full(extra * be, plan.tile_nodes - 1, np.int32)]),
        block_tile=np.concatenate(
            [plan.block_tile, np.full(extra, plan.num_tiles - 1, np.int32)]),
        block_first=np.concatenate([plan.block_first, np.zeros(extra, np.int32)]),
        tile_nodes=plan.tile_nodes, block_edges=plan.block_edges,
        num_tiles=plan.num_tiles)




def _auto_interpret(interpret: bool) -> bool:
    """Pallas TPU kernels only compile on TPU; interpret elsewhere (tests)."""
    return interpret or jax.default_backend() != "tpu"


def _kernel(block_tile_ref, block_first_ref, beta_ref, recv_ref, msgs_ref,
            segmax_ref, out_ref):
    b = pl.program_id(0)
    tn = segmax_ref.shape[0]
    be = msgs_ref.shape[0]
    d = msgs_ref.shape[1]
    beta = beta_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tn, be), 0)
    recv = recv_ref[b % 8, :]  # TN marks invalid slots -> all-zero column
    onehot = (rows == recv[None, :]).astype(jnp.float32)
    # max gather via MXU: [BE, TN] @ [TN, D]
    # M cancels exactly between numerator and denominator, so the max gather
    # can run at default MXU precision (1 pass instead of 3)
    mg = jax.lax.dot_general(
        onehot, segmax_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = msgs_ref[...]
    e = jnp.exp(beta * m - mg)
    contrib = jax.lax.dot_general(
        onehot, jnp.concatenate([e * m, e], axis=1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(block_first_ref[b] == 1)
    def _():
        out_ref[...] = contrib

    @pl.when(block_first_ref[b] == 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "tile_nodes", "block_edges",
                                    "num_tiles", "interpret"))
def _fused_call(msgs, beta, segmax, edge_perm, recv_valid, block_tile,
                block_first, num_nodes: int, tile_nodes: int, block_edges: int,
                num_tiles: int, interpret: bool = False):
    eb = edge_perm.shape[0]
    d = msgs.shape[1]
    d_pad = round_up(d, 128)
    if msgs.shape[0] == 0:
        gathered = jnp.zeros((eb, d_pad), jnp.float32)
    else:
        gathered = jnp.take(msgs, jnp.clip(edge_perm, 0, msgs.shape[0] - 1),
                            axis=0)
        gathered = jnp.where((edge_perm >= 0)[:, None], gathered, 0.0)
        if d_pad != d:
            gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d)))
    segmax_pad = jnp.zeros((num_tiles * tile_nodes, d_pad), jnp.float32)
    segmax_pad = segmax_pad.at[:num_nodes, :d].set(segmax)

    nb = block_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # block_tile, block_first, beta
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, block_edges), lambda b, bt, bf, be_: (b // 8, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, bt, bf, be_: (b, 0)),
            pl.BlockSpec((tile_nodes, d_pad), lambda b, bt, bf, be_: (bt[b], 0)),
        ],
        out_specs=pl.BlockSpec((tile_nodes, 2 * d_pad),
                               lambda b, bt, bf, be_: (bt[b], 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * tile_nodes, 2 * d_pad),
                                       jnp.float32),
        interpret=interpret,
    )(block_tile, block_first, jnp.asarray(beta, jnp.float32).reshape(1),
      recv_valid.reshape(nb, block_edges), gathered, segmax_pad)
    numer = out[:num_nodes, :d]
    denom = out[:num_nodes, d_pad:d_pad + d]
    return numer, denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_softmax(num_nodes, tile_nodes, block_edges, num_tiles, interpret,
                   msgs, beta, receivers, edge_mask,
                   edge_perm, recv_valid, block_tile, block_first):
    segmax = _masked_segmax(msgs, beta, receivers, edge_mask, num_nodes)
    numer, denom = _fused_call(
        _mask_msgs(msgs, edge_mask), beta, segmax, edge_perm, recv_valid,
        block_tile, block_first, num_nodes=num_nodes, tile_nodes=tile_nodes,
        block_edges=block_edges, num_tiles=num_tiles, interpret=interpret)
    return numer / jnp.maximum(denom, 1e-16)


def _mask_msgs(msgs, edge_mask):
    if edge_mask is None:
        return msgs
    return jnp.where(edge_mask[:, None], msgs, 0.0)


def _masked_segmax(msgs, beta, receivers, edge_mask, num_nodes):
    logits = beta * msgs
    if edge_mask is not None:
        logits = jnp.where(edge_mask[:, None], logits, -1e30)
    m = jax.ops.segment_max(jax.lax.stop_gradient(logits), receivers,
                            num_segments=num_nodes)
    return jnp.where(m <= -1e29, 0.0, m)


def _fused_fwd(num_nodes, tile_nodes, block_edges, num_tiles, interpret,
               msgs, beta, receivers, edge_mask,
               edge_perm, recv_valid, block_tile, block_first):
    segmax = _masked_segmax(msgs, beta, receivers, edge_mask, num_nodes)
    masked = _mask_msgs(msgs, edge_mask)
    numer, denom = _fused_call(
        masked, beta, segmax, edge_perm, recv_valid, block_tile, block_first,
        num_nodes=num_nodes, tile_nodes=tile_nodes, block_edges=block_edges,
        num_tiles=num_tiles, interpret=interpret)
    y = numer / jnp.maximum(denom, 1e-16)
    return y, (msgs, beta, receivers, edge_mask, segmax, denom, y)


def _softmax_bwd_core(msgs, beta, receivers, edge_mask, segmax, y, g,
                      num_nodes):
    """Closed-form backward shared by both fused paths.  The per-edge weight is
    recomputed with the exact segment max (the kernel's relaxed-precision max
    gather cancels in the forward ratio but its denominator is not reusable
    here), costing one extra exp + segment_sum pass."""
    m = _mask_msgs(msgs, edge_mask)
    mg = jnp.take(segmax, receivers, axis=0)
    e = jnp.exp(beta * m - mg)
    if edge_mask is not None:
        e = jnp.where(edge_mask[:, None], e, 0.0)
    denom = jax.ops.segment_sum(e, receivers, num_segments=num_nodes)
    w = e / jnp.take(jnp.maximum(denom, 1e-16), receivers, axis=0)
    gr = jnp.take(g, receivers, axis=0)
    yr = jnp.take(y, receivers, axis=0)
    grad_m = gr * w * (1.0 + beta * (m - yr))
    if edge_mask is not None:
        grad_m = jnp.where(edge_mask[:, None], grad_m, 0.0)
    grad_beta = jnp.sum(gr * w * m * (m - yr))
    return grad_m, grad_beta


def _fused_bwd(num_nodes, tile_nodes, block_edges, num_tiles, interpret,
               res, g):
    msgs, beta, receivers, edge_mask, segmax, denom, y = res
    grad_m, grad_beta = _softmax_bwd_core(msgs, beta, receivers, edge_mask,
                                          segmax, y, g, num_nodes)
    return (grad_m, grad_beta, None, None, None, None, None, None)


_fused_softmax.defvjp(_fused_fwd, _fused_bwd)


def fused_softmax_aggregate(msgs: jax.Array, beta, plan: SegmentPlan,
                            num_nodes: int, receivers: jax.Array,
                            edge_mask=None, interpret: bool = False):
    """Drop-in fused replacement for graph.aggregators.softmax_aggregate on
    receiver-sorted edges with a host-built SegmentPlan."""
    perm = jnp.asarray(plan.edge_perm)
    valid = perm >= 0
    if edge_mask is not None and msgs.shape[0] > 0:
        # masked (padding) edges must not contribute exp(0 - M) to the denom
        valid = valid & jnp.take(edge_mask, jnp.clip(perm, 0, msgs.shape[0] - 1))
    recv_valid = jnp.where(valid, jnp.asarray(plan.recv_local),
                           plan.tile_nodes)  # TN = invalid marker
    return _fused_softmax(
        num_nodes, plan.tile_nodes, plan.block_edges, plan.num_tiles,
        _auto_interpret(interpret), msgs, jnp.asarray(beta, jnp.float32), receivers, edge_mask,
        perm, recv_valid.astype(jnp.int32),
        jnp.asarray(plan.block_tile), jnp.asarray(plan.block_first))


# ---------------- plan-layout path (no runtime permutation) ----------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_softmax_planned(num_nodes, tile_nodes, block_edges, num_tiles,
                           interpret, msgs, beta, receivers, edge_mask,
                           recv_valid, block_tile, block_first):
    y, _ = _fused_planned_fwd_impl(
        num_nodes, tile_nodes, block_edges, num_tiles, interpret, msgs, beta,
        receivers, edge_mask, recv_valid, block_tile, block_first)
    return y


def _fused_planned_fwd_impl(num_nodes, tile_nodes, block_edges, num_tiles,
                            interpret, msgs, beta, receivers, edge_mask,
                            recv_valid, block_tile, block_first):
    segmax = _masked_segmax(msgs, beta, receivers, edge_mask, num_nodes)
    masked = _mask_msgs(msgs, edge_mask)
    d = msgs.shape[1]
    d_pad = round_up(d, 128)
    blocked = masked if d_pad == d else jnp.pad(masked,
                                                ((0, 0), (0, d_pad - d)))
    segmax_pad = jnp.zeros((num_tiles * tile_nodes, d_pad), jnp.float32)
    segmax_pad = segmax_pad.at[:num_nodes, :d].set(segmax)
    nb = block_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, block_edges), lambda b, bt, bf, be_: (b // 8, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, bt, bf, be_: (b, 0)),
            pl.BlockSpec((tile_nodes, d_pad), lambda b, bt, bf, be_: (bt[b], 0)),
        ],
        out_specs=pl.BlockSpec((tile_nodes, 2 * d_pad),
                               lambda b, bt, bf, be_: (bt[b], 0)),
    )
    out = pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * tile_nodes, 2 * d_pad),
                                       jnp.float32),
        interpret=interpret,
    )(block_tile, block_first, jnp.asarray(beta, jnp.float32).reshape(1),
      recv_valid.reshape(nb, block_edges), blocked, segmax_pad)
    numer = out[:num_nodes, :d]
    denom = jnp.maximum(out[:num_nodes, d_pad:d_pad + d], 1e-16)
    y = numer / denom
    return y, (segmax, denom)


def _fused_planned_fwd(num_nodes, tile_nodes, block_edges, num_tiles,
                       interpret, msgs, beta, receivers, edge_mask,
                       recv_valid, block_tile, block_first):
    y, (segmax, denom) = _fused_planned_fwd_impl(
        num_nodes, tile_nodes, block_edges, num_tiles, interpret, msgs, beta,
        receivers, edge_mask, recv_valid, block_tile, block_first)
    return y, (msgs, beta, receivers, edge_mask, segmax, denom, y)


def _fused_planned_bwd(num_nodes, tile_nodes, block_edges, num_tiles,
                       interpret, res, g):
    msgs, beta, receivers, edge_mask, segmax, denom, y = res
    grad_m, grad_beta = _softmax_bwd_core(msgs, beta, receivers, edge_mask,
                                          segmax, y, g, num_nodes)
    return (grad_m, grad_beta, None, None, None, None, None)


_fused_softmax_planned.defvjp(_fused_planned_fwd, _fused_planned_bwd)


def fused_softmax_aggregate_planned(msgs: jax.Array, beta, recv_local,
                                    block_tile, block_first, num_nodes: int,
                                    tile_nodes: int, receivers: jax.Array,
                                    edge_mask=None, interpret: bool = False):
    """Fused softmax aggregation over edges ALREADY in plan layout (see
    GraphsTuple.recv_local; data/loader.py plan_layout).  No runtime
    permutation — the batcher laid the edges out tile-blocked."""
    num_tiles = num_nodes // tile_nodes
    block_edges = msgs.shape[0] // block_tile.shape[0]
    return _fused_softmax_planned(
        num_nodes, tile_nodes, block_edges, num_tiles,
        _auto_interpret(interpret),
        msgs, jnp.asarray(beta, jnp.float32), receivers, edge_mask,
        recv_local.astype(jnp.int32), block_tile, block_first)
