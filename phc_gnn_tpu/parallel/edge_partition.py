"""Edge-partitioned model parallelism (the graph analogue of sequence parallel).

One giant padded batch's *edge set* is partitioned across the ``ep`` mesh axis:
each chip owns an equal edge shard (edge features, senders, receivers, mask)
while node arrays are replicated.  Every conv's segment reduction produces a
partial node aggregate from the local edge shard, combined exactly across chips
by the collectives built into phc_gnn_tpu.graph.segment (psum / pmax / pmin,
including the two-pass distributed segment softmax).  Parameters and node
compute are replicated.  Gradients: each shard's raw grad is ep_size x (its own
edge shard's contribution) — the forward psum transposes to a psum under
check_vma=False — so the train steps pmean over ep to recover the exact total
gradient (see make_ep_train_step).

This is the BASELINE.json north-star scheme (boundary information exchanged
over ICI, overlapped with local aggregation by XLA's latency-hiding scheduler).
Combine with dp: mesh (dp, ep) — batches sharded over dp, each batch's edges
over ep.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from phc_gnn_tpu.graph.batch import GraphsTuple
from phc_gnn_tpu.parallel.dp import loss_weight, weighted_mean
from phc_gnn_tpu.train.state import TrainState, apply_optimizer, make_loss_and_aux

__all__ = ["partition_edges", "make_ep_train_step", "make_ep_eval_step",
           "edge_partition_specs", "make_dp_ep_train_step",
           "make_dp_ep_eval_step", "make_dp_ep_batch_specs"]


def partition_edges(batch: GraphsTuple, num_shards: int) -> GraphsTuple:
    """Round the edge arrays up to a multiple of num_shards (padding edges
    attach to the last node with mask False).  Shard-ready: shard_map splits the
    leading edge axis evenly."""
    # scan-plan fields are single-chip structures; strip them
    # (the generic segment ops with collectives handle the sharded path)
    if batch.scan_flags is not None:
        batch = batch.replace(scan_flags=None, scan_cont=None, last_edge=None)
    e = batch.num_edges
    target = ((e + num_shards - 1) // num_shards) * num_shards
    if target == e:
        return batch
    pad = target - e

    def pad_edges(arr, fill):
        cfg = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, cfg, constant_values=fill)

    return batch.replace(
        edges=pad_edges(batch.edges, 0),
        senders=pad_edges(batch.senders, batch.num_nodes - 1),
        receivers=pad_edges(batch.receivers, batch.num_nodes - 1),
        edge_mask=pad_edges(batch.edge_mask, False))


def edge_partition_specs(has_y: bool = True) -> GraphsTuple:
    """PartitionSpecs for a GraphsTuple with edges sharded over ``ep``.
    Pass has_y=False for unlabeled batches (y=None) so the spec tree matches."""
    return GraphsTuple(
        nodes=P(), edges=P("ep"), senders=P("ep"), receivers=P("ep"),
        graph_ids=P(), node_mask=P(), edge_mask=P("ep"), graph_mask=P(),
        y=P() if has_y else None)


def _jit_y_dispatch(device_step, mesh, specs_fn, donate: bool,
                    out_spec=P()):
    """shard_map a device step twice (labeled / unlabeled batch specs) and
    dispatch on batch.y at trace time — shared by the ep and dp_ep steps.
    ``out_spec`` is the spec of the model-output slot (P() replicated for ep,
    P('dp') stacked for dp_ep)."""
    step_y = shard_map(device_step, mesh=mesh,
                       in_specs=(P(), specs_fn(True), P()),
                       out_specs=(P(), P(), out_spec), check_vma=False)
    step_no_y = shard_map(device_step, mesh=mesh,
                          in_specs=(P(), specs_fn(False), P()),
                          out_specs=(P(), P(), out_spec), check_vma=False)

    def dispatch(state, batch, lr):
        step = step_y if batch.y is not None else step_no_y
        return step(state, batch, lr)

    return jax.jit(dispatch, donate_argnums=(0,) if donate else ())


def make_ep_train_step(model, tx, loss_fn: Callable, mesh: Mesh,
                       weight_decay: float = 0.0, weight_decay2: float = 0.0,
                       reg_p: int = 2, donate: bool = True):
    """Jitted edge-partitioned train step: params replicated, edges sharded
    over ``ep``.  The model must be built with ``edge_axis='ep'``."""

    def device_step(state: TrainState, batch: GraphsTuple, lr: jax.Array):
        rng = jax.random.fold_in(state.rng, state.step)
        # identical rng on all ep shards — replicated node compute must agree
        loss_and_aux = make_loss_and_aux(
            model, loss_fn, weight_decay, weight_decay2, reg_p,
            state.batch_stats, batch, rng, lr)
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        # This pmean is LOAD-BEARING, not defensive.  Under check_vma=False the
        # transpose of the forward psum (graph/segment.py collectives) is again
        # a psum, so each shard's raw grad equals ep_size x (its own edge
        # shard's contribution) — asymmetric across shards.  pmean = (1/S) x
        # Sum_i S x partial_i = the exact total gradient.  Pinned by
        # tests/test_parallel.py::test_ep_pmean_grads_equal_single_device,
        # which also witnesses that raw per-shard grads DIFFER.
        grads = jax.lax.pmean(grads, "ep")
        new_params, new_opt_state = apply_optimizer(tx, grads, state, lr)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state, step=state.step + 1)
        return new_state, loss, out

    return _jit_y_dispatch(device_step, mesh, edge_partition_specs, donate)


def _jit_eval_y_dispatch(device_step, mesh, specs_fn, out_spec=P()):
    """Eval twin of _jit_y_dispatch: no lr arg, no state update, no donation."""
    step_y = shard_map(device_step, mesh=mesh,
                       in_specs=(P(), specs_fn(True)),
                       out_specs=out_spec, check_vma=False)
    step_no_y = shard_map(device_step, mesh=mesh,
                          in_specs=(P(), specs_fn(False)),
                          out_specs=out_spec, check_vma=False)

    def dispatch(state, batch):
        step = step_y if batch.y is not None else step_no_y
        return step(state, batch)

    return jax.jit(dispatch)


def make_ep_eval_step(model, mesh: Mesh):
    """Edge-partitioned eval over ``ep``: node compute replicated, segment
    reductions combine the local edge shards via the collectives inside
    graph/segment.py; output identical on every shard.  The model must be
    built with ``edge_axis='ep'``."""

    def device_step(state: TrainState, batch: GraphsTuple):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, training=False)

    return _jit_eval_y_dispatch(device_step, mesh, edge_partition_specs)


def make_dp_ep_eval_step(model, mesh: Mesh):
    """Combined data + edge-partitioned eval over a (dp, ep) mesh; returns
    outs [dp, G, T]."""

    def device_step(state: TrainState, batch: GraphsTuple):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # drop dp axis
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, training=False)
        return out[None]

    return _jit_eval_y_dispatch(device_step, mesh, make_dp_ep_batch_specs,
                                out_spec=P("dp"))


def make_dp_ep_batch_specs(has_y: bool = True) -> GraphsTuple:
    """PartitionSpecs for a device-stacked batch: leading axis over dp, edge
    axis over ep.  Pass has_y=False for unlabeled batches."""
    return GraphsTuple(
        nodes=P("dp"), edges=P("dp", "ep"), senders=P("dp", "ep"),
        receivers=P("dp", "ep"), graph_ids=P("dp"), node_mask=P("dp"),
        edge_mask=P("dp", "ep"), graph_mask=P("dp"),
        y=P("dp") if has_y else None)


def make_dp_ep_train_step(model, tx, loss_fn: Callable, mesh: Mesh,
                          weight_decay: float = 0.0, weight_decay2: float = 0.0,
                          reg_p: int = 2, donate: bool = True,
                          loss_name: str = "l1"):
    """Combined data + edge parallelism over a (dp, ep) mesh.

    The batch is device-stacked along a leading dp axis; within each dp shard
    the edge arrays are additionally sharded over ep.  The model must be built
    with ``edge_axis='ep'``.  Gradients: pmean over ep reconstructs the exact
    grad from S x partial shards (see make_ep_train_step), then a
    load-weighted mean over dp (see parallel/dp.py) combines data shards
    exactly — a fully-masked dummy pad batch contributes nothing.
    """

    def device_step(state: TrainState, batch: GraphsTuple, lr: jax.Array):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # drop dp axis
        rng = jax.random.fold_in(state.rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        loss_and_aux = make_loss_and_aux(
            model, loss_fn, weight_decay, weight_decay2, reg_p,
            state.batch_stats, batch, rng, lr)
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "ep")
        w = loss_weight(batch, loss_name)
        grads = weighted_mean(grads, w, "dp")
        loss = weighted_mean(loss, w, "dp")
        w_bn = jnp.sum(batch.node_mask).astype(jnp.float32)
        new_stats = weighted_mean(new_stats, w_bn, "dp")
        new_params, new_opt_state = apply_optimizer(tx, grads, state, lr)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state, step=state.step + 1)
        return new_state, loss, out[None]

    return _jit_y_dispatch(device_step, mesh, make_dp_ep_batch_specs, donate,
                           out_spec=P("dp"))
