"""PHM graph-convolution operators on padded edge lists.

TPU-native re-design of reference phc/hypercomplex/undirectional/
messagepassing.py: PyG's ``MessagePassing.propagate`` (gather -> message ->
scatter) becomes an explicit edge-list gather ``x[senders] + edge_attr`` ->
message encoder -> masked segment reduce, all static-shape and fusable by XLA;
the optional Pallas fused path (phc_gnn_tpu.ops) plugs in behind the same API.

Shared message function: ``msg_encoder(x_j + edge_attr)``
(reference: messagepassing.py:72-74).

Conv variants (facade dispatch mirrors reference :456-518):
- PHMConv          (aggr in sum/mean/min/max, linear transform)      :19-88
- PHMGINEConv      (fixed aggr, +self, 2-layer PHM MLP)              :91-161
- PHMConvSoftmax   (softmax aggregation, linear transform)           :164-245
- PHMGINEConvSoftmax (softmax aggregation, MLP)                      :248-327
- PHMPNAConvSimple (multi-aggregator + degree scalers + post stack)  :339-453
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from phc_gnn_tpu.graph.aggregators import (
    AGGREGATORS,
    SCALERS,
    node_degrees,
    phm_cat,
    softmax_aggregate,
)
from phc_gnn_tpu.nn.activations import get_activation
from phc_gnn_tpu.nn.norm import PHMNorm
from phc_gnn_tpu.nn.phm_linear import PHMLinear, PHMMLP

__all__ = [
    "PHMConv",
    "PHMGINEConv",
    "PHMConvSoftmax",
    "PHMGINEConvSoftmax",
    "PHMPNAConvSimple",
    "PHMMessagePassing",
]


def _messages(x, senders, edge_attr, msg_encoder: str, x_remote=None,
              scan_plan=None):
    """Edge messages: msg_encoder(x[senders] + edge_attr)
    (reference: messagepassing.py:72-74).

    ``x_remote`` [S*H, d] carries halo rows received from peer shards under
    node partitioning (parallel/halo.py); ``senders`` then index the augmented
    [NS + S*H] array.  When the batch carries a sender-sorted plan (scan_plan
    of length 7, ops/stream_scan.py build_sender_plan), the gather's backward
    scatter runs as a streamed segment-sum — the >=16k locality fix."""
    if x_remote is not None:
        # split local/remote gather: the local take does not depend on the
        # halo all_to_all, so the latency-hiding scheduler overlaps it with
        # the in-flight exchange (async pairs via HALO_TPU_COMPILER_OPTIONS;
        # schedule evidence in AOT_SCHEDULE.json)
        if scan_plan is not None and len(scan_plan) == 7:
            from phc_gnn_tpu.ops.stream_scan import halo_gather_split_streamed
            gathered = halo_gather_split_streamed(x, x_remote, senders,
                                                  *scan_plan[3:])
        else:
            from phc_gnn_tpu.ops.stream_scan import split_take
            gathered = split_take(x, x_remote, senders)
    elif scan_plan is not None and len(scan_plan) == 7:
        from phc_gnn_tpu.ops.stream_scan import gather_nodes_streamed
        gathered = gather_nodes_streamed(x, senders, *scan_plan[3:])
    else:
        gathered = jnp.take(x, senders, axis=0)
    return get_activation(msg_encoder)(gathered + edge_attr)


def _softmax_aggr(msgs, receivers, num_nodes, beta, edge_mask, edge_axis,
                  scan_plan=None):
    """Softmax aggregation: the streaming segmented-scan kernel (measured
    1.46x over the XLA composite on TPU v5e, KERNELS.md) when the batch
    carries a scan plan, XLA composite otherwise (and always under edge
    partitioning)."""
    if scan_plan is not None and edge_axis is None:
        from phc_gnn_tpu.ops.stream_scan import softmax_aggregate_streamed

        flags, cont, last_edge = scan_plan[:3]
        return softmax_aggregate_streamed(
            msgs, receivers, flags, cont, last_edge, num_nodes, beta,
            edge_mask)
    return softmax_aggregate(msgs, receivers, num_nodes, beta, edge_mask,
                             axis_name=edge_axis)


def _fixed_aggr(msgs, receivers, num_nodes, edge_mask, edge_axis, aggr,
                scan_plan=None):
    """Fixed-reduce aggregation; the whole sum/mean/min/max/var/std family
    rides the streaming scan kernels (KERNELS.md) when a scan plan is present
    on a single shard — no scatter in forward or backward."""
    if scan_plan is not None and edge_axis is None:
        from phc_gnn_tpu.ops.stream_scan import STREAMED_AGGREGATORS

        if aggr in STREAMED_AGGREGATORS:
            flags, cont, last_edge = scan_plan[:3]
            return STREAMED_AGGREGATORS[aggr](
                msgs, receivers, flags, cont, last_edge, num_nodes, edge_mask)
    return AGGREGATORS[aggr](msgs, receivers, num_nodes, edge_mask,
                             axis_name=edge_axis)


class PHMConv(nn.Module):
    """Fixed-reduce conv with linear transform; same_dim selects
    transform-then-skip vs skip-then-transform (reference: messagepassing.py:19-88)."""

    in_features: int
    out_features: int
    phm_dim: int
    learn_phm: bool = True
    bias: bool = True
    add_self_loops: bool = True
    w_init: str = "phm"
    c_init: str = "standard"
    aggr: str = "sum"
    same_dim: bool = True
    msg_encoder: str = "identity"
    shared_rule: bool = False
    edge_axis: Optional[str] = None  # mesh axis of the edge partition
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask=None,
                 phm_rule=None, training: bool = False, scan_plan=None,
                 x_remote=None):
        num_nodes = x.shape[0]
        msgs = _messages(x, senders, edge_attr, self.msg_encoder, x_remote,
                          scan_plan)
        aggr = _fixed_aggr(msgs, receivers, num_nodes, edge_mask,
                           self.edge_axis, self.aggr, scan_plan)
        transform = PHMLinear(self.in_features, self.out_features, self.phm_dim,
                              self.bias, self.w_init, self.c_init,
                              self.learn_phm, self.shared_rule, self.dtype,
                              name="transform")
        if self.same_dim:
            out = transform(aggr, phm_rule)
            if self.add_self_loops:
                out = out + x
        else:
            if self.add_self_loops:
                aggr = aggr + x
            out = transform(aggr, phm_rule)
        return out


class PHMGINEConv(nn.Module):
    """GIN-E-style conv: aggregate -> +self -> 2-layer PHM MLP
    (reference: messagepassing.py:91-161)."""

    in_features: int
    out_features: int
    phm_dim: int
    learn_phm: bool = True
    bias: bool = True
    add_self_loops: bool = True
    norm: Optional[str] = None
    activation: str = "relu"
    w_init: str = "phm"
    c_init: str = "standard"
    aggr: str = "sum"
    msg_encoder: str = "identity"
    shared_rule: bool = False
    edge_axis: Optional[str] = None
    dtype: Any = None
    stat_axis: Optional[str] = None  # cross-shard BN stats (parallel/halo.py)

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask=None,
                 phm_rule=None, training: bool = False, node_mask=None,
                 scan_plan=None, x_remote=None):
        num_nodes = x.shape[0]
        msgs = _messages(x, senders, edge_attr, self.msg_encoder, x_remote,
                          scan_plan)
        aggr = _fixed_aggr(msgs, receivers, num_nodes, edge_mask,
                           self.edge_axis, self.aggr, scan_plan)
        if self.add_self_loops:
            aggr = aggr + x
        return PHMMLP(self.in_features, self.out_features, self.phm_dim,
                      self.bias, self.learn_phm, self.activation, self.norm,
                      self.w_init, self.c_init, factor=1.0,
                      shared_rule=self.shared_rule, dtype=self.dtype,
                      stat_axis=self.stat_axis,
                      name="transform")(aggr, phm_rule, training=training,
                                        mask=node_mask)


class PHMConvSoftmax(nn.Module):
    """PHMConv with learnable-beta softmax aggregation
    (reference: messagepassing.py:164-245)."""

    in_features: int
    out_features: int
    phm_dim: int
    learn_phm: bool = True
    bias: bool = True
    add_self_loops: bool = True
    w_init: str = "phm"
    c_init: str = "standard"
    same_dim: bool = True
    msg_encoder: str = "identity"
    initial_beta: float = 1.0
    learn_beta: bool = True
    shared_rule: bool = False
    edge_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask=None,
                 phm_rule=None, training: bool = False,
                 scan_plan=None, x_remote=None):
        num_nodes = x.shape[0]
        msgs = _messages(x, senders, edge_attr, self.msg_encoder, x_remote,
                          scan_plan)
        beta = self.param("beta", nn.initializers.constant(self.initial_beta), ())
        if not self.learn_beta:
            beta = jax.lax.stop_gradient(beta)
        aggr = _softmax_aggr(msgs, receivers, num_nodes, beta, edge_mask,
                             self.edge_axis, scan_plan)
        transform = PHMLinear(self.in_features, self.out_features, self.phm_dim,
                              self.bias, self.w_init, self.c_init,
                              self.learn_phm, self.shared_rule, self.dtype,
                              name="transform")
        if self.same_dim:
            out = transform(aggr, phm_rule)
            if self.add_self_loops:
                out = out + x
        else:
            if self.add_self_loops:
                aggr = aggr + x
            out = transform(aggr, phm_rule)
        return out


class PHMGINEConvSoftmax(nn.Module):
    """PHMGINEConv with softmax aggregation
    (reference: messagepassing.py:248-327)."""

    in_features: int
    out_features: int
    phm_dim: int
    learn_phm: bool = True
    bias: bool = True
    add_self_loops: bool = True
    norm: Optional[str] = None
    activation: str = "relu"
    w_init: str = "phm"
    c_init: str = "standard"
    msg_encoder: str = "identity"
    initial_beta: float = 1.0
    learn_beta: bool = True
    shared_rule: bool = False
    edge_axis: Optional[str] = None
    dtype: Any = None
    stat_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask=None,
                 phm_rule=None, training: bool = False,
                 node_mask=None, scan_plan=None, x_remote=None):
        num_nodes = x.shape[0]
        msgs = _messages(x, senders, edge_attr, self.msg_encoder, x_remote,
                          scan_plan)
        beta = self.param("beta", nn.initializers.constant(self.initial_beta), ())
        if not self.learn_beta:
            beta = jax.lax.stop_gradient(beta)
        aggr = _softmax_aggr(msgs, receivers, num_nodes, beta, edge_mask,
                             self.edge_axis, scan_plan)
        if self.add_self_loops:
            aggr = aggr + x
        return PHMMLP(self.in_features, self.out_features, self.phm_dim,
                      self.bias, self.learn_phm, self.activation, self.norm,
                      self.w_init, self.c_init, factor=1.0,
                      shared_rule=self.shared_rule, dtype=self.dtype,
                      stat_axis=self.stat_axis,
                      name="transform")(aggr, phm_rule, training=training,
                                        mask=node_mask)


class PHMPNAConvSimple(nn.Module):
    """Simplified principal-neighbourhood-aggregation conv: multi-aggregate ->
    phm_cat -> degree scalers -> PHM linear stack
    (reference: messagepassing.py:339-453).  ``avg_deg`` statistics come from
    the dataset degree histogram (computed host-side)."""

    in_features: int
    out_features: int
    phm_dim: int
    avg_deg: Dict[str, float]
    learn_phm: bool = True
    bias: bool = True
    activation: str = "relu"
    norm: Optional[str] = None
    w_init: str = "phm"
    c_init: str = "standard"
    aggregators: Sequence[str] = ("mean", "min", "max", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    post_layers: int = 1
    msg_encoder: str = "relu"
    shared_rule: bool = False
    edge_axis: Optional[str] = None
    dtype: Any = None
    stat_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask=None,
                 phm_rule=None, training: bool = False, node_mask=None,
                 x_remote=None, scan_plan=None):
        num_nodes = x.shape[0]
        msgs = _messages(x, senders, edge_attr, self.msg_encoder, x_remote,
                          scan_plan)
        outs = [_fixed_aggr(msgs, receivers, num_nodes, edge_mask,
                            self.edge_axis, a, scan_plan)
                for a in self.aggregators]
        out = phm_cat(outs, self.phm_dim)
        deg = node_degrees(receivers, num_nodes, edge_mask,
                           axis_name=self.edge_axis)
        outs = [SCALERS[s](out, deg, self.avg_deg) for s in self.scalers]
        out = phm_cat(outs, self.phm_dim)

        in_dim = len(self.aggregators) * len(self.scalers) * self.in_features
        out = PHMLinear(in_dim, self.out_features, self.phm_dim, self.bias,
                        self.w_init, self.c_init, self.learn_phm,
                        self.shared_rule, self.dtype, name="post_0")(out, phm_rule)
        for i in range(1, self.post_layers):
            if self.norm not in (None, "None"):
                # the reference hardcodes naive-batch-norm in the PNA post
                # stack regardless of the configured norm
                # (messagepassing.py:391) — match it
                out = PHMNorm(num_features=self.out_features, phm_dim=self.phm_dim,
                              norm_type="naive-batch-norm",
                              stat_axis=self.stat_axis,
                              name=f"post_norm_{i}")(
                    out, training=training, mask=node_mask)
            out = get_activation(self.activation)(out)
            out = PHMLinear(self.out_features, self.out_features, self.phm_dim,
                            self.bias, self.w_init, self.c_init, self.learn_phm,
                            self.shared_rule, self.dtype,
                            name=f"post_{i}")(out, phm_rule)
        return out


class PHMMessagePassing(nn.Module):
    """Facade dispatching on (aggr, mlp) to one of the conv variants
    (reference: messagepassing.py:456-518)."""

    in_features: int
    out_features: int
    phm_dim: int
    learn_phm: bool = True
    bias: bool = True
    add_self_loops: bool = True
    norm: Optional[str] = None
    activation: str = "relu"
    w_init: str = "phm"
    c_init: str = "standard"
    aggr: str = "sum"  # sum|mean|min|max|softmax|pna ("add" aliases "sum")
    mlp: bool = True
    same_dim: bool = True
    msg_encoder: str = "identity"
    initial_beta: float = 1.0
    learn_beta: bool = True
    shared_rule: bool = False
    edge_axis: Optional[str] = None
    dtype: Any = None
    stat_axis: Optional[str] = None
    # pna extras
    avg_deg: Optional[Dict[str, float]] = None
    aggregators: Sequence[str] = ("mean", "min", "max", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    post_layers: int = 1

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask=None,
                 phm_rule=None, training: bool = False,
                 node_mask=None, scan_plan=None, x_remote=None):
        aggr = "sum" if self.aggr == "add" else self.aggr
        common = dict(in_features=self.in_features, out_features=self.out_features,
                      phm_dim=self.phm_dim, learn_phm=self.learn_phm,
                      bias=self.bias, w_init=self.w_init, c_init=self.c_init,
                      shared_rule=self.shared_rule, edge_axis=self.edge_axis,
                      dtype=self.dtype)
        if aggr == "pna":
            conv = PHMPNAConvSimple(
                avg_deg=self.avg_deg, activation=self.activation, norm=self.norm,
                aggregators=self.aggregators, scalers=self.scalers,
                post_layers=self.post_layers, msg_encoder="relu",
                stat_axis=self.stat_axis, name="conv", **common)
        elif aggr == "softmax":
            if self.mlp:
                conv = PHMGINEConvSoftmax(
                    add_self_loops=self.add_self_loops, norm=self.norm,
                    activation=self.activation, msg_encoder=self.msg_encoder,
                    initial_beta=self.initial_beta, learn_beta=self.learn_beta,
                    stat_axis=self.stat_axis, name="conv", **common)
            else:
                conv = PHMConvSoftmax(
                    add_self_loops=self.add_self_loops, same_dim=self.same_dim,
                    msg_encoder=self.msg_encoder, initial_beta=self.initial_beta,
                    learn_beta=self.learn_beta, name="conv", **common)
        else:
            if self.mlp:
                conv = PHMGINEConv(
                    add_self_loops=self.add_self_loops, norm=self.norm,
                    activation=self.activation, aggr=aggr,
                    msg_encoder=self.msg_encoder, stat_axis=self.stat_axis,
                    name="conv", **common)
            else:
                conv = PHMConv(
                    add_self_loops=self.add_self_loops, aggr=aggr,
                    same_dim=self.same_dim, msg_encoder=self.msg_encoder,
                    name="conv", **common)
        if aggr == "softmax":
            if self.mlp:
                return conv(x, senders, receivers, edge_attr, edge_mask,
                            phm_rule, training=training,
                            node_mask=node_mask, scan_plan=scan_plan,
                            x_remote=x_remote)
            return conv(x, senders, receivers, edge_attr, edge_mask, phm_rule,
                        training=training, scan_plan=scan_plan,
                        x_remote=x_remote)
        if aggr == "pna":
            return conv(x, senders, receivers, edge_attr, edge_mask, phm_rule,
                        training=training, node_mask=node_mask,
                        x_remote=x_remote, scan_plan=scan_plan)
        if self.mlp:
            return conv(x, senders, receivers, edge_attr, edge_mask, phm_rule,
                        training=training, node_mask=node_mask,
                        scan_plan=scan_plan, x_remote=x_remote)
        return conv(x, senders, receivers, edge_attr, edge_mask, phm_rule,
                    training=training, scan_plan=scan_plan, x_remote=x_remote)
