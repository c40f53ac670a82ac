"""End-to-end PHC-GNN models: add-skip and concat-skip variants.

TPU-native re-design of reference phc/hypercomplex/undirectional/models.py:
``PHMSkipConnectAdd`` (:24-267) and ``PHMSkipConnectConcat`` (:271-517); the
quaternion model classes (phc/quaternion/undirectional/models.py:25,234) are the
same architectures at ``phm_dim=4`` — one generic implementation, four reference
classes as configs (see ``models/presets.py``).

Forward (reference :219-249): atom-encode -> flatten [N, n*d] -> L x
(bond-encode, conv, norm, act, dropout, skip) -> pool -> downstream head.
``sc_type`` selects the add-skip source: "first" = the initial embedding,
"last" = the previous layer's output.  The concat variant concatenates the
initial embedding each layer so dims grow.
"""

from __future__ import annotations

from dataclasses import field
from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from phc_gnn_tpu.data.features import ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS
from phc_gnn_tpu.graph.batch import GraphsTuple
from phc_gnn_tpu.graph.conv import PHMMessagePassing
from phc_gnn_tpu.graph.pooling import PHMGlobalSumPooling, PHMSoftAttentionPooling
from phc_gnn_tpu.hypercomplex.rules import get_multiplication_rule
from phc_gnn_tpu.nn.activations import get_activation
from phc_gnn_tpu.nn.downstream import PHMDownstreamNet
from phc_gnn_tpu.nn.dropout import phm_dropout
from phc_gnn_tpu.nn.encoder import NaivePHMEncoder, PHMEncoder
from phc_gnn_tpu.nn.norm import PHMNorm

__all__ = ["PHCGNN"]


class PHCGNN(nn.Module):
    """Generic PHC-GNN for graph-level prediction on padded batches.

    ``skip_connect`` = "add" reproduces PHMSkipConnectAdd; "concat" reproduces
    PHMSkipConnectConcat.  ``unique_phm`` shares one contribution tensor across
    the whole network (reference models.py:59-63).
    """

    phm_dim: int = 4
    learn_phm: bool = True
    unique_phm: bool = False
    atom_input_dims: Union[int, Sequence[int]] = tuple(ATOM_FEATURE_DIMS)
    atom_encoded_dim: int = 196  # flat (n * per-component)
    bond_input_dims: Union[int, Sequence[int]] = tuple(BOND_FEATURE_DIMS)
    naive_encoder: bool = False
    w_init: str = "phm"
    c_init: str = "standard"
    same_dropout: bool = False
    mp_layers: Sequence[int] = (196, 196, 196)
    bias: bool = True
    dropout_mpnn: Sequence[float] = (0.0, 0.0, 0.0)
    norm_mp: Optional[str] = "naive-batch-norm"
    add_self_loops: bool = True
    msg_aggr: str = "add"  # add|sum|mean|min|max|softmax|pna
    node_aggr: str = "sum"
    mlp_mp: bool = False
    pooling: str = "softattention"  # globalsum | softattention
    activation: str = "relu"
    real_trafo: str = "linear"
    downstream_layers: Sequence[int] = (256, 128)
    target_dim: int = 1
    dropout_dn: Union[float, Sequence[float]] = (0.2, 0.1)
    norm_dn: Optional[str] = "naive-batch-norm"
    msg_encoder: str = "identity"
    sc_type: str = "first"  # first | last (add-skip source)
    skip_connect: str = "add"  # add | concat
    initial_beta: float = 1.0
    learn_beta: bool = True
    edge_axis: Optional[str] = None  # mesh axis for edge partitioning
    node_axis: Optional[str] = None  # mesh axis for node sharding with halo
                                     # exchange (parallel/halo.py north star)
    compute_dtype: Optional[object] = None  # e.g. jnp.bfloat16 (params stay f32)
    remat: bool = False  # rematerialize each conv layer (memory <-> FLOPs)
    # pna extras
    avg_deg: Optional[Dict[str, float]] = None
    pna_aggregators: Sequence[str] = ("mean", "min", "max", "std")
    pna_scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    pna_post_layers: int = 1

    def setup(self):
        assert self.skip_connect in ("add", "concat")
        assert self.sc_type in ("first", "last")
        assert self.pooling in ("globalsum", "softattention")
        n = self.phm_dim
        if self.skip_connect == "add":
            assert all(d == self.atom_encoded_dim == self.mp_layers[0]
                       for d in self.mp_layers), \
                "add-skip model needs equal dims (reference models.py:46)"
        assert len(self.dropout_mpnn) == len(self.mp_layers)

        embed = self.atom_encoded_dim  # flat
        enc_cls = NaivePHMEncoder if self.naive_encoder else PHMEncoder
        self.atomencoder = enc_cls(out_dim=embed // n,
                                   input_dims=self.atom_input_dims, phm_dim=n)

        # per-layer in/out dims + bond encoder dims (flat)
        in_dims, out_dims, bond_dims = [], [], []
        for i, out_dim in enumerate(self.mp_layers):
            if self.skip_connect == "add":
                in_dim = embed if i == 0 else self.mp_layers[i - 1]
                bond_dims.append(out_dim)
            else:  # concat: input grows by the embedding each layer
                in_dim = embed if i == 0 else self.mp_layers[i - 1] + embed
                bond_dims.append(in_dim)
            in_dims.append(in_dim)
            out_dims.append(out_dim)
        self._in_dims, self._out_dims = tuple(in_dims), tuple(out_dims)

        self.bondencoders = [
            enc_cls(out_dim=d // n, input_dims=self.bond_input_dims, phm_dim=n,
                    name=f"bondencoder_{i}")
            for i, d in enumerate(bond_dims)
        ]

        shared = self.unique_phm
        if shared:
            if self.c_init == "random":
                def rule_init(key, shape):
                    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
            else:
                def rule_init(key, shape):
                    return jnp.asarray(get_multiplication_rule(n, self.c_init))
            self.phm_rule_shared = self.param("phm_rule_shared", rule_init,
                                              (n, n, n))

        aggr = "sum" if self.msg_aggr == "add" else self.msg_aggr
        self.convs = [
            PHMMessagePassing(
                in_features=self._in_dims[i], out_features=self._out_dims[i],
                phm_dim=n, learn_phm=self.learn_phm, bias=self.bias,
                add_self_loops=self.add_self_loops, norm=self.norm_mp,
                activation=self.activation, w_init=self.w_init,
                c_init=self.c_init, aggr=aggr, mlp=self.mlp_mp,
                same_dim=(self.skip_connect == "add"),
                msg_encoder=self.msg_encoder, initial_beta=self.initial_beta,
                learn_beta=self.learn_beta, shared_rule=shared,
                edge_axis=self.edge_axis, stat_axis=self.node_axis,
                dtype=self.compute_dtype,
                avg_deg=self.avg_deg, aggregators=self.pna_aggregators,
                scalers=self.pna_scalers, post_layers=self.pna_post_layers,
                name=f"conv_{i}")
            for i in range(len(self.mp_layers))
        ]
        if self.norm_mp not in (None, "None"):
            self.norms = [
                PHMNorm(num_features=self._out_dims[i], phm_dim=n,
                        norm_type=self.norm_mp, stat_axis=self.node_axis,
                        name=f"norm_{i}")
                for i in range(len(self.mp_layers))
            ]
        else:
            self.norms = [None] * len(self.mp_layers)

        final_dim = (self.mp_layers[-1] if self.skip_connect == "add"
                     else self.mp_layers[-1] + embed)
        if self.pooling == "globalsum":
            self.pool = PHMGlobalSumPooling(phm_dim=n)
        else:
            self.pool = PHMSoftAttentionPooling(
                embed_dim=final_dim, phm_dim=n, learn_phm=self.learn_phm,
                bias=self.bias, w_init=self.w_init, c_init=self.c_init,
                real_trafo=self.real_trafo, shared_rule=shared,
                dtype=self.compute_dtype, name="pooling")

        self.downstream = PHMDownstreamNet(
            in_features=final_dim, hidden_layers=tuple(self.downstream_layers),
            out_features=self.target_dim, phm_dim=n, activation=self.activation,
            bias=self.bias, norm=self.norm_dn, w_init=self.w_init,
            c_init=self.c_init, dropout=self.dropout_dn,
            learn_phm=self.learn_phm, same_dropout=self.same_dropout,
            real_trafo=self.real_trafo, shared_rule=shared,
            dtype=self.compute_dtype, name="downstream")

    def __call__(self, graphs: GraphsTuple, training: bool = False,
                 dropout_rng: Optional[jax.Array] = None) -> jax.Array:
        n = self.phm_dim
        rule = self.phm_rule_shared if self.unique_phm else None
        if rule is not None and not self.learn_phm:
            rule = jax.lax.stop_gradient(rule)

        x_raw, e_raw = graphs.nodes, graphs.edges
        scan_plan = None
        if graphs.scan_flags is not None and self.edge_axis is None:
            scan_plan = (graphs.scan_flags, graphs.scan_cont, graphs.last_edge)
            if graphs.snd_perm is not None:
                # sender-sorted plan: streamed backward for the message gather
                scan_plan = scan_plan + (graphs.snd_perm, graphs.snd_flags,
                                         graphs.snd_cont, graphs.snd_last)
        atom = self.atomencoder(x_raw)  # [N, n, d]
        atom = atom.reshape(atom.shape[0], -1)  # flat [N, n*d]
        if self.compute_dtype is not None:
            atom = atom.astype(self.compute_dtype)

        act = get_activation(self.activation)
        num_layers = len(self.mp_layers)
        rngs = (jax.random.split(dropout_rng, num_layers + 1)
                if (training and dropout_rng is not None)
                else [None] * (num_layers + 1))

        halo = (graphs.halo_send is not None and self.node_axis is not None
                and not self.is_initializing())
        if halo and rngs[0] is not None:
            # per-shard independent node dropout (each shard holds distinct
            # rows); the downstream rng rngs[-1] stays shared — the pooled
            # [G, d] activations are replicated and must stay replicated
            shard = jax.lax.axis_index(self.node_axis)
            rngs = [jax.random.fold_in(r, shard) for r in rngs[:-1]] + \
                [rngs[-1]]

        x = atom
        for i in range(num_layers):
            skip = atom if (self.sc_type == "first" or i == 0) else x
            if self.skip_connect == "concat":
                skip = atom  # concat always re-injects the embedding
            edge_emb = self.bondencoders[i](e_raw)
            edge_emb = edge_emb.reshape(edge_emb.shape[0], -1)
            if self.compute_dtype is not None:
                edge_emb = edge_emb.astype(self.compute_dtype)
            x_remote = None
            if halo:
                # boundary sender features from peer shards; XLA overlaps the
                # all_to_all with the (independent) bond-encoder compute above
                from phc_gnn_tpu.parallel.halo import halo_exchange
                x_remote = halo_exchange(x, graphs.halo_send, self.node_axis)
            if self.remat:
                h = nn.remat(
                    lambda m, x_, s_, r_, e_, em_, rule_, nm_, sp_, xr_:
                    m(x_, s_, r_, e_, em_, rule_, training=training,
                      node_mask=nm_, scan_plan=sp_, x_remote=xr_))(
                    self.convs[i], x, graphs.senders, graphs.receivers,
                    edge_emb, graphs.edge_mask, rule, graphs.node_mask,
                    scan_plan, x_remote)
            else:
                h = self.convs[i](x, graphs.senders, graphs.receivers,
                                  edge_emb, graphs.edge_mask, rule,
                                  training=training,
                                  node_mask=graphs.node_mask,
                                  scan_plan=scan_plan, x_remote=x_remote)
            if self.norms[i] is not None:
                h = self.norms[i](h, training=training, mask=graphs.node_mask)
            h = act(h)
            if training and self.dropout_mpnn[i] > 0.0 and rngs[i] is not None:
                h = phm_dropout(rngs[i], h, self.dropout_mpnn[i], n,
                                training=True, same=self.same_dropout)
            if self.skip_connect == "add":
                x = h + skip
            else:
                x = jnp.concatenate([h, skip], axis=-1)

        pool_axis = self.node_axis if halo else None
        if self.pooling == "globalsum":
            pooled = self.pool(x, graphs.graph_ids, graphs.num_graphs,
                               graphs.node_mask, axis_name=pool_axis)
        else:
            pooled = self.pool(x, graphs.graph_ids, graphs.num_graphs,
                               graphs.node_mask, rule, axis_name=pool_axis)
        return self.downstream(pooled, rule, training=training,
                               dropout_rng=rngs[-1], mask=graphs.graph_mask)
