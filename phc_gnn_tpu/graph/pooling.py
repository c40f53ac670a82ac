"""Graph readout pooling: global sum and soft-attention.

TPU-native replacement for PyG ``global_add_pool`` (segment-sum over graph ids)
and the reference's sigmoid-gated soft-attention pooling
(reference: phc/hypercomplex/pooling.py:10-77).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from phc_gnn_tpu.graph import segment as seg
from phc_gnn_tpu.nn.phm_linear import PHMLinear, RealTransformer

__all__ = ["PHMGlobalSumPooling", "PHMSoftAttentionPooling"]


class PHMGlobalSumPooling(nn.Module):
    """Masked segment-sum of node embeddings over graph ids
    (reference: phc/hypercomplex/pooling.py:10-25)."""

    phm_dim: int

    @nn.compact
    def __call__(self, x, graph_ids, num_graphs: int, node_mask=None,
                 axis_name=None):
        return seg.segment_sum(x, graph_ids, num_graphs, node_mask,
                               axis_name=axis_name)


class PHMSoftAttentionPooling(nn.Module):
    """sigmoid(RealTransformer(PHMLinear(x))) gate, broadcast per component,
    then global sum (reference: phc/hypercomplex/pooling.py:29-77)."""

    embed_dim: int  # flat (n * per-component)
    phm_dim: int
    learn_phm: bool = True
    bias: bool = True
    w_init: str = "phm"
    c_init: str = "standard"
    real_trafo: str = "linear"
    shared_rule: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, graph_ids, num_graphs: int, node_mask=None,
                 phm_rule=None, axis_name=None):
        n = self.phm_dim
        gate = PHMLinear(self.embed_dim, self.embed_dim, n, self.bias,
                         self.w_init, self.c_init, self.learn_phm,
                         self.shared_rule, self.dtype, name="linear")(x, phm_rule)
        gate = RealTransformer(self.real_trafo, self.embed_dim, n, bias=True,
                               name="real_trafo")(gate)
        gate = nn.sigmoid(gate)  # [N, d] per-node gate, so sharding the node
        # axis leaves it exact; only the final graph-sum needs the psum
        xs = x.reshape(x.shape[0], n, self.embed_dim // n)
        gated = (gate[:, None, :] * xs).reshape(x.shape[0], self.embed_dim)
        return seg.segment_sum(gated, graph_ids, num_graphs, node_mask,
                               axis_name=axis_name)
