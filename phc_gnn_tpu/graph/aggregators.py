"""Aggregation & scaler registries + softmax aggregator, on padded edge arrays.

TPU-native counterpart of reference phc/hypercomplex/aggregator.py:36-141:
AGGREGATORS map (messages [E, D], receivers [E], num_nodes, edge_mask) to node
arrays [N, D]; SCALERS rescale by (log-)degree; ``softmax_aggregate`` is the
learnable-beta softmax-weighted sum.  ``phm_cat`` concatenates flat PHM tensors
per-component (reference: phc/hypercomplex/utils.py:122-135).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from phc_gnn_tpu.graph import segment as seg

__all__ = ["AGGREGATORS", "SCALERS", "softmax_aggregate", "phm_cat", "node_degrees"]


AGGREGATORS = {
    "sum": seg.segment_sum,
    "mean": seg.segment_mean,
    "min": seg.segment_min,
    "max": seg.segment_max,
    "var": seg.segment_var,
    "std": seg.segment_std,
}


def node_degrees(receivers, num_nodes: int, edge_mask=None, axis_name=None) -> jax.Array:
    """In-degree per node as float [N, 1]."""
    return seg.segment_count(receivers, num_nodes, edge_mask,
                             axis_name=axis_name)[:, None]


def scale_identity(x, deg, avg_deg):
    return x


def scale_amplification(x, deg, avg_deg):
    return x * (jnp.log(deg + 1.0) / avg_deg["log"])


def scale_attenuation(x, deg, avg_deg):
    scale = avg_deg["log"] / jnp.log(deg + 1.0)
    scale = jnp.where(deg == 0, 1.0, scale)
    return x * scale


def scale_linear(x, deg, avg_deg):
    return x * (deg / avg_deg["lin"])


def scale_inverse_linear(x, deg, avg_deg):
    scale = avg_deg["lin"] / deg
    scale = jnp.where(deg == 0, 1.0, scale)
    return x * scale


SCALERS = {
    "identity": scale_identity,
    "amplification": scale_amplification,
    "attenuation": scale_attenuation,
    "linear": scale_linear,
    "inverse_linear": scale_inverse_linear,
}


def softmax_aggregate(messages, receivers, num_nodes: int, beta,
                      edge_mask=None, axis_name=None) -> jax.Array:
    """Softmax aggregation: out = segment_sum(softmax(beta*m) * m)
    (reference: phc/hypercomplex/aggregator.py:36-54 and
    undirectional/messagepassing.py:211-214).  With ``axis_name`` the softmax
    and the sum are exact across an edge-partition mesh axis.

    Computed as numerator/denominator at the node level — one fewer edge-wide
    pass than materializing per-edge weights (no normalize gather+multiply)."""
    logits = beta * messages
    if edge_mask is not None:
        logits = jnp.where(edge_mask[:, None] if edge_mask.ndim < logits.ndim
                           else edge_mask, logits, -1e30)
    seg_max = jax.ops.segment_max(jax.lax.stop_gradient(logits), receivers,
                                  num_segments=num_nodes)
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    seg_max = jnp.where(seg_max <= -1e29, 0.0, seg_max)
    expd = jnp.exp(logits - seg_max[receivers])
    if edge_mask is not None:
        expd = jnp.where(edge_mask[:, None] if edge_mask.ndim < expd.ndim
                         else edge_mask, expd, 0.0)
    numer = seg.segment_sum(expd * messages, receivers, num_nodes,
                            axis_name=axis_name)
    denom = seg.segment_sum(expd, receivers, num_nodes, axis_name=axis_name)
    return numer / jnp.maximum(denom, 1e-16)


def phm_cat(tensors: Sequence[jax.Array], phm_dim: int) -> jax.Array:
    """Concatenate flat component-block PHM tensors preserving the block layout:
    [N, n*d1], [N, n*d2] -> [N, n*(d1+d2)]
    (reference: phc/hypercomplex/utils.py:122-135)."""
    n = phm_dim
    parts = [t.reshape(t.shape[0], n, t.shape[1] // n) for t in tensors]
    return jnp.concatenate(parts, axis=-1).reshape(tensors[0].shape[0], -1)
