"""Masked segment reductions over padded edge/node arrays, collective-aware.

TPU-native replacement for torch_scatter's CUDA segment kernels
(reference: phc/hypercomplex/aggregator.py:70-103, scatter_softmax use at
undirectional/messagepassing.py:212-214) per SURVEY.md section 2.4.  All ops take
static ``num_segments`` and a boolean mask for padding entries so they jit with
fixed shapes; XLA lowers ``segment_sum`` to an efficient sorted-scatter on TPU
(callers keep edges sorted by receiver — see graph/batch.py).

Edge partitioning: every op accepts ``axis_name``; when set (inside
shard_map/pjit over a mesh axis holding an *edge shard* per device with node
arrays replicated), the local partial reduction is combined across devices with
the matching XLA collective (psum / pmax / pmin), making the result exact for
edges distributed over chips — including the two-pass segment softmax, whose
max and normalizer both become global.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_min",
    "segment_max",
    "segment_var",
    "segment_std",
    "segment_softmax_weights",
    "segment_count",
]

_NEG = -1e30  # large finite stand-in for -inf (keeps grads clean)


def _mask2d(mask: Optional[jax.Array], data: jax.Array) -> Optional[jax.Array]:
    if mask is None:
        return None
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


def segment_sum(data, segment_ids, num_segments: int, mask=None, axis_name=None):
    if mask is not None:
        data = jnp.where(_mask2d(mask, data), data, 0)
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def segment_count(segment_ids, num_segments: int, mask=None, dtype=jnp.float32,
                  axis_name=None):
    ones = jnp.ones(segment_ids.shape, dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    out = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def segment_mean(data, segment_ids, num_segments: int, mask=None, axis_name=None):
    total = segment_sum(data, segment_ids, num_segments, mask, axis_name)
    count = segment_count(segment_ids, num_segments, mask, total.dtype, axis_name)
    count = count.reshape(count.shape + (1,) * (total.ndim - 1))
    return total / jnp.maximum(count, 1)


def segment_max(data, segment_ids, num_segments: int, mask=None, axis_name=None):
    """Max; empty segments yield 0 (matching torch_scatter's zero-fill)."""
    if mask is not None:
        data = jnp.where(_mask2d(mask, data), data, _NEG)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        out = jax.lax.pmax(out, axis_name)
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_min(data, segment_ids, num_segments: int, mask=None, axis_name=None):
    if mask is not None:
        data = jnp.where(_mask2d(mask, data), data, -_NEG)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        out = jax.lax.pmin(out, axis_name)
    return jnp.where(out >= -_NEG / 2, 0.0, out)


def segment_var(data, segment_ids, num_segments: int, mask=None, axis_name=None):
    """E[x^2] - E[x]^2 per segment (reference: aggregator.py:86-89)."""
    mean = segment_mean(data, segment_ids, num_segments, mask, axis_name)
    mean_sq = segment_mean(data * data, segment_ids, num_segments, mask, axis_name)
    return mean_sq - mean * mean


def segment_std(data, segment_ids, num_segments: int, mask=None, eps: float = 1e-5,
                axis_name=None):
    """sqrt(relu(var) + eps) (reference: aggregator.py:92-93)."""
    return jnp.sqrt(
        jax.nn.relu(segment_var(data, segment_ids, num_segments, mask, axis_name))
        + eps)


def segment_softmax_weights(logits, segment_ids, num_segments: int, mask=None,
                            axis_name=None):
    """Per-segment softmax weights over entries (numerically stable two-pass:
    segment-max shift -> exp -> segment-sum normalize).  Masked entries get
    weight 0.  With ``axis_name``, both the max and the normalizer are global
    across the edge-partition axis, so weights are exact for edges spread over
    devices.  Replaces torch_scatter.composite.scatter_softmax."""
    if mask is not None:
        logits = jnp.where(_mask2d(mask, logits), logits, _NEG)
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(logits), segment_ids, num_segments=num_segments)
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    seg_max = jnp.where(seg_max <= _NEG / 2, 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    if mask is not None:
        expd = jnp.where(_mask2d(mask, expd), expd, 0.0)
    denom = jax.ops.segment_sum(expd, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    return expd / jnp.maximum(denom[segment_ids], 1e-16)
