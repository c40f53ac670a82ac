"""Masked segment reductions over padded edge/node arrays.

TPU-native replacement for torch_scatter's CUDA segment kernels
(reference: phc/hypercomplex/aggregator.py:70-103, scatter_softmax use at
undirectional/messagepassing.py:212-214) per SURVEY.md section 2.4.  All ops take
static ``num_segments`` and a boolean mask for padding entries so they jit with
fixed shapes; XLA lowers ``segment_sum`` to an efficient sorted-scatter on TPU
(callers keep edges sorted by receiver — see graph/batch.py).
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


def segment_sum(data, segment_ids, num_segments: int, mask=None):
    if mask is not None:
        data = jnp.where(_mask2d(mask, data), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids, num_segments: int, mask=None, dtype=jnp.float32):
    ones = jnp.ones(segment_ids.shape, dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, mask=None):
    total = segment_sum(data, segment_ids, num_segments, mask)
    count = segment_count(segment_ids, num_segments, mask, total.dtype)
    count = count.reshape(count.shape + (1,) * (total.ndim - 1))
    return total / jnp.maximum(count, 1)


def segment_max(data, segment_ids, num_segments: int, mask=None):
    """Max; empty segments yield 0 (matching torch_scatter's zero-fill)."""
    if mask is not None:
        data = jnp.where(_mask2d(mask, data), data, _NEG)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_min(data, segment_ids, num_segments: int, mask=None):
    if mask is not None:
        data = jnp.where(_mask2d(mask, data), data, -_NEG)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.where(out >= -_NEG / 2, 0.0, out)


def segment_var(data, segment_ids, num_segments: int, mask=None):
    """E[x^2] - E[x]^2 per segment (reference: aggregator.py:86-89)."""
    mean = segment_mean(data, segment_ids, num_segments, mask)
    mean_sq = segment_mean(data * data, segment_ids, num_segments, mask)
    return mean_sq - mean * mean


def segment_std(data, segment_ids, num_segments: int, mask=None, eps: float = 1e-5):
    """sqrt(relu(var) + eps) (reference: aggregator.py:92-93)."""
    return jnp.sqrt(jax.nn.relu(segment_var(data, segment_ids, num_segments, mask)) + eps)


def segment_softmax_weights(logits, segment_ids, num_segments: int, mask=None):
    """Per-segment softmax weights over entries (numerically stable two-pass:
    segment-max shift -> exp -> segment-sum normalize).  Masked entries get
    weight 0.  Replaces torch_scatter.composite.scatter_softmax."""
    if mask is not None:
        logits = jnp.where(_mask2d(mask, logits), logits, _NEG)
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(logits), segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= _NEG / 2, 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    if mask is not None:
        expd = jnp.where(_mask2d(mask, expd), expd, 0.0)
    denom = jax.ops.segment_sum(expd, segment_ids, num_segments=num_segments)
    return expd / jnp.maximum(denom[segment_ids], 1e-16)
