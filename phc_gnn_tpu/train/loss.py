"""Losses with NaN-target masking, over padded graph batches.

Reference semantics: BCE-with-logits on the non-NaN mask (train_hiv.py:174-178,
train_pcba.py multi-task), CrossEntropy for ppa/mnist/cifar10 (train_ppa.py:175),
L1/MAE for ZINC (train_zinc.py:193).  Padding graphs carry NaN labels so the
same mask removes them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_bce_with_logits", "masked_l1", "masked_cross_entropy",
           "masked_mse"]


def masked_bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean BCE over finite targets (multi-task safe)."""
    mask = jnp.isfinite(targets)
    t = jnp.where(mask, targets, 0.0)
    per = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per = jnp.where(mask, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(mask), 1)


def masked_l1(logits: jax.Array, targets: jax.Array) -> jax.Array:
    mask = jnp.isfinite(targets)
    per = jnp.where(mask, jnp.abs(logits - jnp.where(mask, targets, 0.0)), 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(mask), 1)


def masked_mse(logits: jax.Array, targets: jax.Array) -> jax.Array:
    mask = jnp.isfinite(targets)
    diff = jnp.where(mask, logits - jnp.where(mask, targets, 0.0), 0.0)
    return jnp.sum(diff * diff) / jnp.maximum(jnp.sum(mask), 1)


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         graph_mask: jax.Array) -> jax.Array:
    """Softmax CE with integer labels [G]; padding graphs masked out."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels_safe = jnp.where(graph_mask, labels, 0).astype(jnp.int32)
    per = -jnp.take_along_axis(logp, labels_safe[:, None], axis=-1)[:, 0]
    per = jnp.where(graph_mask, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(graph_mask), 1)
