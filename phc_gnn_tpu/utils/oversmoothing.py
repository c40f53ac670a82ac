"""Oversmoothing diagnostics: PairNorm's row-diff / col-diff
(reference: phc/quaternion/misc.py:7-42)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["row_diff", "col_diff"]


def row_diff(x: jax.Array) -> jax.Array:
    """Mean pairwise L2 distance between node-feature rows."""
    d = x[:, None, :] - x[None, :, :]
    return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12))


def col_diff(x: jax.Array) -> jax.Array:
    """Mean pairwise L1 distance between L1-normalized feature columns."""
    xn = x / jnp.maximum(jnp.sum(jnp.abs(x), axis=0, keepdims=True), 1e-12)
    d = xn[:, :, None] - xn[:, None, :]
    return jnp.mean(jnp.sum(jnp.abs(d), axis=0))
