"""Layout bijection between flat component-block and stacked PHM tensors.

The framework's documented convention (see package docstring): flat
``[..., n*d]`` stores component blocks consecutively; stacked ``[..., n, d]``
makes the component axis explicit.  These helpers replace the reference's
``ensure_first_ax`` axis shuffling (phc/hypercomplex/utils.py:96-119) with an
explicit, shape-checked bijection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["to_stacked", "to_flat"]


def to_stacked(x: jax.Array, phm_dim: int) -> jax.Array:
    """[..., n*d] -> [..., n, d]."""
    assert x.shape[-1] % phm_dim == 0, (x.shape, phm_dim)
    return x.reshape(x.shape[:-1] + (phm_dim, x.shape[-1] // phm_dim))


def to_flat(x: jax.Array) -> jax.Array:
    """[..., n, d] -> [..., n*d]."""
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
