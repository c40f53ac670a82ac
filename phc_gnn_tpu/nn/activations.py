"""Split (component-wise) activations.

On plain arrays a "split" hypercomplex activation is just the elementwise
activation — the component axis is an ordinary axis — so the registry maps names
to jax.nn functions with the reference's torch defaults
(reference: phc/quaternion/activations.py:120-147).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["get_activation", "ACTIVATIONS"]


def _identity(x):
    return x


ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "elu": lambda x: jax.nn.elu(x, alpha=1.0),
    "selu": jax.nn.selu,
    "swish": jax.nn.silu,
    "identity": _identity,
}


def get_activation(name: str) -> Callable:
    """Activation registry (reference: phc/quaternion/activations.py:134-147)."""
    name = name.lower()
    if name in ("none", ""):
        return _identity
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}; valid: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]
