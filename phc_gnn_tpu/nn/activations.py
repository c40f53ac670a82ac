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


# -- experimental quaternion gating activations on stacked [..., n, d] tensors
# (reference: phc/quaternion/activations.py:50-105) --

def qrelu_naive(q: jax.Array) -> jax.Array:
    """Pass the whole hypercomplex number iff the component sum is positive
    (reference: activations.py:50-67)."""
    gate = (jnp.sum(q, axis=-2, keepdims=True) > 0).astype(q.dtype)
    return q * gate


def qrelu_naive2(q: jax.Array) -> jax.Array:
    """Pass iff every component is positive (reference: activations.py:70-85)."""
    gate = jnp.all(q > 0, axis=-2, keepdims=True).astype(q.dtype)
    return q * gate


def interaction_gate(q: jax.Array) -> jax.Array:
    """Norm-based interaction factor f = |q| / max(|q|, mean_d |q|)
    (reference: activations.py:88-93)."""
    norm = jnp.linalg.norm(q, axis=-2)
    c = jnp.mean(norm, axis=-1, keepdims=True)
    return norm / jnp.maximum(norm, c)


def qrelu_interaction(q: jax.Array) -> jax.Array:
    """relu(f * q) with the interaction gate (reference: activations.py:96-99)."""
    return jax.nn.relu(q * interaction_gate(q)[..., None, :])


def qswish_interaction(q: jax.Array) -> jax.Array:
    """swish(f * q) with the interaction gate (reference: activations.py:102-105)."""
    return jax.nn.silu(q * interaction_gate(q)[..., None, :])


def get_activation(name: str) -> Callable:
    """Activation registry (reference: phc/quaternion/activations.py:134-147)."""
    name = name.lower()
    if name in ("none", ""):
        return _identity
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}; valid: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]
