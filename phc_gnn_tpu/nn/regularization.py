"""PHM weight / multiplication-rule regularization over parameter pytrees.

The reference walks ``named_modules`` and norms every ``W`` / ``phm_rule``
attribute (phc/hypercomplex/regularization.py:4-23); here we walk the flax
param pytree and select leaves by their parameter name — same coverage
(every PHMLinear contributes), purely functional.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["phm_weight_regularization", "multiplication_rule_regularization"]


def _leaves_named(params, name: str):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = path[-1]
        leaf_name = getattr(key, "key", getattr(key, "name", None))
        if leaf_name == name:
            out.append(leaf)
    return out


def phm_weight_regularization(params, p: int = 2):
    """sum over PHM weights W (n, fi, fo) of ||W||_p over the component axis,
    averaged over entries (reference: phc/hypercomplex/regularization.py:15-23)."""
    assert p in (1, 2)
    reg = 0.0
    for w in _leaves_named(params, "W"):
        if p == 1:
            norm = jnp.sum(jnp.abs(w), axis=0)
        else:
            norm = jnp.sqrt(jnp.sum(w * w, axis=0))
        reg = reg + jnp.mean(norm)
    return reg


def multiplication_rule_regularization(params, p: int = 1):
    """sum over contribution tensors of the full ||.||_p norm
    (reference: phc/hypercomplex/regularization.py:4-12)."""
    assert p in (1, 2)
    reg = 0.0
    for rule in _leaves_named(params, "phm_rule"):
        if p == 1:
            reg = reg + jnp.sum(jnp.abs(rule))
        else:
            reg = reg + jnp.sqrt(jnp.sum(rule * rule))
    return reg
