"""PHM dropout with optional shared-mask-across-components semantics.

``same=True`` draws one Bernoulli mask per (row, per-component-feature) and
applies it to every hypercomplex component — the reference's ``phm_dropout``
(phc/hypercomplex/layers.py:31-55); ``same=False`` is plain inverted dropout.
Functional: the caller supplies the PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["phm_dropout"]


def phm_dropout(
    rng: jax.Array | None,
    x: jax.Array,
    p: float,
    phm_dim: int,
    training: bool = True,
    same: bool = False,
) -> jax.Array:
    """Inverted dropout on a flat component-block tensor ``[N, n*d]``.

    With ``same=True`` the mask is shared across the ``n`` components
    (reference: phc/hypercomplex/layers.py:43-55).
    """
    assert 0.0 <= p <= 1.0, f"dropout rate must be in [0, 1], got {p}"
    if not training or p == 0.0:
        return x
    keep = 1.0 - p
    if same:
        n = phm_dim
        d = x.shape[-1] // n
        xs = x.reshape(x.shape[:-1] + (n, d))
        mask = jax.random.bernoulli(rng, keep, xs.shape[:-2] + (1, d))
        xs = jnp.where(mask, xs / keep, 0.0)
        return xs.reshape(x.shape)
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
