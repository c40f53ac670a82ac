"""Seeding helper (reference: benchmarks/utils.py:22-26).

In JAX, per-run determinism flows from the PRNG key; this helper additionally
seeds numpy (host-side batch shuffling / plan randomness)."""

from __future__ import annotations

import random

import jax
import numpy as np

__all__ = ["set_seed_all"]


def set_seed_all(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
