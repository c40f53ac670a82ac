"""Feature encoders: integer-embedding (categorical) and linear (continuous).

``PHMEncoder`` runs n independent encoders (one per hypercomplex component) and
stacks to ``[N, n, d]``; ``NaivePHMEncoder`` runs one and copies it to all
components (reference: phc/hypercomplex/encoder.py:7-77,
phc/quaternion/encoder.py:9-60).

On TPU the sum-combined embedding lookup is ONE one-hot matmul over the
concatenated vocab tables: XLA lowers ``jnp.take``'s backward as a scatter-add
into the table, measured at ~118 us per table at flagship shapes vs ~21 us
for the matmul pair whose backward is just the transposed matmul
(scripts/bench_edge_ops.py, KERNELS.md) — with 3 bond tables per conv layer
the scatter path was the single largest hidden cost in the train step.
"""

from __future__ import annotations

import math
from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["IntegerEncoder", "PHMEncoder", "NaivePHMEncoder"]


class IntegerEncoder(nn.Module):
    """Per-categorical-column embeddings combined by sum or concat
    (reference: phc/quaternion/encoder.py:9-60).  Embedding weights use
    xavier-uniform with gain sqrt(2) as the reference's reset does."""

    out_dim: int
    input_dims: Sequence[int]
    combine: str = "sum"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.combine in ("sum", "concat")
        if x.ndim == 1:
            x = x[:, None]
        init = nn.initializers.variance_scaling(
            # xavier_uniform with gain sqrt(2): scale = gain^2 = 2
            scale=2.0, mode="fan_avg", distribution="uniform")
        tables = [self.param(f"embedding_{i}", init, (vocab, self.out_dim))
                  for i, vocab in enumerate(self.input_dims)]
        if self.combine == "sum":
            # one-hot matmul over the concatenated tables: sum_i T_i[x_i] ==
            # (sum_i onehot(x_i + off_i)) @ concat(T).  Forward is one MXU
            # call; backward is the transposed matmul — no scatter (~6x,
            # see module docstring).
            offs, total = [], 0
            for v in self.input_dims:
                offs.append(total)
                total += v
            # clip per feature first — jnp.take clamps out-of-range indices,
            # and the offset trick must not let a bad index match a
            # neighbouring table's rows (or nothing at all)
            hi = jnp.asarray([v - 1 for v in self.input_dims], x.dtype)
            idx = jnp.clip(x, 0, hi[None, :]) \
                + jnp.asarray(offs, x.dtype)[None, :]              # [B, F]
            vocab_iota = jnp.arange(total, dtype=idx.dtype)
            # the [B, F, V] compare-reduce fuses into the sum on TPU (checked
            # in the profile trace); total V for the OGB/mol vocabularies is
            # O(100).  If a dataset with a large concatenated vocab is ever
            # added, switch to per-feature one-hots accumulated into [B, V]
            # to bound the transient (ADVICE r2).
            onehot = jnp.sum(
                (idx[:, :, None] == vocab_iota[None, None, :])
                .astype(jnp.float32), axis=1)                       # [B, V]
            return onehot @ jnp.concatenate(tables, axis=0)
        outs = [jnp.take(t, x[:, i], axis=0) for i, t in enumerate(tables)]
        return jnp.concatenate(outs, axis=-1)


class _SingleEncoder(nn.Module):
    """One component's encoder: IntegerEncoder for categorical input dims,
    Dense for a continuous input dim."""

    out_dim: int
    input_dims: Union[Sequence[int], int]
    combine: str = "sum"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if isinstance(self.input_dims, int):
            # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            bound = 1.0 / math.sqrt(self.input_dims)

            def centered_uniform(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            return nn.Dense(self.out_dim, use_bias=True,
                            kernel_init=centered_uniform,
                            bias_init=centered_uniform, name="linear")(x)
        return IntegerEncoder(self.out_dim, self.input_dims, self.combine,
                              name="integer")(x)


class PHMEncoder(nn.Module):
    """n independent encoders -> stacked [N, n, out_dim]
    (reference: phc/hypercomplex/encoder.py:7-41)."""

    out_dim: int  # per-component dim
    input_dims: Union[Sequence[int], int]
    phm_dim: int
    combine: str = "sum"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        outs = [
            _SingleEncoder(self.out_dim, self.input_dims, self.combine,
                           name=f"encoder_{c}")(x)
            for c in range(self.phm_dim)
        ]
        return jnp.stack(outs, axis=1)


class NaivePHMEncoder(nn.Module):
    """One encoder copied to all n components
    (reference: phc/hypercomplex/encoder.py:45-77)."""

    out_dim: int
    input_dims: Union[Sequence[int], int]
    phm_dim: int
    combine: str = "sum"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = _SingleEncoder(self.out_dim, self.input_dims, self.combine,
                             name="encoder")(x)
        return jnp.broadcast_to(out[:, None, :], (out.shape[0], self.phm_dim, out.shape[-1]))
