"""PHM linear layers: PHMLinear, PHMMLP, RealTransformer (flax.linen).

TPU-native re-design of the reference's core layer
(phc/hypercomplex/layers.py:222-420).  Parameters:

- ``W``        (n, in/n, out/n)  per-component weights,
- ``phm_rule`` (n, n, n)         contribution tensor (learnable iff learn_phm;
                                 frozen via stop_gradient otherwise),
- ``b``        (out,)            bias; init: first component block 0.0, the rest
                                 0.2.  The reference leaves ``b[out/n]``
                                 uninitialized (layers.py:276-278, off-by-one);
                                 we implement the intended semantics.

A rule shared across the network (reference's ``unique_phm``) is passed as the
``phm_rule`` call argument, overriding the layer-local parameter.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.hypercomplex.inits import glorot_normal, glorot_uniform, phm_init
from phc_gnn_tpu.hypercomplex.kron import phm_matmul
from phc_gnn_tpu.hypercomplex.rules import get_multiplication_rule
from phc_gnn_tpu.nn.activations import get_activation

__all__ = ["PHMLinear", "PHMMLP", "RealTransformer", "make_w_init", "make_rule_init", "phm_bias_init"]


def make_w_init(w_init: str, phm_dim: int):
    """Weight initializer factory; w_init in {phm, glorot-normal, glorot-uniform}
    (reference: phc/hypercomplex/layers.py:260-275)."""
    w_init = w_init.replace("_", "-")
    if w_init == "phm":
        def init(key, shape, dtype=jnp.float32):
            n, fi, fo = shape
            return phm_init(key, n, fi, fo, dtype=dtype)
    elif w_init == "glorot-normal":
        def init(key, shape, dtype=jnp.float32):
            return glorot_normal(key, shape, dtype=dtype)
    elif w_init == "glorot-uniform":
        def init(key, shape, dtype=jnp.float32):
            return glorot_uniform(key, shape, dtype=dtype)
    else:
        raise ValueError(f"unknown w_init {w_init!r}")
    return init


def make_rule_init(c_init: str, phm_dim: int):
    """Contribution-tensor initializer; c_init in {standard, random}
    (reference: phc/hypercomplex/layers.py:280-281)."""
    def init(key, shape=None, dtype=jnp.float32):
        if c_init == "random":
            # U(-1, 1), jax-native so init stays trace-safe
            return jax.random.uniform(key, (phm_dim,) * 3, dtype, -1.0, 1.0)
        return jnp.asarray(get_multiplication_rule(phm_dim, c_init), dtype)
    return init


def phm_bias_init(phm_dim: int, out_features: int):
    """Bias init: component block 0 -> 0.0, blocks 1..n-1 -> 0.2 (intended
    semantics of reference layers.py:276-278)."""
    fo = out_features // phm_dim

    def init(key, shape, dtype=jnp.float32):
        b = jnp.full((out_features,), 0.2, dtype)
        return b.at[:fo].set(0.0)

    return init


class PHMLinear(nn.Module):
    """Parameterized hypercomplex linear layer ``y = x (sum_i A_i (x) W_i) + b``
    on flat component-block inputs ``[N, in]``
    (reference: phc/hypercomplex/layers.py:222-299)."""

    in_features: int
    out_features: int
    phm_dim: int
    bias: bool = True
    w_init: str = "phm"
    c_init: str = "standard"
    learn_phm: bool = True
    shared_rule: bool = False  # rule provided per-call (network-shared)
    dtype: Optional[jnp.dtype] = None  # compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, x: jax.Array, phm_rule: Optional[jax.Array] = None) -> jax.Array:
        n = self.phm_dim
        assert self.in_features % n == 0 and self.out_features % n == 0
        w = self.param("W", make_w_init(self.w_init, n),
                       (n, self.in_features // n, self.out_features // n))
        if phm_rule is None:
            assert not self.shared_rule, "shared_rule layer needs phm_rule argument"
            phm_rule = self.param("phm_rule", make_rule_init(self.c_init, n), (n, n, n))
        if not self.learn_phm:
            phm_rule = jax.lax.stop_gradient(phm_rule)
        b = (self.param("b", phm_bias_init(n, self.out_features), (self.out_features,))
             if self.bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
            phm_rule = phm_rule.astype(self.dtype)
            b = b.astype(self.dtype) if b is not None else None
        return phm_matmul(x, phm_rule, w, b)


class PHMMLP(nn.Module):
    """2-layer PHM MLP: linear -> [norm] -> act -> linear
    (reference: phc/hypercomplex/layers.py:304-369)."""

    in_features: int
    out_features: int
    phm_dim: int
    bias: bool = True
    learn_phm: bool = True
    activation: str = "relu"
    norm: Optional[str] = None  # None | naive-batch-norm | naive-naive-batch-norm | q-batch-norm
    w_init: str = "phm"
    c_init: str = "standard"
    factor: float = 1.0
    shared_rule: bool = False
    dtype: Optional[jnp.dtype] = None
    stat_axis: Optional[str] = None  # cross-shard BN stats (parallel/halo.py)

    @nn.compact
    def __call__(self, x: jax.Array, phm_rule: Optional[jax.Array] = None,
                 training: bool = False, mask: Optional[jax.Array] = None) -> jax.Array:
        from phc_gnn_tpu.nn.norm import PHMNorm  # local import to avoid cycle

        hidden = int(self.factor * self.out_features)
        x = PHMLinear(self.in_features, hidden, self.phm_dim, self.bias,
                      self.w_init, self.c_init, self.learn_phm, self.shared_rule,
                      self.dtype, name="linear1")(x, phm_rule)
        if self.norm not in (None, "None"):
            x = PHMNorm(num_features=hidden, phm_dim=self.phm_dim,
                        norm_type=self.norm, stat_axis=self.stat_axis,
                        name="norm")(x, training=training,
                                     mask=mask)
        x = get_activation(self.activation)(x)
        x = PHMLinear(hidden, self.out_features, self.phm_dim, self.bias,
                      self.w_init, self.c_init, self.learn_phm, self.shared_rule,
                      self.dtype, name="linear2")(x, phm_rule)
        return x


class RealTransformer(nn.Module):
    """H^d -> R^(d/n) head: 'linear' (dense on the flat vector), or 'sum' /
    'mean' / 'norm' over the component axis
    (reference: phc/hypercomplex/layers.py:372-420)."""

    trafo_type: str  # linear | sum | mean | norm
    in_features: int  # flat size (n * per-component)
    phm_dim: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.trafo_type in ("linear", "sum", "mean", "norm")
        n = self.phm_dim
        if self.trafo_type == "linear":
            # xavier-uniform (gain 1) + zero bias (reference layers.py:393-397)
            return nn.Dense(self.in_features // n, use_bias=self.bias,
                            kernel_init=nn.initializers.xavier_uniform(),
                            bias_init=nn.initializers.zeros, name="affine")(x)
        d = self.in_features // n
        xs = x.reshape(x.shape[:-1] + (n, d))
        if self.trafo_type == "sum":
            return xs.sum(axis=-2)
        if self.trafo_type == "mean":
            return xs.mean(axis=-2)
        return jnp.linalg.norm(xs, axis=-2)
