"""PHM downstream feed-forward head predicting a real-valued vector.

PHM-MLP (input -> hidden... -> n*target_dim) with per-layer norm + activation +
dropout, closed by a RealTransformer to the real output
(reference: phc/hypercomplex/downstream.py:19-130).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from phc_gnn_tpu.nn.activations import get_activation
from phc_gnn_tpu.nn.dropout import phm_dropout
from phc_gnn_tpu.nn.norm import PHMNorm
from phc_gnn_tpu.nn.phm_linear import PHMLinear, RealTransformer

__all__ = ["PHMDownstreamNet"]


class PHMDownstreamNet(nn.Module):
    """Hypercomplex FFN -> real output
    (reference: phc/hypercomplex/downstream.py:19-130)."""

    in_features: int
    hidden_layers: Sequence[int]
    out_features: int  # real target dim; last PHM layer emits n * out_features
    phm_dim: int
    activation: str = "relu"
    bias: bool = True
    norm: Optional[str] = None
    w_init: str = "phm"
    c_init: str = "standard"
    dropout: Union[float, Sequence[float]] = 0.1
    learn_phm: bool = True
    same_dropout: bool = False
    real_trafo: str = "linear"
    shared_rule: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array, phm_rule=None, training: bool = False,
                 dropout_rng: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        n = self.phm_dim
        dims = list(self.hidden_layers)
        drops = ([self.dropout] * len(dims) if isinstance(self.dropout, (int, float))
                 else list(self.dropout))
        assert len(drops) == len(dims)
        act = get_activation(self.activation)
        sizes = [self.in_features] + dims + [n * self.out_features]
        rngs = (jax.random.split(dropout_rng, len(dims))
                if (training and dropout_rng is not None) else [None] * len(dims))
        for i in range(len(sizes) - 1):
            x = PHMLinear(sizes[i], sizes[i + 1], n, self.bias, self.w_init,
                          self.c_init, self.learn_phm, self.shared_rule,
                          self.dtype, name=f"affine_{i}")(x, phm_rule)
            if i < len(sizes) - 2:  # hidden layers only, not the output layer
                if self.norm not in (None, "None"):
                    x = PHMNorm(num_features=sizes[i + 1], phm_dim=n,
                                norm_type=self.norm, name=f"norm_{i}")(
                        x, training=training, mask=mask)
                x = act(x)
                if training and drops[i] > 0.0:
                    x = phm_dropout(rngs[i], x, drops[i], n, training=True,
                                    same=self.same_dropout)
        return RealTransformer(self.real_trafo, n * self.out_features, n,
                               bias=True, name="real_trafo")(
            x.astype(jnp.float32) if self.dtype is not None else x)
