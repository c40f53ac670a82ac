"""Optimizer and LR scheduling: Adam + ReduceLROnPlateau + grad clipping.

The reference uses torch Adam over parameter groups that all share the same lr
(the groups exist only for bookkeeping — train_hiv.py:266-285), weight decay
realized as explicit regularization terms added to the loss
(train_hiv.py:180-191), plus ``ReduceLROnPlateau`` (factor/patience/mode) and
global-norm grad clipping (train_hiv.py:198-200).

Here: optax adam with an injected learning-rate state so the host-side plateau
scheduler can update lr without recompiling the jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import optax

__all__ = ["make_optimizer", "ReduceLROnPlateau"]


def make_optimizer(lr: float, grad_clip: float = 0.0,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping.

    The learning rate is applied by the train step (updates are produced at
    unit scale: scale_by_adam + scale(-1)), so the host-side plateau scheduler
    changes lr without touching optimizer state or recompiling; ``lr`` here is
    recorded for reference only.
    """
    chain = []
    if grad_clip and grad_clip > 0.0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(eps=eps))
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


@dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler matching torch semantics
    (mode max/min, factor, patience, min_lr; train_hiv.py:287-289)."""

    lr: float
    mode: str = "max"  # max | min
    factor: float = 0.75
    patience: int = 10
    min_lr: float = 1e-6
    threshold: float = 1e-4

    best: float = field(default=None, init=False)
    num_bad: int = field(default=0, init=False)

    def step(self, metric: float) -> float:
        """Feed the epoch's validation metric; returns the (possibly reduced) lr."""
        if self.best is None:
            self.best = metric
            return self.lr
        # Exactly torch's rel-threshold rule (torch/optim/lr_scheduler.py
        # ReduceLROnPlateau.is_better): best*(1+threshold) for max,
        # best*(1-threshold) for min, REGARDLESS of the sign of best.  For
        # negative metrics this makes the improvement bar *easier* (max mode)
        # — arguably surprising, but it is the semantics the reference trains
        # under (train_hiv.py:287-289); divergence note in PARITY.md.
        if self.mode == "max":
            improved = metric > self.best * (1.0 + self.threshold)
        else:
            improved = metric < self.best * (1.0 - self.threshold)
        if improved:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
