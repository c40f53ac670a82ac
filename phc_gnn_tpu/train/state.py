"""Functional train state and jitted train/eval steps.

The reference's per-batch hot loop (train_hiv.py:170-204: forward, masked loss,
explicit lr*wd regularization terms, backward, clip, Adam step) becomes one
jitted function over a pytree state; BN running stats thread through as a
mutable collection; dropout keys fold from the state rng.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from phc_gnn_tpu.graph.batch import GraphsTuple
from phc_gnn_tpu.nn.regularization import (
    multiplication_rule_regularization,
    phm_weight_regularization,
)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_accum_train_step",
           "make_eval_step", "make_scan_train_steps", "make_scan_eval_steps",
           "make_loss_and_aux",
           "apply_optimizer"]


@struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    rng: jax.Array
    step: jax.Array  # int32 scalar


def create_train_state(model, tx, sample_batch: GraphsTuple, rng: jax.Array,
                       init_rng: Optional[jax.Array] = None) -> TrainState:
    init_rng = init_rng if init_rng is not None else rng
    variables = model.init(init_rng, sample_batch, training=True,
                           dropout_rng=jax.random.fold_in(init_rng, 1))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), rng=rng,
                      step=jnp.zeros((), jnp.int32))


def make_loss_and_aux(model, loss_fn, weight_decay, weight_decay2, reg_p,
                      batch_stats, batch, rng, lr):
    """Shared loss closure for all step factories: masked task loss + the
    reference's lr-scaled weight/rule regularization (train_hiv.py:180-191)."""

    def loss_and_aux(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, training=True, dropout_rng=rng, mutable=["batch_stats"])
        loss = loss_fn(out, batch)
        if weight_decay > 0.0:
            loss = loss + lr * weight_decay * phm_weight_regularization(
                params, p=reg_p)
        if weight_decay2 > 0.0:
            loss = loss + lr * weight_decay2 * (
                multiplication_rule_regularization(params, p=1))
        return loss, (out, updates.get("batch_stats", batch_stats))

    return loss_and_aux


def apply_optimizer(tx, grads, state: TrainState, lr: jax.Array):
    """Unit-scale optimizer update x the live learning rate (see
    train/optim.py: lr lives outside the optimizer state)."""
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
    return optax.apply_updates(state.params, updates), new_opt_state


def make_train_step(model, tx, loss_fn: Callable,
                    weight_decay: float = 0.0, weight_decay2: float = 0.0,
                    reg_p: int = 2, donate: bool = True):
    """Build the jitted train step.

    loss_fn(logits, batch) -> scalar.  Regularization follows the reference:
    ``loss += lr*wd*phm_weight_reg + lr*wd2*rule_reg`` (train_hiv.py:180-191),
    with lr passed in to track the plateau scheduler.
    """

    def step(state: TrainState, batch: GraphsTuple, lr: jax.Array):
        rng = jax.random.fold_in(state.rng, state.step)
        loss_and_aux = make_loss_and_aux(
            model, loss_fn, weight_decay, weight_decay2, reg_p,
            state.batch_stats, batch, rng, lr)
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        new_params, new_opt_state = apply_optimizer(tx, grads, state, lr)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, loss, out

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    def step(state: TrainState, batch: GraphsTuple):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, training=False)

    return jax.jit(step)


def make_accum_train_step(model, tx, loss_fn: Callable,
                          weight_decay: float = 0.0, weight_decay2: float = 0.0,
                          reg_p: int = 2, donate: bool = True,
                          loss_name: str = "l1"):
    """Gradient accumulation: ONE optimizer step from the exact load-weighted
    mean gradient of K same-shape sub-batches (stacked on a leading axis).

    This is data parallelism over time — the same weighted combination as
    parallel/dp.py (a fully-masked dummy pad sub-batch contributes nothing) —
    and the single-chip answer to very large logical batches: pcba's
    512-graph batch runs as K VMEM-friendly sub-batches instead of one
    16k-node batch whose node-table gathers fall off XLA's fast path
    (KERNELS.md round-3 cliff analysis).  Returns (state, loss, outs [K, G, T]).
    """
    from phc_gnn_tpu.parallel.dp import loss_weight

    def step(state: TrainState, batches: GraphsTuple, lr: jax.Array):
        base_rng = jax.random.fold_in(state.rng, state.step)

        def body(carry, pair):
            i, batch = pair
            gsum, lsum, wsum, ssum, bsum = carry
            rng = jax.random.fold_in(base_rng, i)
            loss_and_aux = make_loss_and_aux(
                model, loss_fn, weight_decay, weight_decay2, reg_p,
                state.batch_stats, batch, rng, lr)
            (loss, (out, new_stats)), grads = jax.value_and_grad(
                loss_and_aux, has_aux=True)(state.params)
            w = loss_weight(batch, loss_name)
            w_bn = jnp.sum(batch.node_mask).astype(jnp.float32)
            gsum = jax.tree_util.tree_map(lambda a, g: a + w * g, gsum, grads)
            ssum = jax.tree_util.tree_map(lambda a, s: a + w_bn * s, ssum,
                                          new_stats)
            return (gsum, lsum + w * loss, wsum + w, ssum, bsum + w_bn), out

        k = jax.tree_util.tree_leaves(batches)[0].shape[0]
        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zeros_s = jax.tree_util.tree_map(
            lambda s: jnp.zeros_like(s, dtype=jnp.float32), state.batch_stats)
        carry0 = (zeros_g, jnp.zeros(()), jnp.zeros(()), zeros_s,
                  jnp.zeros(()))
        (gsum, lsum, wsum, ssum, bsum), outs = jax.lax.scan(
            body, carry0, (jnp.arange(k), batches))
        wsum = jnp.maximum(wsum, 1e-9)
        bsum = jnp.maximum(bsum, 1e-9)
        grads = jax.tree_util.tree_map(lambda g: g / wsum, gsum)
        loss = lsum / wsum
        new_stats = jax.tree_util.tree_map(lambda s: s / bsum, ssum)
        new_params, new_opt_state = apply_optimizer(tx, grads, state, lr)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, loss, outs

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_scan_train_steps(model, tx, loss_fn: Callable,
                          weight_decay: float = 0.0, weight_decay2: float = 0.0,
                          reg_p: int = 2):
    """Scan a whole stack of same-shape batches inside one jitted call.

    batches: a GraphsTuple whose arrays carry a leading step axis [S, ...]
    (stack same-bucket batches with jax.tree.map(jnp.stack, ...)).  Removes the
    per-step dispatch round-trip — essential on tunneled TPUs, good practice
    everywhere.  Returns (state, losses [S], outs [S, G, T]).
    """
    inner = make_train_step(model, tx, loss_fn, weight_decay, weight_decay2,
                            reg_p, donate=False)

    def steps(state: TrainState, batches: GraphsTuple, lr: jax.Array):
        def body(s, batch):
            s, loss, out = inner(s, batch, lr)
            return s, (loss, out)

        state, (losses, outs) = jax.lax.scan(body, state, batches)
        return state, losses, outs

    return jax.jit(steps, donate_argnums=(0,))


def make_scan_eval_steps(model):
    """Scan evaluation over a stack of same-shape batches in one jit call
    (same dispatch-amortization as make_scan_train_steps, for the eval loop).

    batches: GraphsTuple with a leading step axis [S, ...]; returns outs
    [S, G, T]."""

    def steps(state: TrainState, batches: GraphsTuple):
        def body(_, batch):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch, training=False)
            return None, out

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    return jax.jit(steps)
