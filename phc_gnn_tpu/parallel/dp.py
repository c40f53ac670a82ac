"""Data-parallel training over a device mesh (dp axis).

Each device holds one full padded GraphsTuple (arrays stacked with a leading
device axis, sharded over ``dp``); the jitted step runs per-device
forward/backward under shard_map, cross-device-means the gradients (psum/n) and
the updated BN running stats, and applies one replicated optimizer update —
gradient DP reduction riding ICI as in SURVEY.md section 5.8.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from phc_gnn_tpu.graph.batch import GraphsTuple
from phc_gnn_tpu.train.state import TrainState, apply_optimizer, make_loss_and_aux

__all__ = ["stack_batches", "shard_batch", "make_dp_train_step"]


def stack_batches(batches) -> GraphsTuple:
    """Stack per-device GraphsTuples along a new leading device axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def shard_batch(stacked: GraphsTuple, mesh: Mesh) -> GraphsTuple:
    """Place a device-stacked batch with the leading axis over ``dp``."""
    spec = NamedSharding(mesh, P(("dp",)))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec), stacked)


def make_dp_train_step(model, tx, loss_fn: Callable, mesh: Mesh,
                       weight_decay: float = 0.0, weight_decay2: float = 0.0,
                       reg_p: int = 2, donate: bool = True):
    """Build a jitted DP train step: state replicated, batch sharded over dp.

    Batch stats are cross-device averaged after the local update (running-stat
    sync; normalization itself uses local-shard statistics — documented
    divergence from single-device full-batch BN).
    """
    n_dp = mesh.shape["dp"]

    def device_step(state: TrainState, batch: GraphsTuple, lr: jax.Array):
        # batch arrives with leading device axis of size 1 inside shard_map
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = jax.random.fold_in(state.rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        loss_and_aux = make_loss_and_aux(
            model, loss_fn, weight_decay, weight_decay2, reg_p,
            state.batch_stats, batch, rng, lr)
        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        new_stats = jax.lax.pmean(new_stats, "dp")
        new_params, new_opt_state = apply_optimizer(tx, grads, state, lr)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt_state, step=state.step + 1), loss

    state_spec = P()  # replicated
    batch_spec = P(("dp",))

    sharded_step = shard_map(
        device_step, mesh=mesh,
        in_specs=(state_spec, batch_spec, P()),
        out_specs=(state_spec, P()),
        check_vma=False)

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())
