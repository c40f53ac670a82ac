"""Measure the >=16k gather-locality cliff and the sender-plan fix
(VERDICT r2 #4): flagship train step at 1x/4x/8x bucket sizes with the
message-gather backward as XLA scatter (no sender plan) vs streamed
segment-sum (sender plan attached).  Reports ms/step and ns/real-edge; the
cliff shows as superlinear ns/edge growth.  Steps run inside one jitted
lax.scan (per-step dispatch through the tunnel would swamp the slope).

Usage: python scripts/bench_gather_cliff.py [mult ...]   (default: 1 4 8)
"""
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.ops.stream_scan import attach_scan_plan
from phc_gnn_tpu.train import create_train_state, make_optimizer, make_train_step
from phc_gnn_tpu.train.loss import masked_l1

print("backend:", jax.default_backend(), flush=True)
DIM = 200
model = PHCGNN(
    phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS, bond_input_dims=ZINC_BOND_DIMS,
    atom_encoded_dim=DIM, mp_layers=(DIM,) * 4, dropout_mpnn=(0.1,) * 4,
    downstream_layers=(DIM, DIM // 2), target_dim=1, dropout_dn=(0.2, 0.1),
    msg_aggr="softmax", mlp_mp=True, sc_type="last")
tx = make_optimizer(1e-3, grad_clip=2.0)
step = make_train_step(model, tx, lambda out, b: masked_l1(out, b.y),
                       weight_decay=0.1, donate=False)
lr = jnp.float32(1e-3)


@functools.partial(jax.jit, static_argnums=(2,))
def steps(state, batch, k):
    def body(s, _):
        s, loss, _ = step(s, batch, lr)
        return s, loss

    _, losses = jax.lax.scan(body, state, None, length=k)
    return jnp.sum(losses)


def slope(state, batch, k1=10, k2=60):
    def timed(k):
        float(steps(state, batch, k))  # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(steps(state, batch, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


mults = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
for mult in mults:
    nn_, ee = 4096 * mult, 8192 * mult
    batch = synthetic_batch(batch_size=128 * mult, num_nodes=nn_,
                            num_edges=ee, seed=0)
    real_edges = int(batch.count_edges())
    for sender_plan in (False, True):
        b = attach_scan_plan(batch, sender_plan=sender_plan)
        state = create_train_state(model, tx, b, jax.random.key(0, impl="rbg"),
                                   init_rng=jax.random.key(0))
        dt = slope(state, b)
        print(f"nodes {nn_:6d} edges {ee:6d} sender_plan={int(sender_plan)} "
              f"step {dt * 1e3:7.3f} ms  {dt / real_edges * 1e9:6.1f} ns/edge",
              flush=True)
