"""Measure the >=16k gather-locality cliff and the sender-plan fix
(VERDICT r2 #4): flagship train step at 1x/4x/8x bucket sizes with the
message-gather backward as XLA scatter (no sender plan) vs streamed
segment-sum (sender plan attached).  Reports ms/step and ns/real-edge; the
cliff shows as superlinear ns/edge growth."""
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
loss_fn = lambda out, b: masked_l1(out, b.y)  # noqa: E731


def slope_steps(state, batch, step, n1=10, n2=60, reps=3):
    lr = jnp.float32(1e-3)

    def run(n):
        s = jax.tree_util.tree_map(jnp.copy, state)
        t0 = None
        for i in range(n):
            s, loss, _ = step(s, batch, lr)
        return loss

    # warm up / compile
    jax.block_until_ready(run(2))

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n2) - t(n1)) / (n2 - n1)


for mult in (1, 4, 8):
    nn_, ee = 4096 * mult, 8192 * mult
    batch = synthetic_batch(batch_size=128 * mult, num_nodes=nn_,
                            num_edges=ee, seed=0)
    real_edges = int(batch.count_edges())
    for sender_plan in (False, True):
        b = attach_scan_plan(batch, sender_plan=sender_plan)
        state = create_train_state(model, tx, b, jax.random.key(0))
        step = make_train_step(model, tx, loss_fn, weight_decay=0.1,
                               weight_decay2=0.01, donate=False)
        dt = slope_steps(state, b, step)
        print(f"nodes {nn_:6d} edges {ee:6d} sender_plan={int(sender_plan)} "
              f"step {dt * 1e3:7.3f} ms  {dt / real_edges * 1e9:6.1f} ns/edge",
              flush=True)
