"""Verify the streaming-scan wiring end-to-end on the real TPU chip.

Drives the public API: flagship PHCGNN forward + train steps on a synthetic
padded batch with and without a scan plan attached — outputs must agree and
loss must decrease with the kernel in the loop.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.ops.stream_scan import attach_scan_plan
from phc_gnn_tpu.train import create_train_state, make_optimizer, make_train_step
from phc_gnn_tpu.train.loss import masked_l1

print("backend:", jax.default_backend(), flush=True)
dim = 64
model = PHCGNN(phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS,
               bond_input_dims=ZINC_BOND_DIMS, atom_encoded_dim=dim,
               mp_layers=(dim, dim), dropout_mpnn=(0.0, 0.0),
               downstream_layers=(32, 16), target_dim=1,
               dropout_dn=(0.0, 0.0), msg_aggr="softmax", mlp_mp=True,
               sc_type="last")
plain = synthetic_batch(batch_size=32, num_nodes=1024, num_edges=2048, seed=0)
planned = attach_scan_plan(plain)

variables = model.init(jax.random.key(0), plain, training=False)
f = jax.jit(lambda v, b: model.apply(v, b, training=False))
t0 = time.time()
out_plain = np.asarray(f(variables, plain))
out_plan = np.asarray(f(variables, planned))
err = np.max(np.abs(out_plain - out_plan)) / (np.max(np.abs(out_plain)) + 1e-12)
print(f"forward parity rel-err {err:.2e}  (compile+run {time.time()-t0:.0f}s)",
      flush=True)
assert err < 5e-3, err

tx = make_optimizer(1e-3, grad_clip=2.0)
state = create_train_state(model, tx, planned, jax.random.key(0))
step = make_train_step(model, tx, lambda out, b: masked_l1(out, b.y),
                       donate=False)
losses = []
for i in range(6):
    state, loss, _ = step(state, planned, jnp.float32(1e-3))
    losses.append(float(loss))
print("losses:", [round(l, 4) for l in losses], flush=True)
assert all(np.isfinite(losses)), losses
assert losses[-1] < losses[0], losses
print("OK", flush=True)
