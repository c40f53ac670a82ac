"""pcba-canonical single-chip recipe bench (VERDICT r3 #4).

The reference pcba config (benchmarks/README.md:46-78, run_script_pcba_phm2.sh:
batch 512, 7x512-wide PHM-2, sum aggregation, 128-task BCE) needs ~16k nodes
per batch — past the gather-locality cliff (KERNELS.md).  This script times
the three single-chip recipes for that logical batch on the real chip:

  A. one 16384n/32768e bucket, plain step
  B. grad_accum K=2 over 8192n/16384e sub-batches (exact weighted grads)
  C. grad_accum K=4 over 4096n/8192e sub-batches

plus the 4096x512 and 16384x512 fused masked-BN kernels (single-block vs
grid-blocked Chan-combine).  All variants attach scan + sender plans.
Prints ms per LOGICAL 512-graph batch and real-edges/s.  Slope method.
"""
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.data import synthetic_batch
from phc_gnn_tpu.data.features import ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.ops.stream_scan import attach_scan_plan
from phc_gnn_tpu.parallel.dp import stack_batches
from phc_gnn_tpu.train import (create_train_state, make_accum_train_step,
                               make_optimizer, make_train_step)
from phc_gnn_tpu.train.loss import masked_bce_with_logits as masked_bce

print("backend:", jax.default_backend(), flush=True)
DIM = 512
model = PHCGNN(
    phm_dim=2, atom_input_dims=ATOM_FEATURE_DIMS,
    bond_input_dims=BOND_FEATURE_DIMS, atom_encoded_dim=DIM,
    mp_layers=(DIM,) * 7, dropout_mpnn=(0.1,) * 7,
    downstream_layers=(768, 256), target_dim=128, dropout_dn=(0.3, 0.1),
    msg_aggr="sum", mlp_mp=False, sc_type="last")

tx = make_optimizer(5e-4)
lr = jnp.float32(5e-4)
loss_fn = lambda out, b: masked_bce(out, b.y)  # noqa: E731


def make_sub(bs, n, e, seed):
    b = synthetic_batch(batch_size=bs, num_nodes=n, num_edges=e, seed=seed,
                        target_dim=128)
    return attach_scan_plan(b)


def slope_steps(fn, state, batch, k1=5, k2=25, reps=3):
    @functools.partial(jax.jit, static_argnums=(2,))
    def steps(state, batch, k):
        def body(s, _):
            s, loss, _ = fn(s, batch, lr)
            return s, loss
        _, losses = jax.lax.scan(body, state, None, length=k)
        return jnp.sum(losses)

    float(steps(state, batch, k1))

    def t(k):
        t0 = time.perf_counter()
        float(steps(state, batch, k))
        return time.perf_counter() - t0
    return (min(t(k2) for _ in range(reps))
            - min(t(k1) for _ in range(reps))) / (k2 - k1)


results = {}
# A: one big bucket
big = make_sub(512, 16384, 32768, 0)
edges_logical = int(big.count_edges())
state = create_train_state(model, tx, big, jax.random.key(0, impl="rbg"),
                           init_rng=jax.random.key(0))
stepA = make_train_step(model, tx, loss_fn, weight_decay=1e-4, donate=False)
tA = slope_steps(stepA, state, big)
print(f"A one 16k bucket      : {tA*1e3:7.2f} ms/logical-batch "
      f"({edges_logical/tA/1e6:.2f} M edges/s)", flush=True)
results["A"] = tA

# B/C: grad_accum over K sub-batches
for name, k, n, e in (("B", 2, 8192, 16384), ("C", 4, 4096, 8192)):
    subs = [make_sub(512 // k, n, e, 10 + i) for i in range(k)]
    stacked = stack_batches(subs)
    edges_k = int(sum(int(s.count_edges()) for s in subs))
    state_k = create_train_state(model, tx, subs[0],
                                 jax.random.key(0, impl="rbg"),
                                 init_rng=jax.random.key(0))
    stepK = make_accum_train_step(model, tx, loss_fn, weight_decay=1e-4,
                                  donate=False, loss_name="bce")
    tK = slope_steps(stepK, state_k, stacked)
    print(f"{name} grad_accum {k}x{n}n : {tK*1e3:7.2f} ms/logical-batch "
          f"({edges_k/tK/1e6:.2f} M edges/s)", flush=True)
    results[name] = tK

# fused masked BN at pcba width
from phc_gnn_tpu.ops.fused_bn import (FUSED_BN_VMEM_LIMIT, fused_masked_bn,
                                      fused_masked_bn_blocked)

for n in (4096, 16384):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, DIM)),
                    jnp.float32)
    mask = jnp.asarray(np.random.default_rng(1).random(n) > 0.1)

    scale = jnp.ones((DIM,), jnp.float32)
    bias = jnp.zeros((DIM,), jnp.float32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def bn_loop(x, k):
        def body(i, acc):
            kz = jnp.int32(jnp.isnan(acc))
            kern = (fused_masked_bn if n * DIM * 4 <= FUSED_BN_VMEM_LIMIT
                    else fused_masked_bn_blocked)  # the nn/norm.py gate
            out, _, _ = kern(x + kz, mask, scale, bias)
            return acc * 0.5 + jnp.sum(jnp.abs(out))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(bn_loop(x, 5))

    def t(k):
        t0 = time.perf_counter()
        float(bn_loop(x, k))
        return time.perf_counter() - t0
    tb = (min(t(105) for _ in range(3)) - min(t(5) for _ in range(3))) / 100
    print(f"fused BN {n}x{DIM}    : {tb*1e6:7.1f} us", flush=True)
