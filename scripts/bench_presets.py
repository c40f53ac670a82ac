"""Price the OTHER reference model families on chip (VERDICT r4 next #7).

bench.py's flagship is add-skip/naive-BN/softmax.  This script measures, at
the same 4096n/8192e flagship bucket and width, the train step + serving
eval of:

  - add       : the flagship itself (reference point, same as bench.py)
  - concat    : PHMSkipConnectConcat semantics (--type concat) — the
                dim-growth path: conv_i input = mp[i-1] + embed, so the
                GEMM/stream mix shifts toward wider matmuls
                (reference models.py:271-517)
  - quat-wbn  : the quaternion family's whitening 'q-batch-norm'
                (reference quaternion/norm.py:104-276) in place of naive BN
                — prices the closed-form 4x4 Cholesky + gamma mix per layer

Slope method, one jit per config (dynamic trip count).  Usage (on TPU):
python scripts/bench_presets.py
"""
import sys, os, time, functools, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.train import (create_train_state, make_eval_step,
                               make_optimizer, make_train_step)
from phc_gnn_tpu.train.loss import masked_l1

DIM = 200
CONFIGS = {
    "add": dict(sc="add", norm="naive-batch-norm"),
    "concat": dict(sc="concat", norm="naive-batch-norm"),
    "quat-wbn": dict(sc="add", norm="q-batch-norm"),
}


def build(sc, norm):
    return PHCGNN(
        phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS,
        bond_input_dims=ZINC_BOND_DIMS, atom_encoded_dim=DIM,
        mp_layers=(DIM,) * 4, dropout_mpnn=(0.1,) * 4,
        downstream_layers=(200, 100), target_dim=1, dropout_dn=(0.2, 0.1),
        msg_aggr="softmax", mlp_mp=True,
        sc_type="last" if sc == "add" else "first", skip_connect=sc,
        norm_mp=norm, norm_dn="naive-batch-norm")


def slope(fn, k1=10, k2=110):
    def timed(k):
        jax.block_until_ready(fn(k))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k))
        return time.perf_counter() - t0
    return (timed(k2) - timed(k1)) / (k2 - k1)


batch = synthetic_batch(batch_size=128, num_nodes=4096, num_edges=8192,
                        seed=0)
if jax.default_backend() == "tpu":
    from phc_gnn_tpu.ops.stream_scan import attach_scan_plan
    batch = attach_scan_plan(batch)
real_edges = int(batch.count_edges())

results = {}
for name, c in CONFIGS.items():
    model = build(c["sc"], c["norm"])
    tx = make_optimizer(1e-3, grad_clip=2.0)
    state = create_train_state(model, tx, batch,
                               jax.random.key(0, impl="rbg"),
                               init_rng=jax.random.key(0))
    step = make_train_step(model, tx, lambda o, b: masked_l1(o, b.y),
                           weight_decay=0.1, donate=False)
    lr = jnp.float32(1e-3)

    @functools.partial(jax.jit, static_argnums=(2,))
    def steps(state, batch, k, _step=step):
        def body(s, _):
            s, loss, _ = _step(s, batch, lr)
            return s, loss
        _, losses = jax.lax.scan(body, state, None, length=k)
        return jnp.sum(losses)

    t_train = slope(lambda k: steps(state, batch, k))

    ev = make_eval_step(model)

    @functools.partial(jax.jit, static_argnums=(1,))
    def eval_steps(batch, k, _ev=ev, _state=state):
        def body(acc, _):
            z = jnp.int32(jnp.isnan(acc))
            b = batch.replace(nodes=batch.nodes + z)
            return acc + jnp.sum(_ev(_state, b)), None
        total, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return total
    t_eval = slope(lambda k: eval_steps(batch, k))

    results[name] = {
        "train_ms": round(t_train * 1e3, 3),
        "train_edges_per_s": round(real_edges / t_train, 0),
        "eval_ms": round(t_eval * 1e3, 3),
        "eval_edges_per_s": round(real_edges / t_eval, 0),
        "params": int(sum(np.prod(l.shape) for l in
                          jax.tree_util.tree_leaves(state.params))),
    }
    print(name, json.dumps(results[name]), flush=True)

print("PRESETS:" + json.dumps(results))
