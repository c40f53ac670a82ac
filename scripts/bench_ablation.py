"""Ablation timing of the flagship train step: where do the 4.5 ms go?

Variants isolate the aggregation style, BN, dropout, and conv count.
Slope-method timing (see bench.py docstring).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.train import create_train_state, make_optimizer, make_train_step
from phc_gnn_tpu.train.loss import masked_l1


def slope(make_f, n1=5, n2=55, reps=3):
    f1, f2 = make_f(n1), make_f(n2)
    float(f1()); float(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(f):
    t0 = time.perf_counter(); float(f()); return time.perf_counter() - t0


def time_step(name, batch_scale=1, **model_kw):
    dim = 200
    kw = dict(
        phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS,
        bond_input_dims=ZINC_BOND_DIMS, atom_encoded_dim=dim,
        mp_layers=(dim,) * 4, dropout_mpnn=(0.1,) * 4,
        downstream_layers=(200, 100), target_dim=1, dropout_dn=(0.2, 0.1),
        msg_aggr="softmax", mlp_mp=True, sc_type="last")
    kw.update(model_kw)
    if "mp_layers" in model_kw:
        kw["dropout_mpnn"] = (0.1,) * len(model_kw["mp_layers"])
    model = PHCGNN(**kw)
    batch = synthetic_batch(batch_size=128 * batch_scale,
                            num_nodes=4096 * batch_scale,
                            num_edges=8192 * batch_scale, seed=0)
    tx = make_optimizer(1e-3, grad_clip=2.0)
    state0 = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, tx, lambda o, b: masked_l1(o, b.y),
                           weight_decay=0.1, donate=False)
    lr = jnp.float32(1e-3)

    def make_f(n):
        @jax.jit
        def f():
            def body(s, _):
                s, loss, _ = step(s, batch, lr)
                return s, loss
            _, losses = jax.lax.scan(body, state0, None, length=n)
            return jnp.sum(losses)
        return f

    t = slope(make_f)
    print(json.dumps({"variant": name, "ms": round(t * 1e3, 3),
                      "steps_per_s": round(1 / t, 1)}), flush=True)
    return t


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    time_step("baseline_softmax")
    time_step("sum_aggr", msg_aggr="sum")
    time_step("no_norm", norm_mp=None, norm_dn=None)
    time_step("no_pool_attn", pooling="globalsum")
    time_step("4x_bucket", batch_scale=4)
    time_step("4x_bucket_sum", batch_scale=4, msg_aggr="sum")
    time_step("4x_bucket_no_norm", batch_scale=4, norm_mp=None, norm_dn=None)
