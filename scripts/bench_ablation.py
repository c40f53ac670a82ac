"""Ablation timing of the flagship train step: where do the ~4.2 ms go?

Variants isolate the aggregation kernel (streamed scan vs XLA), aggregation
style, BN, dropout, pooling, and conv count (layer-count slope isolates the
per-conv cost from the fixed encoder/pool/downstream/optimizer cost).
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
from phc_gnn_tpu.ops.stream_scan import attach_scan_plan
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


def time_step(name, batch_scale=1, scan=True, **model_kw):
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
    if scan:
        batch = attach_scan_plan(batch)
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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "main"):
        base = time_step("baseline_softmax_scan")
        time_step("baseline_softmax_xla", scan=False)
        time_step("sum_aggr_scan", msg_aggr="sum")
        time_step("no_norm", norm_mp=None, norm_dn=None)
        time_step("no_dropout", dropout_mpnn=(0.0,) * 4, dropout_dn=(0.0, 0.0))
        time_step("no_pool_attn", pooling="globalsum")
        time_step("no_mlp_mp", mlp_mp=False)
        t2 = time_step("layers_2", mp_layers=(200,) * 2)
        t8 = time_step("layers_8", mp_layers=(200,) * 8)
        per_layer = (t8 - t2) / 6
        print(json.dumps({"derived": "per_conv_ms",
                          "ms": round(per_layer * 1e3, 3),
                          "fixed_ms": round((base - 4 * per_layer) * 1e3, 3)}),
              flush=True)
    if which in ("all", "buckets"):
        time_step("4x_bucket_scan", batch_scale=4)
        time_step("4x_bucket_xla", batch_scale=4, scan=False)
        time_step("4x_bucket_sum", batch_scale=4, msg_aggr="sum")
        time_step("4x_bucket_no_norm", batch_scale=4, norm_mp=None,
                  norm_dn=None)
