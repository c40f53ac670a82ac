"""TPU benchmark: flagship train step with plan-layout batches (fused Pallas
softmax aggregation) vs plain layout (XLA composite).  Slope method."""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, random_graph
from phc_gnn_tpu.data.loader import PaddedLoader, BucketSpec
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.train import create_train_state, make_optimizer, make_train_step
from phc_gnn_tpu.train.loss import masked_l1


def slope(make_f, n1=10, n2=110, reps=3):
    f1, f2 = make_f(n1), make_f(n2)
    float(f1()); float(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(f):
    t0 = time.perf_counter(); float(f()); return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    graphs = [random_graph(rng, target_dim=1) for _ in range(128)]
    bucket = BucketSpec(4096, 8192, 129, target_dim=1)
    plain = list(PaddedLoader(graphs, bucket))[0]
    planned_batches = list(PaddedLoader(graphs, bucket, plan_layout=True))
    planned = planned_batches[0]
    real_edges = int(plain.count_edges())
    print(json.dumps({"planned_edge_slots": planned.num_edges,
                      "plain_edge_slots": plain.num_edges,
                      "real_edges": real_edges}), flush=True)

    dim = 200
    model = PHCGNN(
        phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS,
        bond_input_dims=ZINC_BOND_DIMS, atom_encoded_dim=dim,
        mp_layers=(dim,) * 4, dropout_mpnn=(0.1,) * 4,
        downstream_layers=(200, 100), target_dim=1, dropout_dn=(0.2, 0.1),
        msg_aggr="softmax", mlp_mp=True, sc_type="last")
    tx = make_optimizer(1e-3, grad_clip=2.0)
    step = make_train_step(model, tx, lambda o, b: masked_l1(o, b.y),
                           weight_decay=0.1, donate=False)
    lr = jnp.float32(1e-3)

    for name, batch in (("plain", plain), ("planned_fused", planned)):
        state0 = create_train_state(model, tx, batch, jax.random.key(0))

        def make_f(n, batch=batch, state0=state0):
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
                          "steps_per_s": round(1 / t, 1),
                          "edges_per_s": round(real_edges / t, 1)}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    main()
