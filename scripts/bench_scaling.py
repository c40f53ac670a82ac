"""Bucket-size sweep: edges/s of the flagship train step vs batch scale.

Finds the single-chip speed-of-light operating point (bigger buckets amortize
fixed costs and fill the MXU).  Slope-method timing.
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


def slope(make_f, n1, n2, reps=3):
    f1, f2 = make_f(n1), make_f(n2)
    float(f1()); float(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(f):
    t0 = time.perf_counter(); float(f()); return time.perf_counter() - t0


def main():
    dim = 200
    model = PHCGNN(
        phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS,
        bond_input_dims=ZINC_BOND_DIMS, atom_encoded_dim=dim,
        mp_layers=(dim,) * 4, dropout_mpnn=(0.1,) * 4,
        downstream_layers=(200, 100), target_dim=1, dropout_dn=(0.2, 0.1),
        msg_aggr="softmax", mlp_mp=True, sc_type="last")
    tx = make_optimizer(1e-3, grad_clip=2.0)
    lr = jnp.float32(1e-3)

    for bs, nodes, edges, n2 in ((128, 4096, 8192, 110),
                                 (256, 8192, 16384, 60),
                                 (512, 16384, 32768, 40),
                                 (1024, 32768, 65536, 25)):
        batch = synthetic_batch(batch_size=bs, num_nodes=nodes,
                                num_edges=edges, seed=0)
        state0 = create_train_state(model, tx, batch, jax.random.key(0))
        step = make_train_step(model, tx, lambda o, b: masked_l1(o, b.y),
                               weight_decay=0.1, donate=False)

        def make_f(n, batch=batch, state0=state0, step=step):
            @jax.jit
            def f():
                def body(s, _):
                    s, loss, _ = step(s, batch, lr)
                    return s, loss
                _, losses = jax.lax.scan(body, state0, None, length=n)
                return jnp.sum(losses)
            return f

        t = slope(make_f, max(n2 // 10, 3), n2)
        real_edges = int(batch.count_edges())
        print(json.dumps({
            "batch_size": bs, "nodes": nodes, "edges": edges,
            "ms": round(t * 1e3, 3),
            "real_edges": real_edges,
            "edges_per_s": round(real_edges / t, 1),
            "edges_per_s_padded": round(edges / t, 1)}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    main()
