"""Microbenchmarks on the attached TPU, measured honestly.

The axon tunnel has ~27 ms dispatch+fetch round-trip and block_until_ready does
not synchronize, so every benchmark here loops the op inside ONE jit
(lax.fori_loop / lax.scan), returns a consumed scalar, and derives per-op time
from the (n2 - n1) slope of two loop lengths — the fixed overhead cancels.

Prints one JSON line per benchmark.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def slope_time(make_looped, n1=10, n2=110, reps=3):
    """make_looped(n) -> jitted zero-arg fn returning a scalar; returns s/op."""
    f1, f2 = make_looped(n1), make_looped(n2)
    float(f1())  # compile
    float(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def bench_segment(E=8192, N=4096, D=896, seed=0):
    from phc_gnn_tpu.ops import build_segment_plan, segment_sum_sorted

    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, N - 1, size=E)).astype(np.int32)
    msgs0 = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32)) * 0.01
    recv_j = jnp.asarray(recv)
    plan = build_segment_plan(recv, N)

    # correctness (single call, fetched)
    a = jax.ops.segment_sum(msgs0, recv_j, num_segments=N)
    b = segment_sum_sorted(msgs0, plan, N)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                               atol=1e-4)

    def make_xla(n):
        @jax.jit
        def f():
            def body(i, m):
                out = jax.ops.segment_sum(m, recv_j, num_segments=N)
                # feed result back through a gather to chain iterations
                return m + 1e-6 * jnp.take(out, recv_j, axis=0)
            return jnp.sum(jax.lax.fori_loop(0, n, body, msgs0))
        return f

    def make_pallas(n):
        @jax.jit
        def f():
            def body(i, m):
                out = segment_sum_sorted(m, plan, N)
                return m + 1e-6 * jnp.take(out, recv_j, axis=0)
            return jnp.sum(jax.lax.fori_loop(0, n, body, msgs0))
        return f

    t_xla = slope_time(make_xla)
    t_pls = slope_time(make_pallas)
    bw = E * D * 4 * 3  # gather read + msgs read + out write per iter (approx)
    print(json.dumps({
        "bench": "segment_sum+gather", "E": E, "N": N, "D": D,
        "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_pls * 1e6, 1),
        "xla_GBps": round(bw / t_xla / 1e9, 1),
        "pallas_GBps": round(bw / t_pls / 1e9, 1),
        "speedup": round(t_xla / t_pls, 2)}))


def bench_train_step(dtype_name: str):
    from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
    from phc_gnn_tpu.models import PHCGNN
    from phc_gnn_tpu.train import create_train_state, make_optimizer, make_train_step
    from phc_gnn_tpu.train.loss import masked_l1

    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    dim = 200
    model = PHCGNN(
        phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS,
        bond_input_dims=ZINC_BOND_DIMS, atom_encoded_dim=dim,
        mp_layers=(dim,) * 4, dropout_mpnn=(0.1,) * 4,
        downstream_layers=(200, 100), target_dim=1, dropout_dn=(0.2, 0.1),
        msg_aggr="softmax", mlp_mp=True, sc_type="last", compute_dtype=dtype)
    batch = synthetic_batch(batch_size=128, num_nodes=4096, num_edges=8192,
                            seed=0)
    tx = make_optimizer(1e-3, grad_clip=2.0)
    state0 = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, tx, lambda o, b: masked_l1(o, b.y),
                           weight_decay=0.1, donate=False)
    lr = jnp.float32(1e-3)

    def make_looped(n):
        @jax.jit
        def f():
            def body(s, _):
                s, loss, _ = step(s, batch, lr)
                return s, loss
            _, losses = jax.lax.scan(body, state0, None, length=n)
            return jnp.sum(losses)
        return f

    t = slope_time(make_looped, n1=5, n2=55)
    edges = int(batch.count_edges())
    print(json.dumps({
        "bench": f"train_step_{dtype_name}", "ms": round(t * 1e3, 3),
        "steps_per_s": round(1 / t, 1),
        "edges_per_s": round(edges / t, 1)}))


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "segment"):
        bench_segment()
    if which in ("all", "train"):
        bench_train_step("f32")
        bench_train_step("bf16")
