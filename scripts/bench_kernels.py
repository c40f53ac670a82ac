"""Microbenchmarks on the attached TPU: XLA vs Pallas segment reduction, and
f32 vs bf16 full train steps.  Prints one JSON line per benchmark."""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_segment(E=8192, N=4096, D=896, seed=0):
    from phc_gnn_tpu.ops import build_segment_plan, segment_sum_sorted

    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, N - 1, size=E)).astype(np.int32)
    msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    recv_j = jnp.asarray(recv)
    plan = build_segment_plan(recv, N)

    xla = jax.jit(lambda m: jax.ops.segment_sum(m, recv_j, num_segments=N))
    pls = jax.jit(lambda m: segment_sum_sorted(m, plan, N))

    np.testing.assert_allclose(np.asarray(xla(msgs)), np.asarray(pls(msgs)),
                               rtol=2e-2, atol=2e-2)
    t_xla = timeit(xla, msgs)
    t_pls = timeit(pls, msgs)
    bw = E * D * 4  # bytes streamed (read msgs)
    print(json.dumps({
        "bench": "segment_sum", "E": E, "N": N, "D": D,
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
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, tx, lambda o, b: masked_l1(o, b.y),
                           weight_decay=0.1, donate=False)
    lr = jnp.float32(1e-3)
    t = timeit(lambda s, b: step(s, b, lr)[1], state, batch, iters=30)
    edges = int(batch.count_edges())
    print(json.dumps({
        "bench": f"train_step_{dtype_name}", "ms": round(t * 1e3, 2),
        "steps_per_s": round(1 / t, 1),
        "edges_per_s": round(edges / t, 1)}))


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    bench_segment()
    bench_train_step("f32")
    bench_train_step("bf16")
