"""Isolate fwd vs fwd+bwd cost of streamed vs XLA softmax aggregation at
flagship shapes (E=8192, N=4096, D=200) on the real TPU."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.data import synthetic_batch
from phc_gnn_tpu.graph.aggregators import softmax_aggregate
from phc_gnn_tpu.graph.segment import segment_sum
from phc_gnn_tpu.ops.stream_scan import (
    attach_scan_plan, segment_sum_streamed, softmax_aggregate_streamed)

D = 200
batch = synthetic_batch(batch_size=128, num_nodes=4096, num_edges=8192, seed=0)
batch = attach_scan_plan(batch)
N, E = batch.num_nodes, batch.num_edges
rng = np.random.default_rng(0)
msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
recv = batch.receivers
mask = batch.edge_mask
flags, cont, last = batch.scan_flags, batch.scan_cont, batch.last_edge
beta = jnp.float32(1.0)


def timed(fn, iters=(20, 220)):
    @functools.partial(jax.jit, static_argnums=0)
    def run(k):
        def body(i, carry):
            out = fn(msgs + carry * 1e-30)
            return out[0, 0]
        return jax.lax.fori_loop(0, k, body, 0.0)
    out = []
    for k in iters:
        run(k).block_until_ready()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run(k).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        out.append(best)
    k0, k1 = iters
    return (out[1] - out[0]) / (k1 - k0)


def report(name, f_xla, f_str):
    t_x, t_s = timed(f_xla), timed(f_str)
    print(f"{name:22s} xla {t_x*1e3:7.3f} ms   streamed {t_s*1e3:7.3f} ms   "
          f"speedup {t_x/t_s:.2f}x", flush=True)


# forward only
report("softmax fwd",
       lambda m: softmax_aggregate(m, recv, N, beta, mask),
       lambda m: softmax_aggregate_streamed(m, recv, flags, cont, last, N,
                                            beta, edge_mask=mask))
report("sum fwd",
       lambda m: segment_sum(m, recv, N, mask),
       lambda m: segment_sum_streamed(m, recv, flags, cont, last, N,
                                      edge_mask=mask))

# fwd + bwd (value_and_grad wrt msgs, summed output)
def vg(f):
    g = jax.grad(lambda m: jnp.sum(f(m) ** 2))
    return lambda m: g(m)

report("softmax fwd+bwd",
       vg(lambda m: softmax_aggregate(m, recv, N, beta, mask)),
       vg(lambda m: softmax_aggregate_streamed(m, recv, flags, cont, last, N,
                                               beta, edge_mask=mask)))
report("sum fwd+bwd",
       vg(lambda m: segment_sum(m, recv, N, mask)),
       vg(lambda m: segment_sum_streamed(m, recv, flags, cont, last, N,
                                         edge_mask=mask)))
