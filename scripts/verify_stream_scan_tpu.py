"""Drive the stream_scan kernel on the real TPU: correctness vs XLA composites
at flagship shapes, then a slope-method timing comparison.

Run: timeout 900 python scripts/verify_stream_scan_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from phc_gnn_tpu.graph.aggregators import softmax_aggregate
from phc_gnn_tpu.graph.segment import segment_sum
from phc_gnn_tpu.ops.stream_scan import (
    build_scan_plan, segment_sum_streamed, softmax_aggregate_streamed,
)

print("backend:", jax.default_backend(), flush=True)

# flagship bucket: 4096 nodes / 8192 edges, D = n*d = 800 (n=4, d=200)
E, N, D = 8192, 4096, 800
BLOCK = 512
rng = np.random.default_rng(0)
recv = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
msgs = rng.normal(size=(E, D)).astype(np.float32)
mask = rng.random(E) > 0.2
flags, cont, last = build_scan_plan(recv, N, block_edges=BLOCK)

msgs_j = jnp.asarray(msgs)
recv_j = jnp.asarray(recv)
flags_j = jnp.asarray(flags)
cont_j = jnp.asarray(cont)
last_j = jnp.asarray(last)
mask_j = jnp.asarray(mask)
beta = jnp.float32(1.1)

# ---- correctness
t0 = time.time()
want = np.asarray(segment_sum(msgs_j, recv_j, N, mask_j))
got = np.asarray(segment_sum_streamed(msgs_j, recv_j, flags_j, cont_j, last_j,
                                      N, edge_mask=mask_j, block_edges=BLOCK))
err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
print(f"segment_sum rel-err {err:.2e}  (compile+run {time.time()-t0:.0f}s)",
      flush=True)
assert err < 1e-4, "segment_sum mismatch"

t0 = time.time()
want_s = np.asarray(softmax_aggregate(msgs_j, recv_j, N, beta, mask_j))
got_s = np.asarray(softmax_aggregate_streamed(
    msgs_j, recv_j, flags_j, cont_j, last_j, N, beta, edge_mask=mask_j,
    block_edges=BLOCK))
err_s = np.max(np.abs(got_s - want_s) / (np.abs(want_s) + 1e-3))
print(f"softmax rel-err {err_s:.2e}  (compile+run {time.time()-t0:.0f}s)",
      flush=True)
assert err_s < 1e-3, "softmax mismatch"

# ---- grad correctness on TPU
def loss_stream(m, b):
    return jnp.sum(jnp.sin(softmax_aggregate_streamed(
        m, recv_j, flags_j, cont_j, last_j, N, b, edge_mask=mask_j,
        block_edges=BLOCK)))

def loss_ref(m, b):
    return jnp.sum(jnp.sin(softmax_aggregate(m, recv_j, N, b, mask_j)))

gm, gb = jax.jit(jax.grad(loss_stream, argnums=(0, 1)))(msgs_j, beta)
gm_r, gb_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(msgs_j, beta)
gerr = np.max(np.abs(np.asarray(gm) - np.asarray(gm_r)) /
              (np.abs(np.asarray(gm_r)) + 1e-4))
print(f"softmax grad rel-err {gerr:.2e}  dbeta {float(gb):.5f} vs "
      f"{float(gb_r):.5f}", flush=True)
assert gerr < 5e-3  # f32 exp/ordering noise on tiny-magnitude grads

# ---- slope-method timing: k inner iterations inside one jit
def timed(fn, iters=(20, 220)):
    # slope method with a loop-carried data dependency: fn(eps) must USE the
    # carry (we feed msgs + eps*carry), otherwise XLA hoists the loop-invariant
    # op out of fori_loop and the measured time is independent of k.
    # Iteration counts large enough that the k1-k0 difference dwarfs the
    # tunnel's ms-scale dispatch jitter.
    import functools
    @functools.partial(jax.jit, static_argnums=0)
    def run(k):
        def body(i, carry):
            out = fn(carry * 1e-30)
            return out[0, 0]
        return jax.lax.fori_loop(0, k, body, 0.0)
    out = []
    for k in iters:
        run(k).block_until_ready()  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run(k).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        out.append(best)
    k0, k1 = iters
    return (out[1] - out[0]) / (k1 - k0)


t_xla_sum = timed(lambda eps: segment_sum(msgs_j + eps, recv_j, N, mask_j))
t_str_sum = timed(lambda eps: segment_sum_streamed(
    msgs_j + eps, recv_j, flags_j, cont_j, last_j, N, edge_mask=mask_j,
    block_edges=BLOCK))
print(f"segment_sum: xla {t_xla_sum*1e3:.3f} ms  streamed {t_str_sum*1e3:.3f} "
      f"ms  speedup {t_xla_sum/t_str_sum:.2f}x", flush=True)

t_xla_sm = timed(lambda eps: softmax_aggregate(msgs_j + eps, recv_j, N, beta,
                                               mask_j))
t_str_sm = timed(lambda eps: softmax_aggregate_streamed(
    msgs_j + eps, recv_j, flags_j, cont_j, last_j, N, beta, edge_mask=mask_j,
    block_edges=BLOCK))
print(f"softmax:     xla {t_xla_sm*1e3:.3f} ms  streamed {t_str_sm*1e3:.3f} "
      f"ms  speedup {t_xla_sm/t_str_sm:.2f}x", flush=True)
print("VERIFY_OK", flush=True)
