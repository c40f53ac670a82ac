"""Scan-kernel block-size sweep (KERNELS.md): 256 is the optimum — segment-sum
hits the HBM bandwidth floor.  Slope-timed on the TPU."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from phc_gnn_tpu.ops.stream_scan import (build_scan_plan,
                                         segment_sum_streamed,
                                         softmax_aggregate_streamed)
print("backend:", jax.default_backend(), flush=True)
E, N, D = 8192, 4096, 200
rng = np.random.default_rng(0)
recv = np.sort(rng.integers(0, N, E)).astype(np.int32)
msgs = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
mask = jnp.asarray(rng.random(E) > 0.2)
recv_j = jnp.asarray(recv)

def slope(f, n1=20, n2=220, reps=3):
    def run(n):
        @jax.jit
        def g():
            def body(i, acc):
                k = jnp.int32(jnp.isnan(acc))
                return acc * 0.5 + f(k)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return g
    f1, f2 = run(n1), run(n2)
    jax.block_until_ready(f1()); jax.block_until_ready(f2())
    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0
    return (min(t(f2) for _ in range(reps)) - min(t(f1) for _ in range(reps))) / (n2 - n1)

for block in (128, 256, 512, 1024):
    flags, cont, last = build_scan_plan(recv, N, block)
    fl, co, la = map(jnp.asarray, (flags, cont, last))
    ts = slope(lambda k: jnp.sum(segment_sum_streamed(
        msgs, recv_j, fl, co, la + k, N, edge_mask=mask)))
    tf = slope(lambda k: jnp.sum(softmax_aggregate_streamed(
        msgs, recv_j, fl, co, la + k, N, 1.1, edge_mask=mask)))
    print(f"block={block}: seg_sum {ts*1e6:.1f} us, softmax {tf*1e6:.1f} us",
          flush=True)
