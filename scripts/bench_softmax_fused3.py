"""A/B the round-3 fused softmax (suffix-max + single forward kernel) against
the round-2 two-kernel structure, on-chip, op level (VERDICT r2 #3).

Prints slope-method times for forward and forward+backward at the flagship
shape plus the all-streams bandwidth floor for context.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

import phc_gnn_tpu.ops.stream_scan as ss

print("backend:", jax.default_backend(), flush=True)
E, N, D = 8192, 4096, 200
BLOCK = 256
rng = np.random.default_rng(0)
recv = np.sort(rng.integers(0, N, E)).astype(np.int32)
msgs = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
mask = jnp.asarray(rng.random(E) > 0.2)
recv_j = jnp.asarray(recv)
flags, cont, last = ss.build_scan_plan(recv, N, BLOCK)
fl, co, la = map(jnp.asarray, (flags, cont, last))
beta = jnp.float32(1.1)


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
        t0 = time.perf_counter(); jax.block_until_ready(fn())
        return time.perf_counter() - t0
    return (min(t(f2) for _ in range(reps))
            - min(t(f1) for _ in range(reps))) / (n2 - n1)


def fwd(k):
    return jnp.sum(ss.softmax_aggregate_streamed(
        msgs + jnp.float32(k), recv_j, fl, co, la, N, beta, edge_mask=mask))


def fwdbwd(k):
    def loss(m, b):
        return jnp.sum(ss.softmax_aggregate_streamed(
            m, recv_j, fl, co, la, N, b, edge_mask=mask))
    l, (dm, db) = jax.value_and_grad(loss, argnums=(0, 1))(
        msgs + jnp.float32(k), beta)
    return l + jnp.sum(dm) + db


# numerical agreement first (same inputs, both impls)
outs = {}
for impl in ("r2", "fused3"):
    ss.SOFTMAX_IMPL = impl
    outs[impl] = np.asarray(ss.softmax_aggregate_streamed(
        msgs, recv_j, fl, co, la, N, beta, edge_mask=mask))
err = np.abs(outs["r2"] - outs["fused3"]).max()
print(f"max |r2 - fused3| = {err:.3e}")
assert err < 1e-4, err

for impl in ("r2", "fused3"):
    ss.SOFTMAX_IMPL = impl
    t_f = slope(fwd)
    t_fb = slope(fwdbwd)
    print(f"{impl:7s} fwd {t_f * 1e6:7.1f} us   fwd+bwd {t_fb * 1e6:7.1f} us",
          flush=True)

# all-streams bandwidth floor for the fused3 fwd: read msgs (E*D), write+read
# suffix (2 E*D), write n/d/w (3 E*D), end gathers (~2 N*D) at ~810 GB/s v5e
bw = 810e9
bytes_f3 = (1 + 2 + 3) * E * D * 4 + 2 * N * D * 4
print(f"fused3 fwd stream floor ~{bytes_f3 / bw * 1e6:.1f} us "
      f"({bytes_f3 / 1e6:.1f} MB)")
