"""Component-level timing of the streamed softmax aggregation (fused3 path).

Times each stage of `softmax_aggregate_streamed` separately (slope method):
the suffix-max kernel, the fused numerator/denominator/weights kernel, the
end-gathers, and the composed fwd / fwd+bwd — against the plain segment-sum
scan as the single-stream bandwidth reference.  This locates the remaining
gap to the all-streams floor (KERNELS.md round-3/4 softmax sections)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from phc_gnn_tpu.ops.stream_scan import (
    build_scan_plan, softmax_aggregate_streamed, _segmented_suffix_max,
    _segmented_scan_softmax_fused, _segmented_scan, _pad_rows)

print("backend:", jax.default_backend(), flush=True)
E, N, D = 8192, 4096, 200
BLOCK = 256
rng = np.random.default_rng(0)
recv = np.sort(rng.integers(0, N, E)).astype(np.int32)
msgs = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
mask = jnp.asarray(rng.random(E) > 0.2)
mask_f = mask.astype(jnp.float32)
recv_j = jnp.asarray(recv)
flags, cont, last = build_scan_plan(recv, N, BLOCK)
fl, co, la = map(jnp.asarray, (flags, cont, last))
eb = fl.shape[0]
beta = jnp.float32(1.1)
mask_col = _pad_rows(mask_f[:, None], eb)
# round 4+: the packed gate array carries the suffix lanes internally
# (_pack_scan_gates) — the suffix kernel takes it directly
eflags = fl


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
    return (min(t(f2) for _ in range(reps)) - min(t(f1) for _ in range(reps))) / (n2 - n1)


suff0 = _segmented_suffix_max(_pad_rows(msgs, eb), mask_col, beta, eflags, co,
                              block_edges=BLOCK)

t_suff = slope(lambda k: jnp.sum(_segmented_suffix_max(
    _pad_rows(msgs, eb) + jnp.float32(k), mask_col, beta, eflags, co,
    block_edges=BLOCK)))
t_fused = slope(lambda k: jnp.sum(sum(_segmented_scan_softmax_fused(
    _pad_rows(msgs, eb) + jnp.float32(k), suff0, mask_col, beta, fl, co,
    block_edges=BLOCK))))
t_gather = slope(lambda k: jnp.sum(jnp.where(
    (la >= 0)[:, None],
    jnp.take(suff0, jnp.clip(la + k, 0, eb - 1), axis=0), 0.0)))
t_plain = slope(lambda k: jnp.sum(_segmented_scan(
    _pad_rows(msgs, eb) + jnp.float32(k), fl, co, block_edges=BLOCK)))
t_full = slope(lambda k: jnp.sum(softmax_aggregate_streamed(
    msgs, recv_j, fl, co, la + k, N, 1.1, edge_mask=mask)))


def bwd_fn(k):
    def f(m):
        return jnp.sum(softmax_aggregate_streamed(
            m, recv_j, fl, co, la + k, N, 1.1, edge_mask=mask))
    return jax.grad(f)(msgs).sum()


t_fwdbwd = slope(bwd_fn)

print(f"suffix-max kernel    : {t_suff*1e6:7.1f} us")
print(f"fused n/d/w kernel   : {t_fused*1e6:7.1f} us")
print(f"end-gather           : {t_gather*1e6:7.1f} us")
print(f"[ref] plain sum scan : {t_plain*1e6:7.1f} us")
print(f"full softmax fwd     : {t_full*1e6:7.1f} us")
print(f"full softmax fwd+bwd : {t_fwdbwd*1e6:7.1f} us")
print(f"sum of parts (fwd)   : {(t_suff+t_fused+2*t_gather)*1e6:7.1f} us")
