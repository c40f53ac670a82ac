"""Component-level timing of the streamed softmax aggregation (VERDICT r2 #3).

Times each stage of `softmax_aggregate_streamed` separately (slope method) to
locate the gap between the measured fwd (~143 us at block 256) and the
~75 us all-streams bandwidth floor, before any redesign."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from phc_gnn_tpu.ops.stream_scan import (
    build_scan_plan, softmax_aggregate_streamed, _segmented_scan_softmax_max,
    _segmented_scan_softmax, _segmented_scan, _pad_rows, _NEG)

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


# precomputed device inputs for isolated stages
scan_max0 = _segmented_scan_softmax_max(_pad_rows(msgs, eb), mask_col, beta,
                                        fl, co, block_edges=BLOCK)
seg_max0 = jnp.where((la >= 0)[:, None],
                     jnp.take(scan_max0, jnp.clip(la, 0, eb - 1), axis=0), 0.0)
smax_e0 = jnp.take(seg_max0, recv_j, axis=0)

t_max = slope(lambda k: jnp.sum(_segmented_scan_softmax_max(
    _pad_rows(msgs, eb) + jnp.float32(k), mask_col, beta, fl, co,
    block_edges=BLOCK)))
t_gather_seg = slope(lambda k: jnp.sum(jnp.where(
    (la >= 0)[:, None],
    jnp.take(scan_max0, jnp.clip(la + k, 0, eb - 1), axis=0), 0.0)))
t_bcast = slope(lambda k: jnp.sum(jnp.take(seg_max0, recv_j + k, axis=0)))
t_pair = slope(lambda k: jnp.sum(sum(_segmented_scan_softmax(
    _pad_rows(msgs, eb) + jnp.float32(k), _pad_rows(smax_e0, eb),
    mask_col, beta, fl, co, block_edges=BLOCK))))
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

print(f"max scan kernel      : {t_max*1e6:7.1f} us")
print(f"seg_max end-gather   : {t_gather_seg*1e6:7.1f} us")
print(f"smax_e broadcast take: {t_bcast*1e6:7.1f} us")
print(f"pair scan kernel     : {t_pair*1e6:7.1f} us")
print(f"[ref] plain sum scan : {t_plain*1e6:7.1f} us")
print(f"full softmax fwd     : {t_full*1e6:7.1f} us")
print(f"full softmax fwd+bwd : {t_fwdbwd*1e6:7.1f} us")
print(f"sum of parts (fwd)   : {(t_max+t_gather_seg+t_bcast+t_pair)*1e6:7.1f} us")
