"""TPU benchmark: fused Pallas softmax aggregation vs XLA composite.

Slope-method timing of fwd and fwd+bwd at flagship shapes.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from phc_gnn_tpu.graph.aggregators import softmax_aggregate
from phc_gnn_tpu.ops import build_segment_plan
from phc_gnn_tpu.ops.fused_softmax import fused_softmax_aggregate


def slope(make_f, n1=10, n2=110, reps=3):
    f1, f2 = make_f(n1), make_f(n2)
    float(f1()); float(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(f):
    t0 = time.perf_counter(); float(f()); return time.perf_counter() - t0


def main(E=8192, N=4096, D=800):
    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, N - 1, size=E)).astype(np.int32)
    msgs0 = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32)) * 0.1
    recv_j = jnp.asarray(recv)
    mask = jnp.asarray(rng.random(E) > 0.2)
    plan = build_segment_plan(recv, N)
    beta = jnp.float32(1.0)

    # correctness on-chip
    a = softmax_aggregate(msgs0, recv_j, N, beta, mask)
    b = fused_softmax_aggregate(msgs0, beta, plan, N, recv_j, mask)
    err = float(jnp.max(jnp.abs(a - b)))
    print(json.dumps({"check": "fwd", "max_abs_err": err}), flush=True)

    def mk(fn):
        def make_f(n):
            @jax.jit
            def f():
                def body(i, m):
                    out = fn(m)
                    return m + 1e-6 * jnp.take(out, recv_j, axis=0)
                return jnp.sum(jax.lax.fori_loop(0, n, body, msgs0))
            return f
        return make_f

    t_x = slope(mk(lambda m: softmax_aggregate(m, recv_j, N, beta, mask)))
    t_p = slope(mk(lambda m: fused_softmax_aggregate(m, beta, plan, N, recv_j,
                                                     mask)))
    print(json.dumps({"bench": "softmax_aggregate_fwd",
                      "xla_us": round(t_x * 1e6, 1),
                      "pallas_us": round(t_p * 1e6, 1),
                      "speedup": round(t_x / t_p, 2)}), flush=True)

    def mk_grad(fn):
        def make_f(n):
            @jax.jit
            def f():
                def body(i, m):
                    g = jax.grad(lambda mm: jnp.sum(fn(mm) ** 2))(m)
                    return m + 1e-6 * g
                return jnp.sum(jax.lax.fori_loop(0, n, body, msgs0))
            return f
        return make_f

    t_xg = slope(mk_grad(lambda m: softmax_aggregate(m, recv_j, N, beta, mask)))
    t_pg = slope(mk_grad(lambda m: fused_softmax_aggregate(m, beta, plan, N,
                                                           recv_j, mask)))
    print(json.dumps({"bench": "softmax_aggregate_fwdbwd",
                      "xla_us": round(t_xg * 1e6, 1),
                      "pallas_us": round(t_pg * 1e6, 1),
                      "speedup": round(t_xg / t_pg, 2)}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    main()
