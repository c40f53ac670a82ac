"""Microbench the edge-side ops suspected of hiding the per-layer cost:

- node->edge gather fwd vs fwd+bwd (bwd = XLA scatter-add over UNSORTED
  senders) and the sender-sorted streamed-scan alternative for the bwd;
- embedding lookup fwd+bwd (bwd = scatter into the vocab table);
- full message computation relu(x[senders] + e) fwd+bwd;
- receiver-sorted scatter for comparison.

Slope method over an in-jit fori_loop.  The loop body is made
iteration-dependent by folding a runtime-zero (derived from the carry) into
the gather indices — otherwise XLA hoists the loop-invariant body and the
slope measures nothing (first version of this script did exactly that).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from phc_gnn_tpu.ops.stream_scan import build_scan_plan, segment_sum_streamed

import os
_SC = int(os.environ.get("SCALE", "1"))
E, N, D, VOCAB = 8192 * _SC, 4096 * _SC, 200, 12


def slope(make_f, n1=20, n2=220, reps=3):
    f1, f2 = make_f(n1), make_f(n2)
    jax.block_until_ready(f1()); jax.block_until_ready(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(f):
    t0 = time.perf_counter(); jax.block_until_ready(f()); return time.perf_counter() - t0


def timed(name, fn):
    """fn(k: runtime-zero int32) -> f32 scalar; body depends on the carry."""
    def make_f(n):
        @jax.jit
        def run():
            def body(i, acc):
                k = jnp.int32(jnp.isnan(acc))  # runtime 0, not foldable
                return acc * 0.5 + fn(k)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    t = slope(make_f)
    print(json.dumps({"op": name, "us": round(t * 1e6, 1)}), flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    senders_unsorted = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    sorted_recv = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
    e_attr = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, VOCAB, E).astype(np.int32))
    table = jnp.asarray(rng.standard_normal((VOCAB, D)), jnp.float32)

    perm = np.argsort(np.asarray(senders_unsorted), kind="stable")
    sorted_send = np.asarray(senders_unsorted)[perm]
    flags, cont, last = build_scan_plan(sorted_send, N)
    perm_j = jnp.asarray(perm.astype(np.int32))
    sorted_send_j = jnp.asarray(sorted_send)
    flags_j, cont_j, last_j = map(jnp.asarray, (flags, cont, last))

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    timed("gather_fwd", lambda k: jnp.sum(
        jnp.take(x, jnp.minimum(senders_unsorted + k, N - 1), axis=0) * g))

    def gather_fwd_bwd(k):
        s = jnp.minimum(senders_unsorted + k, N - 1)
        f = lambda v: jnp.sum(jnp.take(v, s, axis=0) * g)
        l, grad = jax.value_and_grad(f)(x)
        return l + jnp.sum(grad)
    timed("gather_fwd_bwd_xla_scatter", gather_fwd_bwd)

    def gather_bwd_streamed(k):
        gs = jnp.take(g, jnp.minimum(perm_j + k, E - 1), axis=0)
        dx = segment_sum_streamed(gs, sorted_send_j, flags_j, cont_j, last_j, N)
        return jnp.sum(dx)
    timed("gather_bwd_streamed_scan", gather_bwd_streamed)

    def embed_fwd_bwd(k):
        s = jnp.minimum(idx + k, VOCAB - 1)
        f = lambda v: jnp.sum(jnp.take(v, s, axis=0) * g)
        l, grad = jax.value_and_grad(f)(table)
        return l + jnp.sum(grad)
    timed("embed_fwd_bwd_scatter", embed_fwd_bwd)

    def embed_fwd_bwd_onehot(k):
        s = jnp.minimum(idx + k, VOCAB - 1)
        def f(v):
            oh = jax.nn.one_hot(s, VOCAB, dtype=jnp.float32)
            return jnp.sum((oh @ v) * g)
        l, grad = jax.value_and_grad(f)(table)
        return l + jnp.sum(grad)
    timed("embed_fwd_bwd_onehot", embed_fwd_bwd_onehot)

    def msgs_fwd_bwd(k):
        s = jnp.minimum(senders_unsorted + k, N - 1)
        f = lambda v: jnp.sum(jax.nn.relu(jnp.take(v, s, axis=0) + e_attr) * g)
        l, grad = jax.value_and_grad(f)(x)
        return l + jnp.sum(grad)
    timed("messages_fwd_bwd", msgs_fwd_bwd)

    def gather_fwd_bwd_sorted(k):
        s = jnp.minimum(sorted_recv + k, N - 1)
        f = lambda v: jnp.sum(jnp.take(v, s, axis=0) * g)
        l, grad = jax.value_and_grad(f)(x)
        return l + jnp.sum(grad)
    timed("gather_fwd_bwd_sorted_idx", gather_fwd_bwd_sorted)


if __name__ == "__main__":
    main()
