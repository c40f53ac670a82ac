"""PHM matmul formulation shoot-out on TPU (in-jit loops to amortize dispatch).

Variants:
  H-GEMM   : H = einsum('ijm,ifo->jfmo') reshape; y = x @ H  (current)
  mix-x    : y = einsum('bjf,ijm,ifo->bmo') as two steps (mix x, then GEMM)
  block    : per-component GEMMs then n x n mixing
Each timed fwd-only and fwd+bwd, f32 and bf16.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N_LOOP = 20


def loop_time(fn, *args, iters=5):
    """fn must return same-structure output as its first arg for fori carry."""
    looped = jax.jit(lambda *a: jax.lax.fori_loop(
        0, N_LOOP, lambda i, x: fn(x, *a[1:]), a[0]))
    out = looped(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = looped(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * N_LOOP)


def variants(n, fi, fo):
    def h_gemm(x, rule, w, b):
        h = jnp.einsum("ijm,ifo->jfmo", rule, w).reshape(n * fi, n * fo)
        return x @ h + b

    def mix_x(x, rule, w, b):
        x3 = x.reshape(x.shape[0], n, fi)
        xm = jnp.einsum("bjf,ijm->bimf", x3, rule)  # [B, n, n(out-comp), f]
        y = jnp.einsum("bimf,ifo->bmo", xm, w)
        return y.reshape(x.shape[0], n * fo) + b

    def block(x, rule, w, b):
        x3 = x.reshape(x.shape[0], n, fi)
        # per-component GEMMs: [n, B, fo]
        z = jnp.einsum("bif,ifo->ibo", x3, w)
        # mix: y[m] = sum_i rule[i,j,m] ... need j index on x side:
        # z2[i, j] = x3[:, j] @ w[i]; but that's n^2 GEMMs. Instead:
        zz = jnp.einsum("bjf,ifo->ijbo", x3, w)  # [n, n, B, fo]
        y = jnp.einsum("ijm,ijbo->bmo", rule, zz)
        return y.reshape(x.shape[0], n * fo) + b

    return {"h_gemm": h_gemm, "mix_x": mix_x, "block": block}


def main():
    print(json.dumps({"backend": jax.default_backend()}))
    n, fi, fo, B = 4, 200, 200, 4096
    rng = np.random.default_rng(0)
    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jnp.asarray(rng.normal(size=(B, n * fi)), dt)
        rule = jnp.asarray(rng.normal(size=(n, n, n)), dt)
        w = jnp.asarray(rng.normal(size=(n, fi, fo)), dt)
        b = jnp.asarray(rng.normal(size=(n * fo,)), dt)
        flops = 2 * B * (n * fi) * (n * fo)
        for name, fn in variants(n, fi, fo).items():
            t_f = loop_time(lambda xx, r, ww, bb: fn(xx, r, ww, bb),
                            x, rule, w, b)

            def fwdbwd(xx, r, ww, bb):
                y, vjp = jax.vjp(lambda a, c: fn(a, r, c, bb), xx, ww)
                dx, dw = vjp(y)
                return dx

            t_b = loop_time(fwdbwd, x, rule, w, b)
            print(json.dumps({
                "variant": name, "dtype": dtype_name,
                "fwd_us": round(t_f * 1e6, 1),
                "fwd_TFLOPs": round(flops / t_f / 1e12, 1),
                "fwdbwd_us": round(t_b * 1e6, 1),
                "fwdbwd_TFLOPs": round(3 * flops / t_b / 1e12, 1)}))


if __name__ == "__main__":
    main()
