"""Same-process A/B/A of the fused masked-BN kernel vs the two-pass XLA form
at the flagship train step (toggled via the VMEM gate).  Measured 2.288 /
2.399 / 2.292 ms on TPU v5e — a reproducible -0.11 ms/step (KERNELS.md)."""
import sys

sys.path.insert(0, ".")
sys.argv = ["bench_fused_bn"]
src = open("scripts/bench_ablation.py").read().replace(
    'which = sys.argv[1] if len(sys.argv) > 1 else "all"', 'which = "none"')
exec(src)  # noqa: S102 - reuses the ablation's slope-timed time_step

import phc_gnn_tpu.ops.fused_bn as fb

time_step("bn_fused")
fb.FUSED_BN_DISABLE = True  # force the two-pass XLA path
time_step("bn_unfused")
fb.FUSED_BN_DISABLE = False
time_step("bn_fused_again")

# --- op-level: grid-blocked kernel vs two-pass XLA at pcba-like width
import numpy as np
import jax, jax.numpy as jnp
from phc_gnn_tpu.ops.fused_bn import fused_masked_bn_blocked

rng = np.random.default_rng(0)
N, D = 16384, 512
x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
mask = jnp.asarray(rng.random(N) > 0.2)
scale = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
bias = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
w = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)

def two_pass(x, s, b):
    m = mask[:, None].astype(jnp.float32)
    cnt = jnp.maximum(m.sum(), 1.0)
    mu = (x * m).sum(0) / cnt
    xc = (x - mu) * m
    var = (xc * xc).sum(0) / cnt
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * s + b

fwd_b = slope(lambda k: jnp.sum(
    fused_masked_bn_blocked(x + jnp.float32(k), mask, scale, bias)[0]))
fwd_x = slope(lambda k: jnp.sum(two_pass(x + jnp.float32(k), scale, bias)))
g_b = slope(lambda k: jax.grad(lambda a: jnp.sum(
    fused_masked_bn_blocked(a, mask, scale, bias)[0] * w))(x + jnp.float32(k)).sum())
g_x = slope(lambda k: jax.grad(lambda a: jnp.sum(
    two_pass(a, scale, bias) * w))(x + jnp.float32(k)).sum())
print(f"blocked-BN op-level [{N}x{D}]: fwd {fwd_b*1e6:.1f} vs XLA {fwd_x*1e6:.1f} us; "
      f"fwd+bwd {g_b*1e6:.1f} vs {g_x*1e6:.1f} us", flush=True)
