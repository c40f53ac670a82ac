"""Fused masked batch-norm (training mode) as a single-block Pallas kernel.

The XLA lowering of the two-pass masked BN (nn/norm.py::_BatchNorm) reads the
[N, D] activations ~3x in the forward (mean pass, var pass, normalize) and
~3x more in the derived backward.  At flagship shapes the whole array is a
few MB — it fits VMEM — so the fused kernel computes masked mean, masked
biased variance, AND the normalized output in ONE HBM read + one write; the
analytic VJP reads x and the cotangent once each.  Replaces cuDNN BN
(reference phc/hypercomplex/norm.py:5-74 delegates to torch BatchNorm1d).

Semantics match _BatchNorm exactly: statistics over mask-True rows only
(biased variance), normalization applied to ALL rows (padding rows produce
garbage that downstream masking ignores), f32 throughout.

dx = scale * r * (g - m/c * sum(g) - m * xhat * sum(g * xhat) / c)
dscale = sum(g * xhat),  dbias = sum(g)

ALL reduction sums (sum_g, sum_gx, dscale, dbias) run over ALL rows — every
row's y depends on mean/var, so autodiff of the unfused form routes every
cotangent row through the stats.  The per-row mask factor ``m`` only gates
each row's OWN stats-path contribution inside dx (masked rows were excluded
from mean/var, so their xhat never fed the statistics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_masked_bn", "FUSED_BN_VMEM_LIMIT"]

# single-block kernel gate, in bytes of x.  The BACKWARD block must hold
# x, g, dx and an xhat-sized temporary simultaneously (~4x the gate) within
# ~16 MB of VMEM, so the gate is set just above the largest on-chip-validated
# shape (4096 x 200 f32 = 3.2 MB); bigger inputs fall back to the two-pass
# XLA path rather than risking a Mosaic VMEM allocation failure.  A
# grid-blocked variant would lift this.
FUSED_BN_VMEM_LIMIT = 3_500_000


def _bn_fwd_kernel(x_ref, mask_ref, scale_ref, bias_ref, eps_ref,
                   y_ref, mean_ref, var_ref):
    x = x_ref[...]
    m = mask_ref[...]  # [N, 1] f32
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=0, keepdims=True) / cnt
    xc = (x - mean) * m
    var = jnp.sum(xc * xc, axis=0, keepdims=True) / cnt
    r = jax.lax.rsqrt(var + eps_ref[0, 0])
    y_ref[...] = (x - mean) * r * scale_ref[...] + bias_ref[...]
    mean_ref[...] = mean
    var_ref[...] = var


def _bn_bwd_kernel(x_ref, mask_ref, scale_ref, mean_ref, var_ref, eps_ref,
                   g_ref, dx_ref, dscale_ref, dbias_ref):
    x = x_ref[...]
    g = g_ref[...]
    m = mask_ref[...]
    mean = mean_ref[...]
    r = jax.lax.rsqrt(var_ref[...] + eps_ref[0, 0])
    xhat = (x - mean) * r
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    # every output row depends on mu/sigma^2, so the stats-path sums run over
    # ALL cotangent rows; only the j-row's mask gates its contribution
    sum_g = jnp.sum(g, axis=0, keepdims=True)
    sum_gx = jnp.sum(g * xhat, axis=0, keepdims=True)
    dx_ref[...] = scale_ref[...] * r * (
        g - m * (sum_g + xhat * sum_gx) / cnt)
    dscale_ref[...] = sum_gx
    dbias_ref[...] = sum_g


def _call_fwd(x, mask_f, scale, bias, eps, interpret):
    n, d = x.shape
    return pl.pallas_call(
        _bn_fwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((n, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        interpret=interpret,
    )(x, mask_f, scale, bias, eps)


def _call_bwd(x, mask_f, scale, mean, var, eps, g, interpret):
    n, d = x.shape
    return pl.pallas_call(
        _bn_bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((n, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        interpret=interpret,
    )(x, mask_f, scale, mean, var, eps, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_bn(interpret, x, mask_f, scale, bias, eps):
    """Returns (y, mean, var).  mean/var are DETACHED by contract: they feed
    the running-stat state update only, never a gradient path — the bwd
    ignores their cotangents."""
    return _call_fwd(x, mask_f, scale, bias, eps, interpret)


def _fused_bn_fwd(interpret, x, mask_f, scale, bias, eps):
    y, mean, var = _call_fwd(x, mask_f, scale, bias, eps, interpret)
    return (y, mean, var), (x, mask_f, scale, mean, var, eps)


def _fused_bn_bwd(interpret, res, cts):
    x, mask_f, scale, mean, var, eps = res
    g, _, _ = cts  # mean/var outputs are detached (see _fused_bn)
    dx, dscale, dbias = _call_bwd(x, mask_f, scale, mean, var, eps, g,
                                  interpret)
    return (dx, None, dscale, dbias, None)


_fused_bn.defvjp(_fused_bn_fwd, _fused_bn_bwd)


def fused_masked_bn(x, mask, scale, bias, eps: float = 1e-5,
                    interpret: bool = False):
    """Training-mode masked BN over axis 0 of ``x`` [N, D]: returns
    (y, mean [D], var [D]) with mean/var detached (running-stat updates are
    state, not gradient paths).  Differentiable in x, scale, bias."""
    interpret = interpret or jax.default_backend() != "tpu"
    n, d = x.shape
    mask_f = (jnp.ones((n, 1), jnp.float32) if mask is None
              else mask.reshape(n, 1).astype(jnp.float32))
    scale2 = scale.reshape(1, d).astype(jnp.float32)
    bias2 = bias.reshape(1, d).astype(jnp.float32)
    eps_arr = jnp.full((1, 1), eps, jnp.float32)
    y, mean, var = _fused_bn(interpret, x.astype(jnp.float32), mask_f,
                             scale2, bias2, eps_arr)
    return y, mean.reshape(d), var.reshape(d)
