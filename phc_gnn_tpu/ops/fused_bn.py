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
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_masked_bn", "fused_masked_bn_blocked",
           "FUSED_BN_VMEM_LIMIT", "BLOCKED_BN_ROWS"]

# single-block kernel gate, in bytes of x.  The BACKWARD block must hold
# x, g, dx and an xhat-sized temporary simultaneously (~4x the gate) within
# ~16 MB of VMEM, so the gate is set just above the largest on-chip-validated
# shape (4096 x 200 f32 = 3.2 MB); bigger inputs fall back to the two-pass
# XLA path rather than risking a Mosaic VMEM allocation failure.  A
# grid-blocked variant would lift this.
FUSED_BN_VMEM_LIMIT = 3_500_000

# kill switch for A/B benches: when True the norm layer uses the two-pass XLA
# path regardless of size (scripts/bench_fused_bn.py)
FUSED_BN_DISABLE = False


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


# --------------------------------------------------- grid-blocked variant
# For inputs past FUSED_BN_VMEM_LIMIT (e.g. the pcba config's 4096 x 512 f32
# = 8 MB) the single-block kernel cannot hold x (+g, dx in the backward) in
# VMEM.  The blocked form streams row blocks through a sequential grid:
#
#   fwd:  one Pallas sweep accumulating (cnt, mean, M2) per lane via Chan's
#         parallel-variance combine (numerically stable — no E[x^2]-E[x]^2
#         cancellation), then one XLA elementwise normalize.
#         HBM traffic 2R + 1W vs the two-pass XLA form's 3R + 1W.
#   bwd:  one Pallas sweep accumulating sum(g) and sum(g*xhat) over ALL rows
#         (autodiff semantics — see the module docstring), then one XLA
#         elementwise dx.  4R + 1W vs autodiff's ~6R + 1W.

BLOCKED_BN_ROWS = 512  # rows per grid step; block bytes = 4*rows*D


def _bn_stats_blocked_kernel(x_ref, mask_ref, out_ref, cnt_ref, acc):
    """Sequential-grid Chan combine.  acc rows: 0=cnt (lane-bcast), 1=mean,
    2=M2.  Final block writes mean/biased-var to out_ref [2, D], cnt to
    cnt_ref [1, 1]."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    m = mask_ref[...]  # [BN, 1]
    c_b = jnp.sum(m)
    safe_cb = jnp.maximum(c_b, 1.0)
    mean_b = jnp.sum(x * m, axis=0, keepdims=True) / safe_cb
    xc = (x - mean_b) * m
    m2_b = jnp.sum(xc * xc, axis=0, keepdims=True)

    c = acc[0:1, :]
    mean = acc[1:2, :]
    m2 = acc[2:3, :]
    c_new = c + c_b
    safe = jnp.maximum(c_new, 1.0)
    delta = mean_b - mean
    # all-masked blocks (c_b = 0) contribute delta * 0 — exact no-ops
    mean_new = mean + delta * (c_b / safe)
    m2_new = m2 + m2_b + delta * delta * (c * c_b / safe)
    acc[0:1, :] = c_new
    acc[1:2, :] = mean_new
    acc[2:3, :] = m2_new

    @pl.when(b == nb - 1)
    def _():
        cnt = jnp.maximum(acc[0:1, 0:1], 1.0)
        out_ref[0:1, :] = acc[1:2, :]
        out_ref[1:2, :] = acc[2:3, :] / jnp.maximum(acc[0:1, :], 1.0)
        cnt_ref[...] = cnt


def _bn_bwd_sums_blocked_kernel(x_ref, g_ref, mean_ref, var_ref, eps_ref,
                                out_ref, acc):
    """Sequential-grid accumulation of sum(g) and sum(g * xhat) over ALL
    rows (wrapper-padded rows carry g = 0)."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    g = g_ref[...]
    r = jax.lax.rsqrt(var_ref[...] + eps_ref[0, 0])
    xhat = (x - mean_ref[...]) * r
    acc[0:1, :] += jnp.sum(g, axis=0, keepdims=True)
    acc[1:2, :] += jnp.sum(g * xhat, axis=0, keepdims=True)

    @pl.when(b == nb - 1)
    def _():
        out_ref[...] = acc[0:2, :]


def _pad_block_rows(a, rows):
    n = a.shape[0]
    pad = (-n) % rows
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
    return a


def _call_stats_blocked(x, mask_f, interpret, rows=BLOCKED_BN_ROWS):
    n, d = x.shape
    xp = _pad_block_rows(x, rows)
    mp = _pad_block_rows(mask_f, rows)  # padding rows: mask 0
    nb = xp.shape[0] // rows
    out, cnt = pl.pallas_call(
        _bn_stats_blocked_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, d), lambda b: (b, 0)),
                  pl.BlockSpec((rows, 1), lambda b: (b, 0))],
        out_specs=[pl.BlockSpec((2, d), lambda b: (0, 0)),
                   pl.BlockSpec((1, 1), lambda b: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((2, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        interpret=interpret,
    )(xp, mp)
    return out[0:1, :], out[1:2, :], cnt


def _call_bwd_sums_blocked(x, g, mean, var, eps, interpret,
                           rows=BLOCKED_BN_ROWS):
    n, d = x.shape
    xp = _pad_block_rows(x, rows)
    gp = _pad_block_rows(g, rows)  # zero-padded: sums over ALL real rows
    nb = xp.shape[0] // rows
    out = pl.pallas_call(
        _bn_bwd_sums_blocked_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, d), lambda b: (b, 0)),
                  pl.BlockSpec((rows, d), lambda b: (b, 0)),
                  pl.BlockSpec((1, d), lambda b: (0, 0)),
                  pl.BlockSpec((1, d), lambda b: (0, 0)),
                  pl.BlockSpec((1, 1), lambda b: (0, 0))],
        out_specs=pl.BlockSpec((2, d), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        interpret=interpret,
    )(xp, gp, mean, var, eps)
    return out[0:1, :], out[1:2, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_bn_blocked(interpret, x, mask_f, scale, bias, eps):
    y, mean, var, _ = _fused_bn_blocked_parts(interpret, x, mask_f, scale,
                                              bias, eps)
    return y, mean, var


def _fused_bn_blocked_parts(interpret, x, mask_f, scale, bias, eps):
    mean, var, cnt = _call_stats_blocked(x, mask_f, interpret)
    r = jax.lax.rsqrt(var + eps[0, 0])
    y = (x - mean) * r * scale + bias  # one fused XLA elementwise pass
    return y, mean, var, cnt


def _fused_bn_blocked_fwd(interpret, x, mask_f, scale, bias, eps):
    y, mean, var, cnt = _fused_bn_blocked_parts(interpret, x, mask_f, scale,
                                                bias, eps)
    return (y, mean, var), (x, mask_f, scale, mean, var, cnt, eps)


def _fused_bn_blocked_bwd(interpret, res, cts):
    x, mask_f, scale, mean, var, cnt, eps = res
    g, _, _ = cts  # mean/var outputs are detached (see _fused_bn)
    sum_g, sum_gx = _call_bwd_sums_blocked(x, g, mean, var, eps, interpret)
    r = jax.lax.rsqrt(var + eps[0, 0])
    xhat = (x - mean) * r
    dx = scale * r * (g - mask_f * (sum_g + xhat * sum_gx) / cnt)
    return (dx, None, sum_gx, sum_g, None)


_fused_bn_blocked.defvjp(_fused_bn_blocked_fwd, _fused_bn_blocked_bwd)


def fused_masked_bn_blocked(x, mask, scale, bias, eps: float = 1e-5,
                            interpret: bool = False):
    """Grid-blocked fused masked BN for inputs past FUSED_BN_VMEM_LIMIT
    (same contract as fused_masked_bn; any [N, D] size)."""
    interpret = interpret or jax.default_backend() != "tpu"
    n, d = x.shape
    mask_f = (jnp.ones((n, 1), jnp.float32) if mask is None
              else mask.reshape(n, 1).astype(jnp.float32))
    scale2 = scale.reshape(1, d).astype(jnp.float32)
    bias2 = bias.reshape(1, d).astype(jnp.float32)
    eps_arr = jnp.full((1, 1), eps, jnp.float32)
    y, mean, var = _fused_bn_blocked(interpret, x.astype(jnp.float32),
                                     mask_f, scale2, bias2, eps_arr)
    return y, mean.reshape(d), var.reshape(d)
