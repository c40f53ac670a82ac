"""Hypercomplex batch normalization, functional with explicit running stats.

``naive-batch-norm``        — n independent BatchNorms, one per component
                              (reference: phc/hypercomplex/norm.py:5-39);
``naive-naive-batch-norm``  — a single BatchNorm over the flat ``n*d`` vector
                              (reference: phc/hypercomplex/norm.py:45-74);
``q-batch-norm``            — full quaternion whitening BN: per-feature 4x4
                              covariance, closed-form Cholesky solve, learnable
                              4x4-per-feature Gamma (init 0.5 I) and 4-vector
                              beta (reference: phc/quaternion/norm.py:104-276).

BN semantics follow torch.nn.BatchNorm1d: batch statistics use biased variance
for normalization, running stats are updated as
``running += momentum * (batch - running)`` with torch's momentum=0.1.  The
naive BNs store the UNBIASED batch variance (x N/(N-1)) in the running var,
exactly like torch BatchNorm1d — at reference batch sizes the correction is
< 0.1 % but on small graphs it is visible in eval outputs (pinned by
tests/test_trained_parity.py).  The whitening BN stores the BIASED covariance,
exactly like the reference's own update (quaternion/norm.py:123-127).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["PHMNorm", "QuaternionWhiteningNorm"]

# test hook: force the fused-BN branch (in Pallas interpret mode) off-TPU so
# CPU tests cover the fused path's stat bookkeeping, not just the XLA path
_FORCE_FUSED_INTERPRET = False

# bench hook (scripts/bench_whitening.py step bisect): PHMNorm instances whose
# flax name is in this set run naive-batch-norm regardless of configured type,
# so step-level cost can be attributed per norm site.  Never set in production.
_FORCE_NAIVE_NAMES: set = set()


class _BatchNorm(nn.Module):
    """Shared BN core over leading batch axis; feature shape = input.shape[1:].

    ``mask`` [N] excludes padding rows from the batch statistics — without it,
    padded node/graph rows shift mean/var by the padding fraction (the
    reference never pads, so unmasked stats would silently diverge)."""

    momentum: float = 0.1  # torch-style: running += momentum * (batch - running)
    eps: float = 1e-5
    affine: bool = True
    stat_axis: str | None = None  # mesh axis to psum batch stats over (the
                                  # node-sharded path, parallel/halo.py)

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        feat_shape = x.shape[1:]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat_shape, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat_shape, jnp.float32))

        def _psum(v):
            if self.stat_axis is not None and not self.is_initializing():
                return jax.lax.psum(v, self.stat_axis)
            return v

        if self.affine:
            scale = self.param("scale", nn.initializers.ones, feat_shape)
            bias = self.param("bias", nn.initializers.zeros, feat_shape)
        else:
            scale = jnp.ones(feat_shape, jnp.float32)
            bias = jnp.zeros(feat_shape, jnp.float32)

        if training:
            from phc_gnn_tpu.ops import fused_bn as _fb
            from phc_gnn_tpu.ops.fused_bn import (FUSED_BN_VMEM_LIMIT,
                                                  fused_masked_bn,
                                                  fused_masked_bn_blocked)
            fused = (self.stat_axis is None and not self.is_initializing()
                     and not _fb.FUSED_BN_DISABLE
                     and (jax.default_backend() == "tpu"
                          or _FORCE_FUSED_INTERPRET))
            if fused:
                # Pallas kernels (ops/fused_bn.py): the single-block form
                # (stats + normalize in one HBM read + write, analytic VJP)
                # while x fits VMEM; the grid-blocked Chan-combine form
                # (2R+1W fwd) for anything larger (e.g. pcba's 4096 x 512)
                flat = x.reshape(x.shape[0], -1)
                kernel = (fused_masked_bn
                          if x.size * 4 <= FUSED_BN_VMEM_LIMIT
                          else fused_masked_bn_blocked)
                y, mean, var = kernel(
                    flat, mask, scale.reshape(-1), bias.reshape(-1), self.eps,
                    interpret=_FORCE_FUSED_INTERPRET)
                y = y.reshape(x.shape)
                mean = mean.reshape(feat_shape)
                var = var.reshape(feat_shape)
                cnt = (jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
                       if mask is not None else jnp.float32(x.shape[0]))
            else:
                # Two-pass batch statistics: mean first, then E[(x-mean)^2].
                # The one-pass shifted form E[(x-c)^2]-E[x-c]^2
                # catastrophically cancels in f32 when |mean-c| >> std (e.g.
                # cold start where the running mean c=0 and a feature column
                # sits at ~1e6 with std 0.1, yielding var==0 and
                # rsqrt(eps)-scaled garbage).  Correctness over the extra pass.
                if mask is not None:
                    m = mask.reshape((-1,) + (1,) * len(feat_shape)).astype(
                        jnp.float32)
                    cnt = jnp.maximum(_psum(jnp.sum(m)), 1.0)
                    mean = _psum(jnp.sum(x * m, axis=0)) / cnt
                    xc = (x - mean) * m
                else:
                    cnt = _psum(jnp.float32(x.shape[0]))
                    mean = _psum(jnp.sum(x, axis=0)) / cnt
                    xc = x - mean
                var = _psum(jnp.sum(xc * xc, axis=0)) / cnt
                y = ((x - mean) * jax.lax.rsqrt(var + self.eps)
                     * scale + bias)
            if not self.is_initializing():
                # torch BatchNorm1d stores the UNBIASED variance in the
                # running buffer while normalizing with the biased one
                var_u = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                ra_mean.value = ra_mean.value + self.momentum * (mean - ra_mean.value)
                ra_var.value = ra_var.value + self.momentum * (var_u - ra_var.value)
        else:
            mean, var = ra_mean.value, ra_var.value
            y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(in_dtype)


class PHMNorm(nn.Module):
    """Wrapper dispatching on norm_type
    (reference: phc/hypercomplex/norm.py:45-74)."""

    num_features: int  # flat size (n * per-component)
    phm_dim: int
    norm_type: str = "naive-batch-norm"
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    stat_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        assert self.norm_type in ("naive-batch-norm", "naive-naive-batch-norm",
                                  "q-batch-norm")
        n = self.phm_dim
        norm_type = self.norm_type
        if norm_type == "q-batch-norm" and self.name in _FORCE_NAIVE_NAMES:
            norm_type = "naive-batch-norm"
        if norm_type == "q-batch-norm":
            # full whitening BN (reference 'q-batch-norm', n=4 only); passed
            # FLAT [N, 4d] — the module slices lane ranges directly, avoiding
            # rank-3 [N, 1, d] intermediates (1/8 sublane utilization)
            assert n == 4, "q-batch-norm requires phm_dim=4"
            d = self.num_features // n
            y = QuaternionWhiteningNorm(num_features=d, momentum=self.momentum,
                                        eps=self.eps, affine=self.affine,
                                        stat_axis=self.stat_axis,
                                        name="qbn")(x, training=training,
                                                    mask=mask)
            return y.astype(x.dtype)
        if norm_type == "naive-batch-norm":
            # [N, n*d] -> [N, n, d]: one BN per (component, feature) pair ==
            # n independent per-component BatchNorm1d(d)
            d = self.num_features // n
            xs = x.reshape(x.shape[0], n, d)
            y = _BatchNorm(self.momentum, self.eps, self.affine,
                           self.stat_axis, name="bn")(
                xs, training=training, mask=mask)
            return y.reshape(x.shape).astype(x.dtype)
        return _BatchNorm(self.momentum, self.eps, self.affine,
                          self.stat_axis, name="bn")(
            x, training=training, mask=mask).astype(x.dtype)


def _cholesky4x4(cov: jax.Array) -> jax.Array:
    """Closed-form Cholesky of symmetric 4x4 matrices, batched over leading axes
    (vectorized form of reference phc/quaternion/norm.py:20-60)."""
    c = cov
    l_rr = jnp.sqrt(c[..., 0, 0])
    l_ri = c[..., 0, 1] / l_rr
    l_ii = jnp.sqrt(c[..., 1, 1] - l_ri * l_ri)
    l_rj = c[..., 0, 2] / l_rr
    l_ij = (c[..., 1, 2] - l_ri * l_rj) / l_ii
    l_jj = jnp.sqrt(c[..., 2, 2] - (l_ij * l_ij + l_rj * l_rj))
    l_rk = c[..., 0, 3] / l_rr
    l_ik = (c[..., 1, 3] - l_ri * l_rk) / l_ii
    l_jk = (c[..., 2, 3] - (l_ij * l_ik + l_rj * l_rk)) / l_jj
    l_kk = jnp.sqrt(c[..., 3, 3] - (l_jk * l_jk + l_ik * l_ik + l_rk * l_rk))
    z = jnp.zeros_like(l_rr)
    row0 = jnp.stack([l_rr, z, z, z], axis=-1)
    row1 = jnp.stack([l_ri, l_ii, z, z], axis=-1)
    row2 = jnp.stack([l_rj, l_ij, l_jj, z], axis=-1)
    row3 = jnp.stack([l_rk, l_ik, l_jk, l_kk], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def _solve_lower4x4(l: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution L y = b for 4x4 lower-triangular L (..., 4, 4) and
    b (..., 4) — avoids generic LAPACK on TPU."""
    y0 = b[..., 0] / l[..., 0, 0]
    y1 = (b[..., 1] - l[..., 1, 0] * y0) / l[..., 1, 1]
    y2 = (b[..., 2] - l[..., 2, 0] * y0 - l[..., 2, 1] * y1) / l[..., 2, 2]
    y3 = (b[..., 3] - l[..., 3, 0] * y0 - l[..., 3, 1] * y1
          - l[..., 3, 2] * y2) / l[..., 3, 3]
    return jnp.stack([y0, y1, y2, y3], axis=-1)


class QuaternionWhiteningNorm(nn.Module):
    """Full quaternion whitening batch-norm ('q-batch-norm').

    Input: stacked quaternion tensor [N, 4, d] or the equivalent flat
    [N, 4*d] (component-major — the output matches the input layout).
    Whitens each feature's 4-vector to identity covariance via the
    closed-form 4x4 Cholesky (triangular solve instead of an explicit
    inverse), then applies the learnable 4x4 Gamma (init 0.5 I) and beta
    (reference: phc/quaternion/norm.py:104-276).

    All per-row arithmetic runs on rank-2 [N, d] lane-range slices of the
    flat layout: rank-3 [N, 1, d] intermediates tile as (8, 128) with one
    sublane used — the flat form keeps full sublane occupancy.
    """

    num_features: int  # per-component feature count d
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    stat_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        d = self.num_features
        assert (x.ndim == 3 and x.shape[1] == 4 and x.shape[2] == d) or \
               (x.ndim == 2 and x.shape[1] == 4 * d), x.shape
        in_dtype = x.dtype
        out_shape = x.shape
        x = x.astype(jnp.float32).reshape(x.shape[0], 4 * d)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((4, d), jnp.float32))
        # torch-exact stat init: the reference's reset_running_stats fills the
        # whole [4,4,F] running covariance with ONES (quaternion/norm.py:240
        # running_var.fill_(1)), not the identity — the all-ones 4x4 (+ eps*I)
        # is what eval-mode whitening sees until the EMA washes it out, so the
        # early-epoch eval trajectory only matches torch if we start there too
        ra_cov = self.variable(
            "batch_stats", "cov",
            lambda: jnp.ones((4, 4, d), jnp.float32))

        def _psum(v):
            if self.stat_axis is not None and not self.is_initializing():
                return jax.lax.psum(v, self.stat_axis)
            return v

        # Component-slice formulation (round 5, KERNELS.md): every per-row op
        # runs on [N, d] slices so d stays in the TPU lane dimension.  The
        # earlier form transposed to [N, d, 4] and solved with the quaternion
        # axis in lanes (4/128 utilization) and built the covariance via
        # einsum("ncd,nkd->dck") — a TPU dot in DEFAULT precision, i.e.
        # bf16-truncated operands (~3e-4 abs cov error).  The slice form is
        # pure-f32 elementwise: measured 24.1 -> 7.3 us fwd, 41.6 -> 11.7 us
        # fwd+bwd at [4096, 4, 50] (scripts/bench_whitening.py) AND tightens
        # output error vs an f64 oracle from 4.6e-3 to 1.9e-7 relative.
        if self.affine:
            def gamma_init(key, shape, dtype=jnp.float32):
                return jnp.broadcast_to(
                    (0.5 * jnp.eye(4))[..., None], shape).astype(dtype)

            gamma = self.param("gamma", gamma_init, (4, 4, d))
            beta = self.param("beta", nn.initializers.zeros, (4, d))
        else:
            # identity mix: affine=False returns the raw whitened z
            gamma = jnp.broadcast_to(jnp.eye(4)[..., None], (4, 4, d))
            beta = jnp.zeros((4, d), jnp.float32)

        from phc_gnn_tpu.ops import fused_whitening as _fw
        if (training and self.stat_axis is None
                and not _fw.FUSED_WHITENING_DISABLE):
            # analytic-VJP path (ops/fused_whitening.py): identical math, but
            # the backward is one compact hand-derived formula instead of
            # ~30 interleaved autodiff reductions — in the train step this
            # keeps the whitening a self-contained fusion region
            mask_f = (jnp.ones((x.shape[0], 1), jnp.float32) if mask is None
                      else mask.reshape(-1, 1).astype(jnp.float32))
            y, mean_s, cov_s = _fw.fused_whitening(
                x, mask_f, gamma, beta, float(self.eps))
            if not self.is_initializing():
                ra_mean.value = ra_mean.value + self.momentum * (
                    mean_s - ra_mean.value)
                ra_cov.value = ra_cov.value + self.momentum * (
                    cov_s - ra_cov.value)
            return y.reshape(out_shape).astype(in_dtype)

        # inline path (eval mode, cross-shard stat_axis, or kill switch):
        # rank-3 slicing — measured faster here than flat lane-range slices,
        # whose unaligned starts emit cross-lane rotations per use (the
        # training default above avoids both via the Pallas kernels)
        x3 = x.reshape(x.shape[0], 4, d)
        c = [x3[:, k, :] for k in range(4)]
        if training:
            if mask is not None:
                mcol = mask.reshape(-1, 1).astype(x.dtype)
                cnt = jnp.maximum(_psum(jnp.sum(mask.astype(x.dtype))), 1.0)
                mean = [_psum(jnp.sum(ck * mcol, axis=0)) / cnt for ck in c]
                cm = [(ck - mu[None]) * mcol for ck, mu in zip(c, mean)]
            else:
                cnt = _psum(jnp.float32(x.shape[0]))
                mean = [_psum(jnp.sum(ck, axis=0)) / cnt for ck in c]
                cm = [ck - mu[None] for ck, mu in zip(c, mean)]
            # upper-triangular per-feature covariance entries, each [d]
            cov = {}
            for j in range(4):
                for k in range(j, 4):
                    cov[(j, k)] = _psum(jnp.sum(cm[j] * cm[k], axis=0)) / cnt
            if not self.is_initializing():
                mean_s = jnp.stack(mean, axis=0)  # [4, d]
                cov_s = jnp.stack(
                    [jnp.stack([cov[(min(j, k), max(j, k))] for k in range(4)],
                               axis=0) for j in range(4)], axis=0)  # [4, 4, d]
                ra_mean.value = ra_mean.value + self.momentum * (
                    mean_s - ra_mean.value)
                ra_cov.value = ra_cov.value + self.momentum * (
                    cov_s - ra_cov.value)
        else:
            mean = [ra_mean.value[k] for k in range(4)]
            cov = {(j, k): ra_cov.value[j, k]
                   for j in range(4) for k in range(j, 4)}
        # un-zeroed centered values, closed-form Cholesky of cov + eps*I on
        # [d] scalar fields, forward substitution L z = (x - mean), Gamma mix
        # (helpers shared with ops/fused_whitening.py; reference
        # phc/quaternion/norm.py:20-60)
        cu = [ck - mu[None] for ck, mu in zip(c, mean)]
        l = _fw._chol_fields(cov, jnp.float32(self.eps))
        zs = _fw._fwd_subst(l, cu)
        # Gamma mix out_c = sum_k gamma[c,k] z_k + beta[c]: 16 [N,d] FMAs
        zs = [sum(gamma[cc, k][None] * zs[k] for k in range(4))
              + beta[cc][None] for cc in range(4)]
        return jnp.stack(zs, axis=1).reshape(out_shape).astype(in_dtype)
