"""Quaternion whitening BN ('q-batch-norm') with an analytic custom VJP.

The slice-form whitening (nn/norm.py::QuaternionWhiteningNorm) is already at
its HBM floor in isolation (~40 us fwd+bwd with full param grads at
4096 x 200, scripts/bench_whitening.py) but costs ~100 us per instance inside
the train step: XLA's autodiff interleaves its ~30 small reductions/FMA chains
with the surrounding GEMM backward and re-materializes the [N, D] activations
repeatedly.  This module pins the backward to one compact hand-derived
formula so the whole whitening (fwd AND bwd) stays a self-contained fusion
region.  Semantics: reference phc/quaternion/norm.py:104-276 (training mode;
the eval path is cheap and stays inline in nn/norm.py).

Math (per feature f, suppressed; u, z, h, w are 4-vectors per row, L a 4x4
lower-triangular field over features):

  forward:   mu = sum(m x)/cnt;  u = x - mu;  Sigma = sum(m u u^T)/cnt
             L = chol(Sigma + eps I);  z = L^{-1} u;  y = Gamma z + beta

  backward (cotangent g):
             dbeta_c  = sum_n g_c
             dGamma_ck = sum_n g_c . z_k
             h = Gamma^T g            (per row)
             w = L^{-T} h             (back substitution)
             Lbar = -tril( sum_n w_n z_n^T )
             T = L^T Lbar;  S = tril_s(T) + tril_s(T)^T + diag(T)
             M = L^{-T} S L^{-1}      (symmetric; column solves)
             dx_n = w_n + (m_n/cnt) (M u_n) - (m_n/cnt) sum_j w_j

  The mean-path correction uses sum_n m_n u_n = 0 (u is centered on the
  masked mean), which collapses sum_j du_j to sum_j w_j.  The Cholesky
  cotangent uses the phi-projection identity (JAX's own cholesky JVP
  dL = L phi(L^{-1} dA L^{-T}), phi = strict-lower + half-diagonal), whose
  transpose combined with the symmetrizing product rule for Sigma = u u^T
  gives the factor-free M above.

Everything is [N, d] component-slice arithmetic (d stays in TPU lanes) plus
[d]-field scalar algebra for the 4x4 triangular work — no transposes, no
dots, f32 throughout.  Verified bit-level against jax.grad of the inline
form (tests/test_nn_modules.py::test_fused_whitening_vjp_matches_autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_whitening", "FUSED_WHITENING_DISABLE", "WBN_BLOCK_ROWS"]

# kill switch for A/B benches (scripts/bench_whitening.py)
FUSED_WHITENING_DISABLE = False

# test hook: run the Pallas kernels in interpret mode off-TPU so CPU tests
# cover the kernel math (mirrors nn/norm.py::_FORCE_FUSED_INTERPRET)
_FORCE_INTERPRET = False


def _chol_fields(cov, eps):
    """Closed-form Cholesky of {(j,k): [d]} symmetric cov + eps*I
    (vectorized form of reference phc/quaternion/norm.py:20-60)."""
    l = {}
    l[(0, 0)] = jnp.sqrt(cov[(0, 0)] + eps)
    l[(1, 0)] = cov[(0, 1)] / l[(0, 0)]
    l[(1, 1)] = jnp.sqrt(cov[(1, 1)] + eps - l[(1, 0)] ** 2)
    l[(2, 0)] = cov[(0, 2)] / l[(0, 0)]
    l[(2, 1)] = (cov[(1, 2)] - l[(1, 0)] * l[(2, 0)]) / l[(1, 1)]
    l[(2, 2)] = jnp.sqrt(cov[(2, 2)] + eps
                         - (l[(2, 1)] ** 2 + l[(2, 0)] ** 2))
    l[(3, 0)] = cov[(0, 3)] / l[(0, 0)]
    l[(3, 1)] = (cov[(1, 3)] - l[(1, 0)] * l[(3, 0)]) / l[(1, 1)]
    l[(3, 2)] = (cov[(2, 3)]
                 - (l[(2, 1)] * l[(3, 1)] + l[(2, 0)] * l[(3, 0)])) / l[(2, 2)]
    l[(3, 3)] = jnp.sqrt(cov[(3, 3)] + eps
                         - (l[(3, 2)] ** 2 + l[(3, 1)] ** 2 + l[(3, 0)] ** 2))
    return l


def _inv_diag(l):
    """Reciprocal diagonal fields: the substitutions multiply by these
    instead of dividing — a [rows, d]-wide VPU divide is multi-cycle while
    the reciprocal is computed once on a [1, d] field."""
    return [1.0 / l[(k, k)] for k in range(4)]


def _fwd_subst(l, b, il=None):
    """Solve L z = b for 4 stacked [N, d] (or [d]) rows b."""
    il = _inv_diag(l) if il is None else il
    z0 = b[0] * il[0]
    z1 = (b[1] - l[(1, 0)] * z0) * il[1]
    z2 = (b[2] - l[(2, 0)] * z0 - l[(2, 1)] * z1) * il[2]
    z3 = (b[3] - l[(3, 0)] * z0 - l[(3, 1)] * z1
          - l[(3, 2)] * z2) * il[3]
    return [z0, z1, z2, z3]


def _bwd_subst(l, b, il=None):
    """Solve L^T w = b (back substitution)."""
    il = _inv_diag(l) if il is None else il
    w3 = b[3] * il[3]
    w2 = (b[2] - l[(3, 2)] * w3) * il[2]
    w1 = (b[1] - l[(2, 1)] * w2 - l[(3, 1)] * w3) * il[1]
    w0 = (b[0] - l[(1, 0)] * w1 - l[(2, 0)] * w2
          - l[(3, 0)] * w3) * il[0]
    return [w0, w1, w2, w3]


def _m_from_lbar(l, lbar):
    """Cholesky-cotangent sandwich: T = L^T Lbar, S = copyltu(T),
    M = L^{-T} S L^{-1} (symmetric).  Returns rows m[a][b] = M_ab."""
    t = {}
    for a in range(4):
        for b in range(4):
            v = 0.0
            for cc in range(max(a, b), 4):
                v = v + l[(cc, a)] * lbar[(cc, b)]
            t[(a, b)] = v
    s = {}
    for a in range(4):
        s[(a, a)] = t[(a, a)]
        for b in range(a):
            s[(a, b)] = t[(a, b)]
            s[(b, a)] = t[(a, b)]
    il = _inv_diag(l)
    v_cols = [_bwd_subst(l, [s[(a, b)] for a in range(4)], il)
              for b in range(4)]
    return [_bwd_subst(l, [v_cols[b][a] for b in range(4)], il)
            for a in range(4)]


def _slices(a, d):
    return [a[:, k * d:(k + 1) * d] for k in range(4)]


def _stats(x, mask_f, d):
    """Masked mean slices + upper-tri covariance fields of flat [N, 4d] x."""
    cnt = jnp.maximum(jnp.sum(mask_f), 1.0)
    c = _slices(x, d)
    mean = [jnp.sum(ck * mask_f, axis=0) / cnt for ck in c]
    cm = [(ck - mu[None]) * mask_f for ck, mu in zip(c, mean)]
    cov = {}
    for j in range(4):
        for k in range(j, 4):
            cov[(j, k)] = jnp.sum(cm[j] * cm[k], axis=0) / cnt
    return cnt, c, mean, cov


def _transform(c, mean, l, gamma, beta):
    """u = x - mu (all rows), z = L^{-1} u, y = Gamma z + beta; flat [N, 4d]."""
    cu = [ck - mu[None] for ck, mu in zip(c, mean)]
    zs = _fwd_subst(l, cu)
    out = [sum(gamma[cc, k][None] * zs[k] for k in range(4)) + beta[cc][None]
           for cc in range(4)]
    return jnp.concatenate(out, axis=1), cu, zs


# ------------------------------------------------------- Pallas kernels
# Two grid-blocked kernels per direction (the fused_bn_blocked pattern): the
# [N, 4d] activations cross HBM once per kernel and ALL the [d]-field
# Cholesky/solve algebra runs inside a kernel, in registers.  XLA cannot win
# this op in any jnp formulation: rank-3 [N, 1, d] slicing tiles at 1/8
# sublane occupancy, flat lane-range slicing emits cross-lane rotations per
# use, and the ~30-step field chain leaks hundreds of tiny f32[d] kernels +
# HBM copies into the step schedule (measured round 5, KERNELS.md).
#
#   fwd:  stats kernel   — Chan-combine (cnt, mean_k, comoment M2_jk) per
#                          row block; final block derives cov AND the
#                          Cholesky fields L in-kernel.
#         transform kern — z = L^{-1}(x - mu), y = Gamma z + beta per block.
#   bwd:  sums kernel    — accumulates dbeta, dGamma, Lbar, sum_w per block;
#                          final block runs the T/S/M field algebra.
#         dx kernel      — dx = w + (m/cnt)(M u - sum_w) per block.

WBN_BLOCK_ROWS = 1024  # rows per grid step; block bytes = 4 * rows * 4d


def _row_slices(a, d):
    n = a.shape[0]
    return [jax.lax.slice(a, (0, k * d), (n, (k + 1) * d)) for k in range(4)]


def _wbn_stats_kernel(x_ref, mask_ref, eps_ref, mean_ref, cov_ref, l_ref,
                      cnt_ref, acc):
    """acc rows: 0 = cnt (lane-broadcast), 1..4 = mean_k, 5..14 = M2_jk in
    _COV_IDX order."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    m = mask_ref[...]
    d = x.shape[1] // 4
    c = _row_slices(x, d)
    c_b = jnp.sum(m)
    safe_cb = jnp.maximum(c_b, 1.0)
    mean_b = [jnp.sum(ck * m, axis=0, keepdims=True) / safe_cb for ck in c]
    cm_b = [(ck - mu) * m for ck, mu in zip(c, mean_b)]

    cnt_old = acc[0:1, :]
    cnt_new = cnt_old + c_b
    safe_new = jnp.maximum(cnt_new, 1.0)
    ratio_b = c_b / safe_new                  # [1, d] lane-broadcast
    ratio_cross = cnt_old * ratio_b           # c_old * c_b / c_new
    deltas = [mean_b[k] - acc[1 + k:2 + k, :] for k in range(4)]
    for i, (j, k) in enumerate(_COV_IDX):
        m2_b = jnp.sum(cm_b[j] * cm_b[k], axis=0, keepdims=True)
        # all-masked blocks (c_b = 0) contribute delta * 0 — exact no-ops
        acc[5 + i:6 + i, :] += m2_b + deltas[j] * deltas[k] * ratio_cross
    for k in range(4):
        acc[1 + k:2 + k, :] += deltas[k] * ratio_b
    acc[0:1, :] = cnt_new

    @pl.when(b == nb - 1)
    def _():
        cnt = jnp.maximum(acc[0:1, :], 1.0)
        cov = {}
        for i, (j, k) in enumerate(_COV_IDX):
            cov[(j, k)] = acc[5 + i:6 + i, :] / cnt
        l = _chol_fields(cov, eps_ref[0, 0])
        for k in range(4):
            mean_ref[k:k + 1, :] = acc[1 + k:2 + k, :]
        for j in range(4):
            for k in range(4):
                cov_ref[j * 4 + k:j * 4 + k + 1, :] = \
                    cov[(min(j, k), max(j, k))]
        for i, jk in enumerate(_L_IDX):
            l_ref[i:i + 1, :] = l[jk]
        cnt_ref[...] = jnp.maximum(acc[0:1, 0:1], 1.0)


def _wbn_transform_kernel(x_ref, mean_ref, l_ref, gamma_ref, beta_ref,
                          y_ref):
    x = x_ref[...]
    d = x.shape[1] // 4
    c = _row_slices(x, d)
    mean = [mean_ref[k:k + 1, :] for k in range(4)]
    l = {jk: l_ref[i:i + 1, :] for i, jk in enumerate(_L_IDX)}
    cu = [ck - mu for ck, mu in zip(c, mean)]
    zs = _fwd_subst(l, cu, _inv_diag(l))
    gam = gamma_ref[...]
    for cc in range(4):
        acc = beta_ref[cc:cc + 1, :]
        for k in range(4):
            acc = acc + gam[cc * 4 + k:cc * 4 + k + 1, :] * zs[k]
        y_ref[:, cc * d:(cc + 1) * d] = acc


def _wbn_bwd_sums_kernel(x_ref, g_ref, mask_ref, gamma_ref, mean_ref, l_ref,
                         dgamma_ref, dbeta_ref, lbar_ref, sw_ref, acc):
    """acc rows: 0..3 dbeta, 4..19 dGamma (cc*4+k), 20..29 Lbar (_L_IDX
    order), 30..33 sum_w."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    g = g_ref[...]
    d = x.shape[1] // 4
    c = _row_slices(x, d)
    gs = _row_slices(g, d)
    mean = [mean_ref[k:k + 1, :] for k in range(4)]
    l = {jk: l_ref[i:i + 1, :] for i, jk in enumerate(_L_IDX)}
    gam = gamma_ref[...]
    il = _inv_diag(l)
    cu = [ck - mu for ck, mu in zip(c, mean)]
    zs = _fwd_subst(l, cu, il)
    for cc in range(4):
        acc[cc:cc + 1, :] += jnp.sum(gs[cc], axis=0, keepdims=True)
        for k in range(4):
            acc[4 + cc * 4 + k:5 + cc * 4 + k, :] += jnp.sum(
                gs[cc] * zs[k], axis=0, keepdims=True)
    hs = [sum(gam[cc * 4 + k:cc * 4 + k + 1, :] * gs[cc] for cc in range(4))
          for k in range(4)]
    ws = _bwd_subst(l, hs, il)
    for i, (j, k) in enumerate(_L_IDX):
        acc[20 + i:21 + i, :] += -jnp.sum(ws[j] * zs[k], axis=0,
                                          keepdims=True)
    for k in range(4):
        acc[30 + k:31 + k, :] += jnp.sum(ws[k], axis=0, keepdims=True)

    @pl.when(b == nb - 1)
    def _():
        # raw Lbar only: the one-shot T/S/M field chain (~150 serial [1, d]
        # vector ops) runs in XLA between the kernels — inside the kernel it
        # sits on the final block's critical path (measured +~10 us)
        for i in range(10):
            lbar_ref[i:i + 1, :] = acc[20 + i:21 + i, :]
        for cc in range(4):
            dbeta_ref[cc:cc + 1, :] = acc[cc:cc + 1, :]
            sw_ref[cc:cc + 1, :] = acc[30 + cc:31 + cc, :]
            for k in range(4):
                dgamma_ref[cc * 4 + k:cc * 4 + k + 1, :] = \
                    acc[4 + cc * 4 + k:5 + cc * 4 + k, :]


def _wbn_dx_kernel(x_ref, g_ref, mask_ref, gamma_ref, mean_ref, l_ref,
                   mmat_ref, sw_ref, cnt_ref, dx_ref):
    x = x_ref[...]
    g = g_ref[...]
    m = mask_ref[...]
    d = x.shape[1] // 4
    c = _row_slices(x, d)
    gs = _row_slices(g, d)
    mean = [mean_ref[k:k + 1, :] for k in range(4)]
    l = {jk: l_ref[i:i + 1, :] for i, jk in enumerate(_L_IDX)}
    gam = gamma_ref[...]
    il = _inv_diag(l)
    cu = [ck - mu for ck, mu in zip(c, mean)]
    hs = [sum(gam[cc * 4 + k:cc * 4 + k + 1, :] * gs[cc] for cc in range(4))
          for k in range(4)]
    ws = _bwd_subst(l, hs, il)
    scale = m * (1.0 / cnt_ref[0, 0])
    for a in range(4):
        mu_a = sum(mmat_ref[a * 4 + bb:a * 4 + bb + 1, :] * cu[bb]
                   for bb in range(4))
        dx_ref[:, a * d:(a + 1) * d] = ws[a] + scale * (
            mu_a - sw_ref[a:a + 1, :])


_COV_IDX = [(j, k) for j in range(4) for k in range(j, 4)]


def _use_pallas(x):
    return jax.default_backend() == "tpu" or _FORCE_INTERPRET


def _pad_rows(a, rows):
    pad = (-a.shape[0]) % rows
    return jnp.pad(a, ((0, pad), (0, 0))) if pad else a


def _call_fwd_pallas(x, mask_f, gamma, beta, eps):
    n, dd = x.shape
    d = dd // 4
    rows = min(WBN_BLOCK_ROWS, max(8, n))
    xp = _pad_rows(x, rows)
    mp = _pad_rows(mask_f, rows)  # padding rows: mask 0
    nb = xp.shape[0] // rows
    mean_s, cov_s, l_s, cnt = pl.pallas_call(
        _wbn_stats_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, dd), lambda b: (b, 0)),
                  pl.BlockSpec((rows, 1), lambda b: (b, 0)),
                  pl.BlockSpec((1, 1), lambda b: (0, 0))],
        out_specs=[pl.BlockSpec((4, d), lambda b: (0, 0)),
                   pl.BlockSpec((16, d), lambda b: (0, 0)),
                   pl.BlockSpec((10, d), lambda b: (0, 0)),
                   pl.BlockSpec((1, 1), lambda b: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((4, d), jnp.float32),
                   jax.ShapeDtypeStruct((16, d), jnp.float32),
                   jax.ShapeDtypeStruct((10, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((16, d), jnp.float32)],
        interpret=_FORCE_INTERPRET,
    )(xp, mp, jnp.full((1, 1), eps, jnp.float32))
    y = pl.pallas_call(
        _wbn_transform_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, dd), lambda b: (b, 0)),
                  pl.BlockSpec((4, d), lambda b: (0, 0)),
                  pl.BlockSpec((10, d), lambda b: (0, 0)),
                  pl.BlockSpec((16, d), lambda b: (0, 0)),
                  pl.BlockSpec((4, d), lambda b: (0, 0))],
        out_specs=pl.BlockSpec((rows, dd), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], dd), jnp.float32),
        interpret=_FORCE_INTERPRET,
    )(xp, mean_s, l_s, gamma.reshape(16, d), beta)
    return y[:n], mean_s, cov_s.reshape(4, 4, d), l_s, cnt


def _call_bwd_pallas(x, g, mask_f, gamma, mean_s, l_s, cnt):
    n, dd = x.shape
    d = dd // 4
    rows = min(WBN_BLOCK_ROWS, max(8, n))
    xp = _pad_rows(x, rows)
    gp = _pad_rows(g, rows)  # zero-padded: sums run over real rows only
    mp = _pad_rows(mask_f, rows)
    nb = xp.shape[0] // rows
    gam16 = gamma.reshape(16, d)
    dgamma, dbeta, lbar_s, sw = pl.pallas_call(
        _wbn_bwd_sums_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, dd), lambda b: (b, 0)),
                  pl.BlockSpec((rows, dd), lambda b: (b, 0)),
                  pl.BlockSpec((rows, 1), lambda b: (b, 0)),
                  pl.BlockSpec((16, d), lambda b: (0, 0)),
                  pl.BlockSpec((4, d), lambda b: (0, 0)),
                  pl.BlockSpec((10, d), lambda b: (0, 0))],
        out_specs=[pl.BlockSpec((16, d), lambda b: (0, 0)),
                   pl.BlockSpec((4, d), lambda b: (0, 0)),
                   pl.BlockSpec((10, d), lambda b: (0, 0)),
                   pl.BlockSpec((4, d), lambda b: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((16, d), jnp.float32),
                   jax.ShapeDtypeStruct((4, d), jnp.float32),
                   jax.ShapeDtypeStruct((10, d), jnp.float32),
                   jax.ShapeDtypeStruct((4, d), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((40, d), jnp.float32)],
        interpret=_FORCE_INTERPRET,
    )(xp, gp, mp, gam16, mean_s, l_s)
    l = {jk: l_s[i:i + 1, :] for i, jk in enumerate(_L_IDX)}
    lbar = {jk: lbar_s[i:i + 1, :] for i, jk in enumerate(_L_IDX)}
    m_rows = _m_from_lbar(l, lbar)
    mmat = jnp.concatenate([m_rows[a][b] for a in range(4) for b in range(4)],
                           axis=0)  # [16, d], row a*4+b = M_ab
    dx = pl.pallas_call(
        _wbn_dx_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, dd), lambda b: (b, 0)),
                  pl.BlockSpec((rows, dd), lambda b: (b, 0)),
                  pl.BlockSpec((rows, 1), lambda b: (b, 0)),
                  pl.BlockSpec((16, d), lambda b: (0, 0)),
                  pl.BlockSpec((4, d), lambda b: (0, 0)),
                  pl.BlockSpec((10, d), lambda b: (0, 0)),
                  pl.BlockSpec((16, d), lambda b: (0, 0)),
                  pl.BlockSpec((4, d), lambda b: (0, 0)),
                  pl.BlockSpec((1, 1), lambda b: (0, 0))],
        out_specs=pl.BlockSpec((rows, dd), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], dd), jnp.float32),
        interpret=_FORCE_INTERPRET,
    )(xp, gp, mp, gam16, mean_s, l_s, mmat, sw, cnt)
    return dx[:n], dgamma.reshape(4, 4, d), dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_whitening(x, mask_f, gamma, beta, eps):
    """Training-mode quaternion whitening of flat ``x`` [N, 4d]:
    returns (y [N, 4d], mean [4, d], cov [4, 4, d]).

    ``mask_f`` [N, 1] f32 gates the statistics; all rows are whitened.
    ``gamma`` [4, 4, d], ``beta`` [4, d].  mean/cov are DETACHED by contract
    (running-stat updates are state, not gradient paths; the bwd ignores
    their cotangents).  Differentiable in x, gamma, beta.
    """
    if _use_pallas(x):
        y, mean_s, cov_s, _, _ = _call_fwd_pallas(x, mask_f, gamma, beta, eps)
        return y, mean_s, cov_s
    y, mean_s, cov_s, _ = _fused_fwd_parts(x, mask_f, gamma, beta, eps)
    return y, mean_s, cov_s


def _fused_fwd_parts(x, mask_f, gamma, beta, eps):
    d = x.shape[1] // 4
    cnt, c, mean, cov = _stats(x, mask_f, d)
    l = _chol_fields(cov, eps)
    y, _, _ = _transform(c, mean, l, gamma, beta)
    mean_s = jnp.stack(mean, axis=0)  # [4, d]
    cov_s = jnp.stack(
        [jnp.stack([cov[(min(j, k), max(j, k))] for k in range(4)], axis=0)
         for j in range(4)], axis=0)  # [4, 4, d]
    return y, mean_s, cov_s, (cnt, l)


def _fused_whitening_fwd(x, mask_f, gamma, beta, eps):
    if _use_pallas(x):
        y, mean_s, cov_s, l_s, cnt = _call_fwd_pallas(x, mask_f, gamma, beta,
                                                      eps)
        return (y, mean_s, cov_s), (x, mask_f, gamma, mean_s, l_s, cnt)
    y, mean_s, cov_s, (cnt, l) = _fused_fwd_parts(x, mask_f, gamma, beta, eps)
    l_s = jnp.stack([l[(0, 0)], l[(1, 0)], l[(1, 1)], l[(2, 0)], l[(2, 1)],
                     l[(2, 2)], l[(3, 0)], l[(3, 1)], l[(3, 2)], l[(3, 3)]],
                    axis=0)  # [10, d]
    return (y, mean_s, cov_s), (x, mask_f, gamma, mean_s, l_s, cnt)


_L_IDX = [(0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (2, 2),
          (3, 0), (3, 1), (3, 2), (3, 3)]


def _unstack_l(l_s):
    return {jk: l_s[i] for i, jk in enumerate(_L_IDX)}


def _fused_whitening_bwd(eps, res, cts):
    x, mask_f, gamma, mean_s, l_s, cnt = res
    g, _, _ = cts  # mean/cov outputs are detached (see fused_whitening)
    if _use_pallas(x):
        dx, dgamma, dbeta = _call_bwd_pallas(x, g, mask_f, gamma, mean_s,
                                             l_s, cnt)
        return (dx, None, dgamma, dbeta)
    d = x.shape[1] // 4
    l = _unstack_l(l_s)
    mean = [mean_s[k] for k in range(4)]
    c = _slices(x, d)
    gs = _slices(g, d)
    # recompute u, z (cheaper than saving 2 x [N, 4d] residuals)
    cu = [ck - mu[None] for ck, mu in zip(c, mean)]
    zs = _fwd_subst(l, cu)
    # param grads
    dbeta = jnp.stack([jnp.sum(gc, axis=0) for gc in gs], axis=0)  # [4, d]
    dgamma = jnp.stack(
        [jnp.stack([jnp.sum(gs[cc] * zs[k], axis=0) for k in range(4)],
                   axis=0) for cc in range(4)], axis=0)  # [4, 4, d]
    # solve path: h = Gamma^T g per row, w = L^{-T} h
    hs = [sum(gamma[cc, k][None] * gs[cc] for cc in range(4))
          for k in range(4)]
    ws = _bwd_subst(l, hs)
    # Cholesky cotangent: Lbar = -tril(sum_n w z^T), then the T/S/M
    # sandwich (shared helper _m_from_lbar; m_rows[a][b] = M_ab, symmetric)
    lbar = {}
    for j in range(4):
        for k in range(j + 1):
            lbar[(j, k)] = -jnp.sum(ws[j] * zs[k], axis=0)  # [d]
    m_rows = _m_from_lbar(l, lbar)
    inv_cnt = 1.0 / cnt
    # sum_j w_j  (mean-path correction; sum_n m_n u_n = 0 kills the M term)
    sw = [jnp.sum(wk, axis=0) for wk in ws]
    dx = []
    for a in range(4):
        mu_a = sum(m_rows[a][b][None] * cu[b] for b in range(4))
        dx.append(ws[a] + mask_f * inv_cnt * (mu_a - sw[a][None]))
    return (jnp.concatenate(dx, axis=1), None, dgamma, dbeta)


fused_whitening.defvjp(_fused_whitening_fwd, _fused_whitening_bwd)
