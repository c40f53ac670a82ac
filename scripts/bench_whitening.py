"""Op-level A/B of the quaternion whitening BN ('q-batch-norm') at flagship
shapes: the shipped formulation vs a component-slice reformulation.

The shipped path (nn/norm.py round 4) builds [d,4,4] covariance via
einsum("ncd,nkd->dck"), transposes the data to [N,d,4] and runs the 4x4
triangular solve with the quaternion axis in the LANE dimension (4/128 lane
utilization), then transposes back and einsums the Gamma mix.  The slice form
keeps every per-row op on [N,d] slices (d in lanes), expresses the covariance
as 10 fused elementwise-product reductions, the Cholesky/solve as scalar-field
arithmetic on [d] vectors, and the Gamma mix as 16 [N,d] FMAs — no transposes,
no 4-wide lane ops.  Reference semantics: phc/quaternion/norm.py:104-276.

Slope-method timing (see bench.py docstring).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from phc_gnn_tpu.nn.norm import _cholesky4x4, _solve_lower4x4


def slope(make_f, n1=5, n2=55, reps=3):
    f1, f2 = make_f(n1), make_f(n2)
    float(f1()); float(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _t(f):
    t0 = time.perf_counter(); float(f()); return time.perf_counter() - t0


EPS = 1e-5


def whiten_current(x, mask, gamma, beta):
    """The shipped formulation (nn/norm.py QuaternionWhiteningNorm, training)."""
    m = mask.reshape(-1, 1, 1).astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    mean = jnp.sum(x * m, axis=0) / cnt
    centered_m = (x - mean[None]) * m
    cov = jnp.einsum("ncd,nkd->dck", centered_m, centered_m) / cnt
    centered = x - mean[None]
    cov = cov + EPS * jnp.eye(4)[None]
    l = _cholesky4x4(cov)
    b = jnp.transpose(centered, (0, 2, 1))
    z = _solve_lower4x4(l[None], b)
    z = jnp.transpose(z, (0, 2, 1))
    z = jnp.einsum("ckd,nkd->ncd", gamma, z) + beta[None]
    return z


def whiten_slices(x, mask, gamma, beta):
    """Component-slice formulation: all [N,d] ops, d stays in lanes."""
    mcol = mask[:, None].astype(x.dtype)                       # [N,1]
    cnt = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    c = [x[:, k, :] for k in range(4)]                          # 4 x [N,d]
    mean = [jnp.sum(ck * mcol, axis=0) / cnt for ck in c]       # 4 x [d]
    cm = [(ck - mu[None]) * mcol for ck, mu in zip(c, mean)]    # masked centered
    # upper-triangular covariance entries, each [d]
    cov = {}
    for j in range(4):
        for k in range(j, 4):
            cov[(j, k)] = jnp.sum(cm[j] * cm[k], axis=0) / cnt
    # closed-form Cholesky on [d] scalar fields (same recurrence as
    # _cholesky4x4, unstacked)
    c00 = cov[(0, 0)] + EPS
    c11 = cov[(1, 1)] + EPS
    c22 = cov[(2, 2)] + EPS
    c33 = cov[(3, 3)] + EPS
    l_rr = jnp.sqrt(c00)
    l_ri = cov[(0, 1)] / l_rr
    l_ii = jnp.sqrt(c11 - l_ri * l_ri)
    l_rj = cov[(0, 2)] / l_rr
    l_ij = (cov[(1, 2)] - l_ri * l_rj) / l_ii
    l_jj = jnp.sqrt(c22 - (l_ij * l_ij + l_rj * l_rj))
    l_rk = cov[(0, 3)] / l_rr
    l_ik = (cov[(1, 3)] - l_ri * l_rk) / l_ii
    l_jk = (cov[(2, 3)] - (l_ij * l_ik + l_rj * l_rk)) / l_jj
    l_kk = jnp.sqrt(c33 - (l_jk * l_jk + l_ik * l_ik + l_rk * l_rk))
    # un-masked centered values for the transform itself
    cu = [ck - mu[None] for ck, mu in zip(c, mean)]
    # forward substitution, [N,d] rows against [d] coefficients
    z0 = cu[0] / l_rr[None]
    z1 = (cu[1] - l_ri[None] * z0) / l_ii[None]
    z2 = (cu[2] - l_rj[None] * z0 - l_ij[None] * z1) / l_jj[None]
    z3 = (cu[3] - l_rk[None] * z0 - l_ik[None] * z1 - l_jk[None] * z2) / l_kk[None]
    zs = [z0, z1, z2, z3]
    # Gamma mix: out_c = sum_k gamma[c,k] * z_k + beta[c]
    out = [sum(gamma[cc, k][None] * zs[k] for k in range(4)) + beta[cc][None]
           for cc in range(4)]
    return jnp.stack(out, axis=1)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    rng = np.random.default_rng(0)
    N, d = 4096, 50
    x = jnp.asarray(rng.normal(size=(N, 4, d)), jnp.float32)
    mask = jnp.asarray(rng.random(N) > 0.15)
    gamma = jnp.asarray(rng.normal(size=(4, 4, d)) * 0.1 + 0.5 * np.eye(4)[..., None],
                        jnp.float32)
    beta = jnp.asarray(rng.normal(size=(4, d)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(N, 4, d)), jnp.float32)

    # f64 oracle: the shipped einsum covariance lowers to a TPU dot in DEFAULT
    # precision (bf16-truncated operands, ~3e-4 abs cov error); the slice form
    # is pure-f32 elementwise and should sit at f32 rounding (~1e-6).
    x64 = np.asarray(x, np.float64)
    m64 = np.asarray(mask, np.float64)[:, None, None]
    cnt = m64.sum()
    mean = (x64 * m64).sum(0) / cnt
    cm = (x64 - mean[None]) * m64
    cov = np.einsum("ncd,nkd->dck", cm, cm) / cnt + EPS * np.eye(4)[None]
    l = np.linalg.cholesky(cov)
    cu = np.transpose(x64 - mean[None], (0, 2, 1))
    z = np.linalg.solve(l[None], cu[..., None])[..., 0]
    z = np.transpose(z, (0, 2, 1))
    y64 = np.einsum("ckd,nkd->ncd", np.asarray(gamma, np.float64), z) \
        + np.asarray(beta, np.float64)[None]
    scale = np.max(np.abs(y64))
    ya = whiten_current(x, mask, gamma, beta)
    yb = whiten_slices(x, mask, gamma, beta)
    err_a = float(np.max(np.abs(np.asarray(ya, np.float64) - y64)) / scale)
    err_b = float(np.max(np.abs(np.asarray(yb, np.float64) - y64)) / scale)
    print(json.dumps({"rel_err_vs_f64": {"current": err_a, "slices": err_b}}),
          flush=True)
    assert err_b < 5e-6, err_b
    assert err_b <= err_a, (err_b, err_a)

    for name, fn in (("current", whiten_current), ("slices", whiten_slices)):
        def make_fwd(n, fn=fn):
            @jax.jit
            def f(x0):
                def body(c, _):
                    y = fn(c, mask, gamma, beta)
                    return c + 1e-3 * y, jnp.sum(y)
                _, s = jax.lax.scan(body, x0, None, length=n)
                return jnp.sum(s)
            return lambda: f(x)

        def make_fb(n, fn=fn):
            @jax.jit
            def f(x0):
                def body(c, _):
                    g = jax.grad(lambda a: jnp.sum(
                        fn(a, mask, gamma, beta) * w))(c)
                    return c + 1e-3 * g, jnp.sum(g)
                _, s = jax.lax.scan(body, x0, None, length=n)
                return jnp.sum(s)
            return lambda: f(x)

        fwd = slope(make_fwd, n1=20, n2=220, reps=5)
        fb = slope(make_fb, n1=20, n2=220, reps=5)
        print(json.dumps({"form": name, "fwd_us": round(fwd * 1e6, 1),
                          "fwd_bwd_us": round(fb * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
