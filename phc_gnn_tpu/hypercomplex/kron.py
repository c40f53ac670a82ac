"""Kronecker products and the PHM matrix product, in XLA-friendly contraction form.

The hot path ``y = x @ H + b`` with ``H = sum_i A[i] (x) W[i]`` is expressed as a
single einsum over the *stacked* layout so XLA can pick the contraction order and
keep everything on the MXU — H is materialized once per call as a small
``(in, out)`` matrix (cost ``n * in * out`` MACs, negligible against the
``B * in * out`` GEMM; see reference phc/hypercomplex/kronecker.py:35-48 and
layers.py:198-219 for the semantics being reproduced).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kron", "batched_kron", "phm_weight_matrix", "phm_matmul"]


def kron(a: jax.Array, b: jax.Array) -> jax.Array:
    """Kronecker product of two 2-D matrices
    (reference: phc/hypercomplex/kronecker.py:4-32)."""
    assert a.ndim == b.ndim == 2
    return jnp.einsum("ab,cd->acbd", a, b).reshape(
        a.shape[0] * b.shape[0], a.shape[1] * b.shape[1]
    )


def batched_kron(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched Kronecker product: a (g, m, n), b (g, p, q) -> (g, m*p, n*q)
    (reference: phc/hypercomplex/kronecker.py:35-48)."""
    assert a.ndim == b.ndim == 3
    g, m, n = a.shape
    _, p, q = b.shape
    return jnp.einsum("gmn,gpq->gmpnq", a, b).reshape(g, m * p, n * q)


def phm_weight_matrix(rule: jax.Array, w: jax.Array) -> jax.Array:
    """Materialize ``H = sum_i rule[i] (x) w[i]``.

    rule: (n, n, n); w: (n, in/n, out/n) -> H: (in, out), laid out so that H acts on
    flat component-block vectors ``[N, n * in/n]`` (reference layout,
    phc/hypercomplex/layers.py:214).
    """
    n = rule.shape[0]
    _, fi, fo = w.shape
    return jnp.einsum("ijm,ifo->jfmo", rule, w).reshape(n * fi, n * fo)


def phm_matmul(
    x: jax.Array,
    rule: jax.Array,
    w: jax.Array,
    bias: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    """PHM linear transform ``y = x @ (sum_i rule[i] (x) w[i]) + b``.

    x: (..., n * in/n) flat component-block layout; returns (..., n * out/n).
    Equivalent to the reference's matvec_product_new
    (phc/hypercomplex/layers.py:198-219) but left for XLA to fuse: the small H
    build feeds a single MXU GEMM.
    """
    h = phm_weight_matrix(rule, w)
    y = jnp.matmul(x, h, precision=precision)
    if bias is not None:
        y = y + bias
    return y
