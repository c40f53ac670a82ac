"""Quaternion compatibility layer on plain arrays (component axis = array axis).

The reference carries a ``QTensor`` class with full operator overloading
(phc/quaternion/algebra.py:28-431); here a quaternion tensor is simply an array
shaped ``[..., 4, d]`` (stacked) or ``[..., 4*d]`` (flat component-block), which
keeps everything compatible with jax transforms.  These helpers provide the
Hamilton product and the real / complex matrix representations used by the
equivalence tests that bridge PHM(n=4) and quaternion algebra
(reference: phc/quaternion/algebra.py:482-683,
phc/hypercomplex/tests/test_realrepr_sumkronecker.py:13-34).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hamilton_product",
    "real_matrix_representation",
    "complex_matrix_representation",
    "quaternion_matmul",
]


def hamilton_product(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Elementwise Hamilton product of arrays shaped [..., 4, d]
    (reference: phc/quaternion/algebra.py:482-494)."""
    r1, i1, j1, k1 = jnp.moveaxis(q1, -2, 0)
    r2, i2, j2, k2 = jnp.moveaxis(q2, -2, 0)
    r = r1 * r2 - i1 * i2 - j1 * j2 - k1 * k2
    i = i1 * r2 + r1 * i2 - k1 * j2 + j1 * k2
    j = j1 * r2 + k1 * i2 + r1 * j2 - i1 * k2
    k = k1 * r2 - j1 * i2 + i1 * j2 + r1 * k2
    return jnp.stack([r, i, j, k], axis=-2)


def real_matrix_representation(w: jax.Array) -> jax.Array:
    """Real 4m x 4n block representation of the quaternion matrix
    W = W_r + W_i i + W_j j + W_k k, with w shaped (4, m, n)::

        [ W_r  -W_i  -W_j  -W_k ]
        [ W_i   W_r  -W_k   W_j ]
        [ W_j   W_k   W_r  -W_i ]
        [ W_k  -W_j   W_i   W_r ]

    (reference: phc/quaternion/algebra.py:600-624).
    """
    r, i, j, k = w[0], w[1], w[2], w[3]
    row1 = jnp.concatenate([r, -i, -j, -k], axis=-1)
    row2 = jnp.concatenate([i, r, -k, j], axis=-1)
    row3 = jnp.concatenate([j, k, r, -i], axis=-1)
    row4 = jnp.concatenate([k, -j, i, r], axis=-1)
    return jnp.concatenate([row1, row2, row3, row4], axis=-2)


def complex_matrix_representation(w: np.ndarray) -> np.ndarray:
    """Complex 2m x 2n representation [[z, w], [-conj(w), conj(z)]] with
    z = W_r + i W_i, w_c = W_j + i W_k (host-side numpy;
    reference: phc/quaternion/algebra.py:627-659)."""
    w = np.asarray(w)
    z = w[0] + 1j * w[1]
    wc = w[2] + 1j * w[3]
    row1 = np.concatenate([z, wc], axis=-1)
    row2 = np.concatenate([-wc.conjugate(), z.conjugate()], axis=-1)
    return np.concatenate([row1, row2], axis=-2)


def quaternion_matmul(w: jax.Array, q: jax.Array) -> jax.Array:
    """Quaternion matrix product W @ q via the real representation.

    w: (4, m, n) quaternion matrix; q: (..., 4, n) batch of quaternion vectors.
    Returns (..., 4, m) (reference: phc/quaternion/algebra.py:573-589 and
    hamilton_product_Wq :662-672).
    """
    m = w.shape[1]
    rw = real_matrix_representation(w)  # (4m, 4n)
    stacked = jnp.concatenate(jnp.moveaxis(q, -2, 0), axis=-1)  # (..., 4n)
    out = stacked @ rw.T  # (..., 4m)
    return jnp.stack([out[..., c * m:(c + 1) * m] for c in range(4)], axis=-2)


def conjugate(q: jax.Array) -> jax.Array:
    """Quaternion conjugate on [..., 4, d]: negate the imaginary components
    (reference: phc/quaternion/algebra.py conj)."""
    signs = jnp.asarray([1.0, -1.0, -1.0, -1.0]).reshape(
        (1,) * (q.ndim - 2) + (4, 1))
    return q * signs


def qnorm(q: jax.Array) -> jax.Array:
    """Elementwise quaternion modulus |q| over the component axis
    (reference: algebra.py mod/norm)."""
    return jnp.linalg.norm(q, axis=-2)


def inverse(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """q^{-1} = conj(q) / |q|^2 (reference: algebra.py:509-521)."""
    n2 = jnp.sum(q * q, axis=-2, keepdims=True)
    return conjugate(q) / jnp.maximum(n2, eps)


def normalize(q: jax.Array, eps: float = 1e-10) -> jax.Array:
    """q / (|q| + eps) (reference: algebra.py:531-534)."""
    return q / (qnorm(q)[..., None, :] + eps)


def quaternion_dot(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Componentwise dot product over the quaternion axis."""
    return jnp.sum(q1 * q2, axis=-2)
