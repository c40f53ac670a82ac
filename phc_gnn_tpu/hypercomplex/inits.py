"""Weight initializers for PHM / quaternion layers, JAX-native and reproducible.

The chi-distributed magnitude (df = n) is drawn as the norm of ``n`` i.i.d. standard
normals — identical in distribution to the reference's ``scipy.stats.chi.rvs``
(phc/hypercomplex/inits.py:16-44, phc/quaternion/inits.py:40-76) but pure-JAX so
``init(rng)`` is a deterministic function of the PRNG key.  The quaternion
orthogonal init runs a host-side float64 structure-preserving Householder QR
(phc/quaternion/inits.py:79-112 -> qr.py) at init time only.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "unitary_init",
    "phm_init",
    "glorot_uniform",
    "glorot_normal",
    "quaternion_init",
    "orthogonal_init",
]


def unitary_init(key: jax.Array, n: int, in_features: int, out_features: int,
                 low: float = 0.0, high: float = 1.0, dtype=jnp.float32) -> jax.Array:
    """Unit-norm purely "imaginary" direction field of shape (n, in, out):
    component 0 is zero, the rest are U(low, high), normalized over the component
    axis (reference: phc/hypercomplex/inits.py:6-13)."""
    v = jax.random.uniform(key, (n - 1, in_features, out_features), dtype, low, high)
    v = jnp.concatenate([jnp.zeros((1, in_features, out_features), dtype), v], axis=0)
    return v / jnp.linalg.norm(v, axis=0, keepdims=True)


def phm_init(key: jax.Array, n: int, in_features: int, out_features: int,
             criterion: str = "glorot", dtype=jnp.float32) -> jax.Array:
    """PHM weight init: chi(df=n) magnitude x unit imaginary direction x random
    phase; returns (n, in, out) (reference: phc/hypercomplex/inits.py:16-44 with
    transpose=False, as used by PHMLinear at layers.py:263-266)."""
    if criterion == "glorot":
        s = math.sqrt(2.0 / (n * (in_features + out_features)))
    elif criterion == "he":
        s = math.sqrt(2.0 / (n * in_features))
    else:
        raise ValueError(f"invalid criterion: {criterion!r}")
    k_mag, k_v, k_theta = jax.random.split(key, 3)
    shape = (in_features, out_features)
    # chi(df=n, scale=s) == s * ||N(0, I_n)||
    magnitude = s * jnp.linalg.norm(jax.random.normal(k_mag, (n,) + shape, dtype), axis=0)
    v = unitary_init(k_v, n, in_features, out_features, dtype=dtype)
    theta = jax.random.uniform(k_theta, shape, dtype, -math.pi, math.pi)
    w0 = magnitude * jnp.cos(theta)
    rest = magnitude[None] * v[1:] * jnp.sin(theta)[None]
    return jnp.concatenate([w0[None], rest], axis=0)


def glorot_uniform(key: jax.Array, shape, gain: float = math.sqrt(2.0), dtype=jnp.float32) -> jax.Array:
    """Xavier-uniform with gain sqrt(2) over the last two axes
    (reference: phc/quaternion/inits.py:16-17)."""
    fan_in, fan_out = shape[-2], shape[-1]
    limit = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def glorot_normal(key: jax.Array, shape, gain: float = math.sqrt(2.0), dtype=jnp.float32) -> jax.Array:
    """Xavier-normal with gain sqrt(2) (reference: phc/quaternion/inits.py:12-13)."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def quaternion_init(key: jax.Array, in_features: int, out_features: int,
                    criterion: str = "glorot", dtype=jnp.float32) -> jax.Array:
    """Fixed n=4 quaternion init with the reference's extra per-imaginary phase
    weighting; returns (4, in, out) (reference: phc/quaternion/inits.py:40-76,
    transpose=False orientation)."""
    if criterion == "glorot":
        s = 1.0 / math.sqrt(2.0 * (in_features + out_features))
    elif criterion == "he":
        s = 1.0 / math.sqrt(2.0 * in_features)
    else:
        raise ValueError(f"invalid criterion: {criterion!r}")
    k_mag, k_v, k_theta, k_phi = jax.random.split(key, 4)
    shape = (in_features, out_features)
    magnitude = s * jnp.linalg.norm(jax.random.normal(k_mag, (4,) + shape, dtype), axis=0)
    v = unitary_init(k_v, 4, in_features, out_features, dtype=dtype)  # v[0] == 0
    theta = jax.random.uniform(k_theta, shape, dtype, -math.pi, math.pi)
    phi = jnp.cos(jax.random.uniform(k_phi, (3,) + shape, dtype, -s, s)) ** 2
    phi = phi / jnp.sum(phi, axis=0, keepdims=True)
    w_r = magnitude * jnp.cos(theta)
    w_imag = magnitude[None] * v[1:] * jnp.sin(theta)[None] * phi
    return jnp.concatenate([w_r[None], w_imag], axis=0)


def orthogonal_init(key: jax.Array, in_features: int, out_features: int,
                    scale: float = 1.0, dtype=jnp.float32) -> jax.Array:
    """Quaternion orthogonal init via structure-preserving Householder QR, run
    host-side in float64; returns (4, out, in) component weights whose real 4x4
    block representation is orthogonal up to the reference's 1/2 scaling
    (reference: phc/quaternion/inits.py:79-112)."""
    from phc_gnn_tpu.hypercomplex.qr import quat_qr

    seed = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    rng = np.random.default_rng(seed)
    w = rng.normal(scale=scale, size=(4, out_features, in_features)).astype(np.float64)
    m, n_cols = w.shape[1], w.shape[2]
    flipped = m < n_cols
    if flipped:
        w = np.transpose(w, (0, 2, 1))
    q, _ = quat_qr(w[0], w[1], w[2], w[3])
    q = q / 2.0
    q = q[:, :in_features]
    rows = q.shape[0] // 4
    parts = [q[c * rows:(c + 1) * rows] for c in range(4)]
    if flipped:
        parts = [p[:out_features, :] for p in parts]
    return jnp.asarray(np.stack(parts), dtype=dtype)
