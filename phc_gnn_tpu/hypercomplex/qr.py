"""Structure-preserving quaternion Householder QR (host-side, float64).

Implements the real structure-preserving algorithm of Li et al. 2016 for
quaternion matrices, operating on the stacked real representation.  Used only at
init time for the quaternion orthogonal initializer, so it is plain numpy — it
never enters a compiled graph (reference: phc/quaternion/qr.py:10-109).
"""

from __future__ import annotations

import numpy as np

__all__ = ["real_p", "quat_householder", "quat_qr"]


def real_p(a1: np.ndarray, a2: np.ndarray, a3: np.ndarray, a4: np.ndarray) -> np.ndarray:
    """4m x 4n real representation of A = A1 + A2 i + A3 j + A4 k
    (reference: phc/quaternion/qr.py:10-25)."""
    if a1.ndim == 1:
        a1, a2, a3, a4 = (x.reshape(-1, 1) for x in (a1, a2, a3, a4))
    row1 = np.concatenate([a1, -a2, -a3, -a4], axis=1)
    row2 = np.concatenate([a2, a1, -a4, a3], axis=1)
    row3 = np.concatenate([a3, a4, a1, -a2], axis=1)
    row4 = np.concatenate([a4, -a3, a2, a1], axis=1)
    return np.concatenate([row1, row2, row3, row4], axis=0)


def quat_householder(x1, x2, x3, x4, n: int):
    """Householder reflector for a quaternion column, returned as its real
    representation plus the beta scale (reference: phc/quaternion/qr.py:28-50)."""
    x1, x2, x3, x4 = (x.reshape(-1, 1) for x in (x1, x2, x3, x4))
    u1 = np.concatenate([x1, x2, x3, x4], axis=1)[:n]
    aa = float(np.linalg.norm(np.concatenate([x1, x2, x3, x4]).ravel()))
    head = np.concatenate([x1[0], x2[0], x3[0], x4[0]])
    xx = float(np.linalg.norm(head))
    if xx == 0.0:
        alpha1 = aa * np.array([1.0, 0.0, 0.0, 0.0])
    else:
        alpha1 = -(aa / xx) * head
    u1[0, :] = u1[0, :] - alpha1
    beta1 = 1.0 / (aa * (aa + xx))
    u = real_p(u1[:, 0:1], u1[:, 1:2], u1[:, 2:3], u1[:, 3:4])
    return u, beta1


def quat_qr(a1: np.ndarray, a2: np.ndarray, a3: np.ndarray, a4: np.ndarray):
    """QR of the quaternion matrix A (components a1..a4, each m x n).

    Returns (Q, R) in stacked-component form: Q is (4m, m) with the four
    component blocks stacked row-wise, R likewise (4m, n)
    (reference: phc/quaternion/qr.py:65-109, givens=False path).
    """
    a1 = np.asarray(a1, dtype=np.float64)
    b = np.concatenate([a1, np.asarray(a2, np.float64),
                        np.asarray(a3, np.float64), np.asarray(a4, np.float64)], axis=0)
    m, n = a1.shape
    q = np.concatenate([np.eye(m)] * 4, axis=0)
    for j in range(n):
        cols = [b[c * m + j: (c + 1) * m, j] for c in range(4)]
        u, beta1 = quat_householder(cols[0], cols[1], cols[2], cols[3], n=m - j)
        # active rows: tail of each component block
        idx = np.concatenate([np.arange(j + c * m, (c + 1) * m) for c in range(4)])
        b[idx, :] = b[idx, :] - (beta1 * u) @ (u.T @ b[idx, :])
        q[idx, :] = q[idx, :] - (beta1 * u) @ (u.T @ q[idx, :])
    return q, b


def grs_givens(g1: float, g2: float, g3: float, g4: float) -> np.ndarray:
    """Real representation of the unit quaternion rotating (g1..g4) onto the
    real axis — the Givens step of the structure-preserving QR
    (reference: phc/quaternion/qr.py:53-62)."""
    if g2 == g3 == g4 == 0.0:
        return np.eye(4)
    g = real_p(np.asarray([[g1]]), np.asarray([[g2]]),
               np.asarray([[g3]]), np.asarray([[g4]]))
    return g / np.sqrt(g1 * g1 + g2 * g2 + g3 * g3 + g4 * g4)


def quat_qr_givens(a1, a2, a3, a4):
    """QR with the optional Givens post-rotation making R's diagonal real
    (reference: phc/quaternion/qr.py givens=True path)."""
    q, r = quat_qr(a1, a2, a3, a4)
    m = np.asarray(a1).shape[0]
    n = np.asarray(a1).shape[1]
    for j in range(n):
        g = grs_givens(r[0 * m + j, j], r[1 * m + j, j],
                       r[2 * m + j, j], r[3 * m + j, j])
        rows = [j, j + m, j + 2 * m, j + 3 * m]
        r[rows, :] = g.T @ r[rows, :]
        q[rows, :] = g.T @ q[rows, :]
    return q, r
