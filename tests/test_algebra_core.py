"""L1 algebra-core tests.

Mirrors the reference's oracle pattern — equivalence between independent
implementations of the same math (reference: phc/hypercomplex/tests/
test_kronecker_product.py, test_realrepr_sumkronecker.py;
phc/quaternion/tests/test_qtensor_mul.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phc_gnn_tpu.hypercomplex import (
    batched_kron,
    complex_matrix_representation,
    get_multiplication_rule,
    hamilton_product,
    kron,
    orthogonal_init,
    phm_init,
    phm_matmul,
    phm_weight_matrix,
    quaternion_init,
    quaternion_rule,
    real_matrix_representation,
    standard_rule,
    unitary_init,
    quaternion_matmul,
)
from phc_gnn_tpu.hypercomplex.qr import quat_qr, real_p


def test_kron_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 5)).astype(np.float32)
    b = rng.normal(size=(4, 2)).astype(np.float32)
    np.testing.assert_allclose(kron(jnp.asarray(a), jnp.asarray(b)), np.kron(a, b), rtol=1e-6)


def test_batched_kron_matches_loop():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 4, 4)).astype(np.float32)
    b = rng.normal(size=(4, 3, 7)).astype(np.float32)
    got = batched_kron(jnp.asarray(a), jnp.asarray(b))
    want = np.stack([np.kron(a[i], b[i]) for i in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_standard_rule_shapes_and_first_identity():
    for n in [1, 2, 3, 4, 5, 8]:
        rule = standard_rule(n)
        assert rule.shape == (n, n, n)
        np.testing.assert_allclose(rule[0], np.eye(n))
        # every rule matrix is a signed permutation (orthogonal)
        for a in rule:
            np.testing.assert_allclose(a @ a.T, np.eye(n), atol=1e-6)


def test_random_rule_reproducible():
    r1 = get_multiplication_rule(3, "random", rng=42)
    r2 = get_multiplication_rule(3, "random", rng=42)
    np.testing.assert_array_equal(r1, r2)
    assert np.all(np.abs(r1) <= 1.0)


def test_realrepr_equals_sum_kronecker():
    """THE bridge identity: quaternion real 4x4-block representation equals
    sum_i A_i (x) W_i under the standard n=4 rule (reference:
    phc/hypercomplex/tests/test_realrepr_sumkronecker.py:13-34)."""
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32))
    rule = jnp.asarray(quaternion_rule())
    h = sum(kron(rule[i], w[i]) for i in range(4))
    np.testing.assert_allclose(h, real_matrix_representation(w), rtol=1e-5, atol=1e-5)
    # and the batched-kron path agrees
    np.testing.assert_allclose(batched_kron(rule, w).sum(0), h, rtol=1e-5, atol=1e-5)


def test_phm_matmul_equals_quaternion_matmul():
    """PHM(n=4, standard rule) linear transform == Hamilton-product matmul.

    The reference's ``y = x @ H`` layout (phc/hypercomplex/layers.py:215)
    realises left Hamilton multiplication by the *conjugate* weight:
    y = conj(W) * x, with W components transposed to (out, in).
    """
    rng = np.random.default_rng(3)
    fi, fo, batch = 5, 7, 11
    w = jnp.asarray(rng.normal(size=(4, fi, fo)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(batch, 4, fi)).astype(np.float32))
    rule = jnp.asarray(quaternion_rule())
    y_flat = phm_matmul(x.reshape(batch, 4 * fi), rule, w)
    # conj(W) with components transposed to (fo, fi)
    signs = jnp.asarray([1.0, -1.0, -1.0, -1.0]).reshape(4, 1, 1)
    wq = signs * jnp.stack([w[i].T for i in range(4)])
    y_q = quaternion_matmul(wq, x)
    np.testing.assert_allclose(
        y_flat.reshape(batch, 4, fo), y_q, rtol=1e-4, atol=1e-4
    )


def test_hamilton_product_identities():
    """i*j = k, j*i = -k, i^2 = -1; non-commutativity
    (reference: phc/quaternion/tests/test_qtensor_mul.py:28-60)."""
    def q(r, i, j, k):
        return jnp.asarray([r, i, j, k], dtype=jnp.float32).reshape(4, 1)

    one, i_, j_, k_ = q(1, 0, 0, 0), q(0, 1, 0, 0), q(0, 0, 1, 0), q(0, 0, 0, 1)
    np.testing.assert_allclose(hamilton_product(i_, j_), k_)
    np.testing.assert_allclose(hamilton_product(j_, i_), -k_)
    np.testing.assert_allclose(hamilton_product(i_, i_), -one)
    np.testing.assert_allclose(hamilton_product(j_, j_), -one)
    np.testing.assert_allclose(hamilton_product(k_, k_), -one)
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    assert not np.allclose(hamilton_product(a, b), hamilton_product(b, a))


def test_hamilton_product_vs_phm_rule_contraction():
    """Rule-tensor contraction sum_{i,j} A[i][j,m] w[i] x[j] equals the Hamilton
    product conj(w) * x (the algebra the PHM x@H layout realises)."""
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))
    rule = jnp.asarray(quaternion_rule())
    want = jnp.einsum("ijm,id,jd->md", rule, w, x)
    signs = jnp.asarray([1.0, -1.0, -1.0, -1.0]).reshape(4, 1)
    got = hamilton_product(
        (signs * w).T.reshape(9, 4, 1), x.T.reshape(9, 4, 1)
    )[..., 0].T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_complex_matrix_representation():
    rng = np.random.default_rng(6)
    w = rng.normal(size=(4, 3, 3))
    c = complex_matrix_representation(w)
    assert c.shape == (6, 6)
    np.testing.assert_allclose(c[:3, :3], w[0] + 1j * w[1])
    np.testing.assert_allclose(c[3:, 3:], w[0] - 1j * w[1])


def test_phm_weight_matrix_block_layout():
    """H acts on flat component-block vectors: block m of y mixes block j of x
    through sum_i A[i][j, m] W[i]."""
    rng = np.random.default_rng(7)
    n, fi, fo = 3, 4, 5
    rule = jnp.asarray(standard_rule(n))
    w = jnp.asarray(rng.normal(size=(n, fi, fo)).astype(np.float32))
    h = phm_weight_matrix(rule, w)
    assert h.shape == (n * fi, n * fo)
    want = sum(np.kron(np.asarray(rule[i]), np.asarray(w[i])) for i in range(n))
    np.testing.assert_allclose(h, want, rtol=1e-5, atol=1e-5)


def test_unitary_init_norm_one():
    v = unitary_init(jax.random.key(0), 4, 8, 8)
    np.testing.assert_allclose(jnp.linalg.norm(v, axis=0), np.ones((8, 8)), rtol=1e-5)
    np.testing.assert_allclose(v[0], np.zeros((8, 8)))


@pytest.mark.parametrize("n", [2, 4, 5])
def test_phm_init_statistics(n):
    w = phm_init(jax.random.key(1), n, 64, 64)
    assert w.shape == (n, 64, 64)
    # E[|w|^2] summed over components = chi^2 scale: mean magnitude^2 = n * s^2
    s2 = 2.0 / (n * 128)
    total_var = float(jnp.mean(jnp.sum(w ** 2, axis=0)))
    # E[mag^2 cos^2 + mag^2 sin^2 * sum v^2] = E[mag^2] = n s^2
    assert abs(total_var - n * s2) / (n * s2) < 0.15


def test_phm_init_deterministic_in_key():
    w1 = phm_init(jax.random.key(3), 4, 16, 16)
    w2 = phm_init(jax.random.key(3), 4, 16, 16)
    w3 = phm_init(jax.random.key(4), 4, 16, 16)
    np.testing.assert_array_equal(w1, w2)
    assert not np.allclose(w1, w3)


def test_quaternion_init_shape():
    w = quaternion_init(jax.random.key(5), 12, 8)
    assert w.shape == (4, 12, 8)


def test_quat_qr_orthogonal():
    """Q (scaled by 1/2 as in the reference init) has orthogonal real
    representation (reference: phc/quaternion/tests/test_quat_qr.py:9-25)."""
    rng = np.random.default_rng(8)
    m = 6
    a = rng.normal(size=(4, m, m))
    q, r = quat_qr(a[0], a[1], a[2], a[3])
    qs = [q[c * m:(c + 1) * m] for c in range(4)]
    rq = real_p(qs[0] / 2.0, qs[1] / 2.0, qs[2] / 2.0, qs[3] / 2.0)
    np.testing.assert_allclose(rq @ rq.T, np.eye(4 * m), atol=1e-8)
    # R upper triangular in its first block
    r1 = r[:m]
    np.testing.assert_allclose(np.tril(r1, -1), np.zeros_like(r1), atol=1e-8)


def test_orthogonal_init_real_repr_orthogonal():
    w = orthogonal_init(jax.random.key(7), 6, 6)
    rw = real_matrix_representation(jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(rw @ rw.T), np.eye(24), atol=1e-4
    )


def test_quaternion_convenience_ops():
    """conj/|q|/inverse/normalize identities (reference: phc/quaternion/
    tests/test_qtensor_mul.py style)."""
    from phc_gnn_tpu.hypercomplex import (
        conjugate, inverse, normalize, qnorm, quaternion_dot)

    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    # q * q^{-1} = 1 (per feature)
    prod = hamilton_product(q.T.reshape(7, 4, 1), inverse(q.T.reshape(7, 4, 1)))
    np.testing.assert_allclose(prod[:, 0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(prod[:, 1:, 0], 0.0, atol=1e-5)
    # |normalize(q)| = 1
    np.testing.assert_allclose(qnorm(normalize(q)), 1.0, atol=1e-4)
    # conj flips sign of dot's imaginary part: q . conj(q) = |q|^2 on real
    np.testing.assert_allclose(quaternion_dot(q, q), qnorm(q) ** 2, rtol=1e-5)


def test_layout_bijection():
    from phc_gnn_tpu.hypercomplex import to_flat, to_stacked

    x = jnp.arange(24.0).reshape(2, 12)
    s = to_stacked(x, 4)
    assert s.shape == (2, 4, 3)
    np.testing.assert_array_equal(s[0, 1], [3, 4, 5])
    np.testing.assert_array_equal(to_flat(s), x)


def test_quat_qr_givens_real_diagonal():
    """Givens-rotated R has a real non-negative diagonal (imaginary diagonal
    components vanish) while Q stays orthogonal."""
    from phc_gnn_tpu.hypercomplex.qr import quat_qr_givens

    rng = np.random.default_rng(13)
    m = 5
    a = rng.normal(size=(4, m, m))
    q, r = quat_qr_givens(a[0], a[1], a[2], a[3])
    for j in range(m):
        # imaginary parts of R[j, j] are (numerically) zero
        for c in (1, 2, 3):
            assert abs(r[c * m + j, j]) < 1e-8, (c, j)
    qs = [q[c * m:(c + 1) * m] for c in range(4)]
    rq = real_p(qs[0] / 2.0, qs[1] / 2.0, qs[2] / 2.0, qs[3] / 2.0)
    np.testing.assert_allclose(rq @ rq.T, np.eye(4 * m), atol=1e-8)
