"""Pallas fused-segment kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phc_gnn_tpu.ops import SegmentPlan, build_segment_plan, segment_sum_sorted


def _case(seed, E, N, D, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # heavy-tailed: most edges hit few nodes
        recv = np.sort(rng.zipf(1.5, size=E) % N).astype(np.int32)
    else:
        recv = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    mask = rng.random(E) > 0.2
    return msgs, recv, mask


@pytest.mark.parametrize("E,N,D,skew", [
    (512, 512, 128, False),
    (1000, 512, 100, False),   # non-multiple D, E
    (2048, 512, 256, True),    # skewed degrees
    (64, 512, 128, False),     # fewer edges than tiles
])
def test_segment_sum_sorted_matches_xla(E, N, D, skew):
    msgs, recv, mask = _case(0, E, N, D, skew)
    plan = build_segment_plan(recv, N, tile_nodes=128, block_edges=128)
    got = segment_sum_sorted(jnp.asarray(msgs), plan, N,
                             jnp.asarray(mask), interpret=True)
    want = jax.ops.segment_sum(
        jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(msgs), 0),
        jnp.asarray(recv), num_segments=N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_plan_covers_all_tiles():
    recv = np.asarray([0, 0, 5, 300], np.int32)  # tiles 0 and 2 of 4
    plan = build_segment_plan(recv, 512, tile_nodes=128, block_edges=64)
    # every tile has at least one block so all output rows get written
    assert set(plan.block_tile.tolist()) == {0, 1, 2, 3}
    assert plan.block_first.sum() == 4


def test_empty_edges():
    recv = np.zeros((0,), np.int32)
    plan = build_segment_plan(recv, 256, tile_nodes=128, block_edges=64)
    out = segment_sum_sorted(jnp.zeros((0, 128)), plan, 256, None,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.zeros((256, 128)))


def test_grad_through_kernel():
    msgs, recv, mask = _case(1, 256, 256, 128)
    plan = build_segment_plan(recv, 256, tile_nodes=128, block_edges=128)

    def f(m):
        return jnp.sum(segment_sum_sorted(m, plan, 256, jnp.asarray(mask),
                                          interpret=True) ** 2)

    g = jax.grad(f)(jnp.asarray(msgs))
    # oracle gradient: 2 * out[recv] * mask
    out = jax.ops.segment_sum(
        jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(msgs), 0),
        jnp.asarray(recv), num_segments=256)
    want = 2 * jnp.take(out, jnp.asarray(recv), axis=0)
    want = jnp.where(jnp.asarray(mask)[:, None], want, 0.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-4,
                               atol=1e-4)
