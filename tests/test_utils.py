"""Utils tests: profiling meters, oversmoothing diagnostics, seeding."""

import numpy as np

from phc_gnn_tpu.utils import StepMeter, col_diff, row_diff, set_seed_all


def test_step_meter_rates():
    import time

    m = StepMeter(window=10)
    for _ in range(5):
        m.tick(edges_in_batch=100)
        time.sleep(0.01)
    # loose bounds: CI machines under load can stretch the sleep
    assert 1 < m.steps_per_s < 500
    assert m.edges_per_s > 0


def test_row_col_diff():
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 6)),
                    jnp.float32)
    rd, cd = float(row_diff(x)), float(col_diff(x))
    assert rd > 0 and cd > 0
    # identical rows -> zero row_diff (oversmoothing signal)
    same = jnp.ones((10, 6))
    assert float(row_diff(same)) < 1e-5


def test_set_seed_all_reproducible():
    k1 = set_seed_all(7)
    a = np.random.rand(3)
    k2 = set_seed_all(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    import jax
    assert (jax.random.key_data(k1) == jax.random.key_data(k2)).all()
