"""L3 graph-engine tests: padded batching, segment ops, aggregators, convs,
pooling — numpy oracles over explicit loops (reference test pattern:
phc/quaternion/tests/test_qtensor_scatter.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phc_gnn_tpu.graph import (
    AGGREGATORS,
    GraphsTuple,
    PHMConv,
    PHMGINEConvSoftmax,
    PHMGlobalSumPooling,
    PHMMessagePassing,
    PHMPNAConvSimple,
    PHMSoftAttentionPooling,
    batch_graphs,
    phm_cat,
    segment_softmax_weights,
    softmax_aggregate,
)


def _toy_batch():
    """Two tiny graphs: 3 nodes/4 edges and 2 nodes/2 edges, padded to
    (8 nodes, 8 edges, 4 graphs)."""
    g1 = {
        "x": np.array([[0], [1], [2]], dtype=np.int32),
        "edge_index": np.array([[0, 1, 1, 2], [1, 0, 2, 1]], dtype=np.int32),
        "edge_attr": np.array([[0], [1], [2], [0]], dtype=np.int32),
        "y": np.array([1.0]),
    }
    g2 = {
        "x": np.array([[1], [0]], dtype=np.int32),
        "edge_index": np.array([[0, 1], [1, 0]], dtype=np.int32),
        "edge_attr": np.array([[1], [1]], dtype=np.int32),
        "y": np.array([0.0]),
    }
    return batch_graphs([g1, g2], num_nodes=8, num_edges=8, num_graphs=4,
                        y_shape=(1,))


def test_batch_graphs_layout():
    b = _toy_batch()
    assert b.num_nodes == 8 and b.num_edges == 8 and b.num_graphs == 4
    assert int(b.count_nodes()) == 5
    assert int(b.count_edges()) == 6
    assert int(b.count_graphs()) == 2
    # padding edges point at the last node
    em = np.asarray(b.edge_mask)
    assert np.all(np.asarray(b.senders)[~em] == 7)
    assert np.all(np.asarray(b.receivers)[~em] == 7)
    # second graph's nodes offset by 3
    gi = np.asarray(b.graph_ids)
    assert list(gi[:5]) == [0, 0, 0, 1, 1]
    assert np.all(gi[5:] == 3)
    # edges sorted by receiver
    rec = np.asarray(b.receivers)
    assert np.all(np.diff(rec) >= 0)
    # labels: nan for padding graphs
    y = np.asarray(b.y)
    assert y[0, 0] == 1.0 and y[1, 0] == 0.0 and np.isnan(y[2, 0])


def test_batch_overflow_raises():
    g = {"x": np.zeros((10, 1), np.int32),
         "edge_index": np.zeros((2, 0), np.int32),
         "edge_attr": np.zeros((0, 1), np.int32), "y": None}
    with pytest.raises(ValueError):
        batch_graphs([g], num_nodes=8, num_edges=8, num_graphs=4)


@pytest.mark.parametrize("name", ["sum", "mean", "min", "max", "var", "std"])
def test_aggregators_vs_numpy(name):
    rng = np.random.default_rng(0)
    E, N, D = 20, 6, 5
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    recv = rng.integers(0, N, size=E).astype(np.int32)
    mask = rng.random(E) > 0.25
    out = AGGREGATORS[name](jnp.asarray(msgs), jnp.asarray(recv), N,
                            jnp.asarray(mask))
    want = np.zeros((N, D), np.float32)
    for i in range(N):
        rows = msgs[(recv == i) & mask]
        if rows.size == 0:
            if name == "std":
                want[i] = np.sqrt(1e-5)
            continue
        if name == "sum":
            want[i] = rows.sum(0)
        elif name == "mean":
            want[i] = rows.mean(0)
        elif name == "min":
            want[i] = rows.min(0)
        elif name == "max":
            want[i] = rows.max(0)
        elif name == "var":
            want[i] = rows.var(0)
        elif name == "std":
            want[i] = np.sqrt(np.maximum(rows.var(0), 0) + 1e-5)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_segment_softmax_weights_sum_to_one():
    rng = np.random.default_rng(1)
    E, N = 30, 5
    logits = rng.normal(size=(E, 3)).astype(np.float32) * 10
    recv = rng.integers(0, N, size=E).astype(np.int32)
    mask = rng.random(E) > 0.3
    w = segment_softmax_weights(jnp.asarray(logits), jnp.asarray(recv), N,
                                jnp.asarray(mask))
    w = np.asarray(w)
    assert np.all(w[~mask] == 0)
    sums = np.zeros((N, 3))
    for i in range(N):
        sums[i] = w[(recv == i)].sum(0)
    nonempty = np.asarray([(mask & (recv == i)).any() for i in range(N)])
    np.testing.assert_allclose(sums[nonempty], 1.0, rtol=1e-5)
    # oracle: per-segment softmax
    for i in range(N):
        sel = (recv == i) & mask
        if sel.sum():
            want = np.exp(logits[sel]) / np.exp(logits[sel]).sum(0, keepdims=True)
            np.testing.assert_allclose(w[sel], want, rtol=1e-4, atol=1e-6)


def test_softmax_aggregate_beta_extremes():
    """beta -> large approximates max; beta = 0 gives mean."""
    msgs = jnp.asarray([[1.0], [2.0], [3.0]])
    recv = jnp.asarray([0, 0, 0])
    near_max = softmax_aggregate(msgs, recv, 1, beta=50.0)
    np.testing.assert_allclose(near_max, [[3.0]], rtol=1e-4)
    mean = softmax_aggregate(msgs, recv, 1, beta=0.0)
    np.testing.assert_allclose(mean, [[2.0]], rtol=1e-6)


def test_phm_cat_preserves_blocks():
    n = 2
    a = jnp.arange(8.0).reshape(2, 4)      # blocks [0,1 | 2,3]
    b = jnp.arange(12.0).reshape(2, 6)     # blocks [0..2 | 3..5]
    out = phm_cat([a, b], n)
    assert out.shape == (2, 10)
    # row 0: comp0 = [0,1, 0,1,2], comp1 = [2,3, 3,4,5]
    np.testing.assert_array_equal(out[0], [0, 1, 0, 1, 2, 2, 3, 3, 4, 5])


def _dense_inputs(n=4, d=2, N=8, E=12, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, n * d)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, N - 1, size=E).astype(np.int32))
    receivers = jnp.asarray(rng.integers(0, N - 1, size=E).astype(np.int32))
    edge_attr = jnp.asarray(rng.normal(size=(E, n * d)).astype(np.float32))
    edge_mask = jnp.asarray(rng.random(E) > 0.2)
    return x, senders, receivers, edge_attr, edge_mask


def test_phm_conv_oracle():
    """PHMConv(same_dim): y = transform(segment_sum(x[s]+e)) + x."""
    n, d = 4, 2
    x, s, r, e, m = _dense_inputs(n, d)
    conv = PHMConv(in_features=n * d, out_features=n * d, phm_dim=n,
                   aggr="sum", same_dim=True)
    params = conv.init(jax.random.key(0), x, s, r, e, m)
    y = conv.apply(params, x, s, r, e, m)
    # oracle
    msgs = np.asarray(x)[np.asarray(s)] + np.asarray(e)
    agg = np.zeros_like(np.asarray(x))
    for i in range(len(np.asarray(s))):
        if np.asarray(m)[i]:
            agg[np.asarray(r)[i]] += msgs[i]
    w = np.asarray(params["params"]["transform"]["W"])
    rule = np.asarray(params["params"]["transform"]["phm_rule"])
    b = np.asarray(params["params"]["transform"]["b"])
    h = sum(np.kron(rule[i], w[i]) for i in range(n))
    want = agg @ h + b + np.asarray(x)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


def test_gine_softmax_conv_runs_and_masks():
    n, d = 4, 2
    x, s, r, e, m = _dense_inputs(n, d)
    conv = PHMGINEConvSoftmax(in_features=n * d, out_features=n * d, phm_dim=n,
                              norm="naive-batch-norm")
    variables = conv.init(jax.random.key(0), x, s, r, e, m, training=True)
    y, _ = conv.apply(variables, x, s, r, e, m, training=True,
                      mutable=["batch_stats"])
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
    assert "beta" in variables["params"]


def test_pna_conv_runs():
    n, d = 2, 3
    x, s, r, e, m = _dense_inputs(n, d, seed=3)
    conv = PHMPNAConvSimple(in_features=n * d, out_features=n * d, phm_dim=n,
                            avg_deg={"lin": 2.0, "log": 1.0}, post_layers=2)
    variables = conv.init(jax.random.key(0), x, s, r, e, m, training=True)
    y = conv.apply(variables, x, s, r, e, m, training=True,
                   mutable=["batch_stats"])[0]
    assert y.shape == (x.shape[0], n * d)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("aggr,mlp", [("sum", True), ("sum", False),
                                      ("softmax", True), ("softmax", False),
                                      ("pna", True)])
def test_message_passing_facade(aggr, mlp):
    n, d = 4, 2
    x, s, r, e, m = _dense_inputs(n, d, seed=4)
    conv = PHMMessagePassing(in_features=n * d, out_features=n * d, phm_dim=n,
                             aggr=aggr, mlp=mlp,
                             avg_deg={"lin": 2.0, "log": 1.0})
    variables = conv.init(jax.random.key(0), x, s, r, e, m, training=True)
    y = conv.apply(variables, x, s, r, e, m, training=True,
                   mutable=["batch_stats"])[0]
    assert y.shape == (x.shape[0], n * d)


def test_global_sum_pooling_oracle():
    """Pooling equals per-graph node-feature sums
    (reference: phc/quaternion/tests/test_qtensor_scatter.py:11-40)."""
    rng = np.random.default_rng(5)
    N, G, D = 10, 3, 6
    x = rng.normal(size=(N, D)).astype(np.float32)
    gids = np.array([0, 0, 0, 1, 1, 1, 1, 2, 2, 2], np.int32)
    mask = np.ones(N, bool)
    mask[-1] = False
    pool = PHMGlobalSumPooling(phm_dim=2)
    out = pool.apply({}, jnp.asarray(x), jnp.asarray(gids), G, jnp.asarray(mask))
    want = np.zeros((G, D), np.float32)
    for i in range(N):
        if mask[i]:
            want[gids[i]] += x[i]
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_soft_attention_pooling():
    n, d, N, G = 4, 3, 10, 3
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(N, n * d)).astype(np.float32))
    gids = jnp.asarray(rng.integers(0, G - 1, size=N).astype(np.int32))
    pool = PHMSoftAttentionPooling(embed_dim=n * d, phm_dim=n)
    params = pool.init(jax.random.key(0), x, gids, G)
    out = pool.apply(params, x, gids, G)
    assert out.shape == (G, n * d)
    assert np.all(np.isfinite(np.asarray(out)))


def test_conv_jits_once_per_shape():
    """The whole conv jits and reuses the trace for same-shape batches."""
    n, d = 4, 2
    x, s, r, e, m = _dense_inputs(n, d, seed=7)
    conv = PHMConv(in_features=n * d, out_features=n * d, phm_dim=n)
    params = conv.init(jax.random.key(0), x, s, r, e, m)
    traced = 0

    @jax.jit
    def f(params, x, s, r, e, m):
        nonlocal traced
        traced += 1
        return conv.apply(params, x, s, r, e, m)

    f(params, x, s, r, e, m)
    f(params, x * 2, s, r, e, m)
    assert traced == 1
