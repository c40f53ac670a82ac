"""Fused softmax-aggregation kernel tests (interpret mode) vs the XLA
composite oracle, including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phc_gnn_tpu.graph.aggregators import softmax_aggregate
from phc_gnn_tpu.ops import build_segment_plan
from phc_gnn_tpu.ops.fused_softmax import fused_softmax_aggregate, pad_plan_to


def _case(seed, E, N, D):
    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    mask = rng.random(E) > 0.2
    return (jnp.asarray(msgs), jnp.asarray(recv), jnp.asarray(mask), recv)


@pytest.mark.parametrize("E,N,D,beta", [
    (512, 256, 128, 1.0),
    (1000, 256, 100, 2.5),
    (300, 256, 128, 0.0),
])
def test_fused_matches_composite(E, N, D, beta):
    msgs, recv_j, mask, recv = _case(0, E, N, D)
    plan = build_segment_plan(recv, N, tile_nodes=128, block_edges=128)
    want = softmax_aggregate(msgs, recv_j, N, beta, mask)
    got = fused_softmax_aggregate(msgs, beta, plan, N, recv_j, mask,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_fused_grads_match_composite():
    msgs, recv_j, mask, recv = _case(1, 256, 256, 128)
    plan = build_segment_plan(recv, 256, tile_nodes=128, block_edges=128)
    beta = jnp.float32(1.3)

    def loss_composite(m, b):
        out = softmax_aggregate(m, recv_j, 256, b, mask)
        return jnp.sum(out ** 2)

    def loss_fused(m, b):
        out = fused_softmax_aggregate(m, b, plan, 256, recv_j, mask,
                                      interpret=True)
        return jnp.sum(out ** 2)

    g1m, g1b = jax.grad(loss_composite, argnums=(0, 1))(msgs, beta)
    g2m, g2b = jax.grad(loss_fused, argnums=(0, 1))(msgs, beta)
    np.testing.assert_allclose(np.asarray(g2m), np.asarray(g1m), rtol=2e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(g2b), float(g1b), rtol=2e-3)


def test_pad_plan_to_shape_stable():
    _, _, mask, recv = _case(2, 200, 256, 64)
    plan = build_segment_plan(recv, 256, tile_nodes=128, block_edges=64)
    nb = plan.block_tile.shape[0]
    padded = pad_plan_to(plan, nb + 3)
    assert padded.block_tile.shape[0] == nb + 3
    assert (padded.block_tile[nb:] == plan.num_tiles - 1).all()
    assert (padded.block_first[nb:] == 0).all()
    # padded plan gives the same result
    msgs = jnp.asarray(np.random.default_rng(3).normal(size=(200, 64)),
                       jnp.float32)
    recv_j = jnp.asarray(recv)
    a = fused_softmax_aggregate(msgs, 1.0, plan, 256, recv_j, None,
                                interpret=True)
    b = fused_softmax_aggregate(msgs, 1.0, padded, 256, recv_j, None,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_plan_layout_loader_and_model_equivalence():
    """A plan-layout batch run through the full model (fused kernel path,
    interpret via CPU) matches the plain-layout batch bit-for-bit in semantics."""
    from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, random_graph
    from phc_gnn_tpu.data.loader import PaddedLoader, compute_bucket_spec
    from phc_gnn_tpu.models import PHCGNN

    rng = np.random.default_rng(0)
    graphs = [random_graph(rng, target_dim=1) for _ in range(12)]
    spec = compute_bucket_spec(graphs, batch_size=12, target_dim=1)
    plain = list(PaddedLoader(graphs, spec))[0]
    planned = list(PaddedLoader(graphs, spec, plan_layout=True))[0]

    assert planned.recv_local is not None
    # same real-edge multiset
    pm = np.asarray(planned.edge_mask)
    om = np.asarray(plain.edge_mask)
    a = sorted(zip(np.asarray(planned.senders)[pm].tolist(),
                   np.asarray(planned.receivers)[pm].tolist()))
    b = sorted(zip(np.asarray(plain.senders)[om].tolist(),
                   np.asarray(plain.receivers)[om].tolist()))
    assert a == b

    model = PHCGNN(
        phm_dim=4, atom_input_dims=ZINC_ATOM_DIMS,
        bond_input_dims=ZINC_BOND_DIMS, atom_encoded_dim=32,
        mp_layers=(32, 32), dropout_mpnn=(0.0, 0.0), downstream_layers=(16,),
        target_dim=1, dropout_dn=(0.0,), msg_aggr="softmax", mlp_mp=True,
        norm_mp=None, norm_dn=None)
    variables = model.init(jax.random.key(0), plain, training=False)
    out_plain = model.apply(variables, plain, training=False)
    out_planned = model.apply(variables, planned, training=False)
    np.testing.assert_allclose(np.asarray(out_planned), np.asarray(out_plain),
                               rtol=5e-4, atol=5e-5)

    # gradients agree too
    def loss(params, batch):
        out = model.apply({"params": params}, batch, training=False)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss)(variables["params"], plain)
    g2 = jax.grad(loss)(variables["params"], planned)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3,
                                   atol=5e-5)
