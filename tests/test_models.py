"""L4 model tests: the PHCGNN architectures end-to-end on padded batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import (
    PHCGNN,
    PHMSkipConnectAdd,
    PHMSkipConnectConcat,
    QuaternionSkipConnectAdd,
)

MODEL_KW = dict(
    atom_input_dims=ZINC_ATOM_DIMS,
    bond_input_dims=ZINC_BOND_DIMS,
    atom_encoded_dim=32,
    mp_layers=(32, 32),
    dropout_mpnn=(0.1, 0.1),
    downstream_layers=(16, 8),
    target_dim=1,
    dropout_dn=(0.1, 0.1),
)


def _batch():
    return synthetic_batch(batch_size=8, num_nodes=256, num_edges=512, seed=0)


def _init_and_run(model, batch, training=True):
    variables = model.init(jax.random.key(0), batch, training=training,
                           dropout_rng=jax.random.key(1))
    if training:
        out, updates = model.apply(variables, batch, training=True,
                                   dropout_rng=jax.random.key(2),
                                   mutable=["batch_stats"])
    else:
        out = model.apply(variables, batch, training=False)
    return variables, out


@pytest.mark.parametrize("aggr,mlp", [("softmax", True), ("sum", False)])
def test_add_skip_forward(aggr, mlp):
    model = PHMSkipConnectAdd(phm_dim=4, msg_aggr=aggr, mlp_mp=mlp, **MODEL_KW)
    batch = _batch()
    variables, out = _init_and_run(model, batch)
    assert out.shape == (batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_concat_skip_forward():
    kw = dict(MODEL_KW)
    kw.update(atom_encoded_dim=16, mp_layers=(16, 32), dropout_mpnn=(0.0, 0.0))
    model = PHMSkipConnectConcat(phm_dim=4, msg_aggr="softmax", mlp_mp=True, **kw)
    batch = _batch()
    _, out = _init_and_run(model, batch)
    assert out.shape == (batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_quaternion_preset_uses_fixed_rule():
    model = QuaternionSkipConnectAdd(**MODEL_KW)
    batch = _batch()
    variables, out = _init_and_run(model, batch)
    assert out.shape == (batch.num_graphs, 1)


@pytest.mark.parametrize("phm_dim,dim", [(2, 32), (4, 32), (8, 32)])
def test_variable_phm_dim(phm_dim, dim):
    kw = dict(MODEL_KW)
    kw.update(atom_encoded_dim=dim, mp_layers=(dim, dim))
    model = PHCGNN(phm_dim=phm_dim, msg_aggr="sum", mlp_mp=True, **kw)
    batch = _batch()
    _, out = _init_and_run(model, batch)
    assert out.shape == (batch.num_graphs, 1)


def test_unique_phm_shares_rule():
    model = PHCGNN(phm_dim=4, unique_phm=True, msg_aggr="softmax", mlp_mp=True,
                   **MODEL_KW)
    batch = _batch()
    variables, _ = _init_and_run(model, batch)
    params = variables["params"]
    assert "phm_rule_shared" in params
    # no per-layer rules anywhere else
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    per_layer = [p for p, _ in leaves
                 if getattr(p[-1], "key", None) == "phm_rule"]
    assert not per_layer


def test_param_efficiency_increases_with_phm_dim():
    """Higher phm_dim -> fewer params (reference: benchmarks/README.md:93)."""
    counts = {}
    batch = _batch()
    for n in (2, 4, 8):
        kw = dict(MODEL_KW)
        kw.update(atom_encoded_dim=128, mp_layers=(128, 128),
                  downstream_layers=(128, 64))
        model = PHCGNN(phm_dim=n, msg_aggr="sum", mlp_mp=True, **kw)
        variables = model.init(jax.random.key(0), batch, training=False)
        counts[n] = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert counts[2] > counts[4] > counts[8]


def test_padding_invariance():
    """Padding nodes/edges/graphs must not change real-graph outputs."""
    model = PHCGNN(phm_dim=4, msg_aggr="softmax", mlp_mp=True,
                   norm_mp=None, norm_dn=None, **{
                       **MODEL_KW, "dropout_mpnn": (0.0, 0.0),
                       "dropout_dn": (0.0, 0.0)})
    small = synthetic_batch(batch_size=4, num_nodes=128, num_edges=256, seed=3)
    from phc_gnn_tpu.graph import pad_graph_batch
    big = pad_graph_batch(small, num_nodes=256, num_edges=512, num_graphs=9)
    variables = model.init(jax.random.key(0), small, training=False)
    out_small = model.apply(variables, small, training=False)
    out_big = model.apply(variables, big, training=False)
    np.testing.assert_allclose(np.asarray(out_small)[:4], np.asarray(out_big)[:4],
                               rtol=2e-4, atol=2e-4)


def test_grad_flows_through_model():
    model = PHCGNN(phm_dim=4, msg_aggr="softmax", mlp_mp=True, **MODEL_KW)
    batch = _batch()
    variables = model.init(jax.random.key(0), batch, training=True,
                           dropout_rng=jax.random.key(1))

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, training=True, dropout_rng=jax.random.key(2),
            mutable=["batch_stats"])
        mask = ~jnp.isnan(batch.y)
        return jnp.sum(jnp.where(mask, (out - jnp.nan_to_num(batch.y)) ** 2, 0))

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in flat)))
    assert np.isfinite(gnorm) and gnorm > 0
    # every conv weight received gradient
    conv_w = [g for p, g in jax.tree_util.tree_flatten_with_path(grads)[0]
              if "conv" in str(p) and getattr(p[-1], "key", None) == "W"]
    assert conv_w and all(float(jnp.abs(g).max()) > 0 for g in conv_w)


def test_padding_invariance_with_norms_train_mode():
    """BN statistics must exclude padding rows: train-mode outputs for real
    graphs are identical whether the batch carries 0% or 50% padding."""
    model = PHCGNN(phm_dim=4, msg_aggr="softmax", mlp_mp=True,
                   norm_mp="naive-batch-norm", norm_dn="naive-batch-norm",
                   **{**MODEL_KW, "dropout_mpnn": (0.0, 0.0),
                      "dropout_dn": (0.0, 0.0)})
    small = synthetic_batch(batch_size=4, num_nodes=128, num_edges=256, seed=3)
    from phc_gnn_tpu.graph import pad_graph_batch
    big = pad_graph_batch(small, num_nodes=256, num_edges=512, num_graphs=9)
    variables = model.init(jax.random.key(0), small, training=True)
    out_s, up_s = model.apply(variables, small, training=True,
                              mutable=["batch_stats"])
    out_b, up_b = model.apply(variables, big, training=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_s)[:4], np.asarray(out_b)[:4],
                               rtol=2e-4, atol=2e-4)
    # running stats also padding-invariant
    for a, b in zip(jax.tree_util.tree_leaves(up_s["batch_stats"]),
                    jax.tree_util.tree_leaves(up_b["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
