"""bf16 compute-path tests: params stay f32, activations run bf16, outputs
close to the f32 model."""

import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import PHCGNN

KW = dict(atom_input_dims=ZINC_ATOM_DIMS, bond_input_dims=ZINC_BOND_DIMS,
          atom_encoded_dim=32, mp_layers=(32, 32), dropout_mpnn=(0.0, 0.0),
          downstream_layers=(32, 16), target_dim=1, dropout_dn=(0.0, 0.0),
          msg_aggr="softmax", mlp_mp=True)


def test_bf16_model_close_to_f32():
    batch = synthetic_batch(batch_size=8, num_nodes=256, num_edges=512, seed=0)
    m32 = PHCGNN(phm_dim=4, **KW)
    m16 = PHCGNN(phm_dim=4, compute_dtype=jnp.bfloat16, **KW)
    variables = m32.init(jax.random.key(0), batch, training=False)
    out32 = m32.apply(variables, batch, training=False)
    out16 = m16.apply(variables, batch, training=False)
    # params identical (same init shapes/dtypes)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    assert out16.dtype == jnp.float32  # head output back in f32
    # bf16 relative error bounded
    denom = np.abs(np.asarray(out32)).max() + 1e-6
    rel = np.abs(np.asarray(out16) - np.asarray(out32)).max() / denom
    assert rel < 0.05, rel


def test_bf16_grad_finite():
    batch = synthetic_batch(batch_size=8, num_nodes=256, num_edges=512, seed=1)
    m16 = PHCGNN(phm_dim=4, compute_dtype=jnp.bfloat16, **KW)
    variables = m16.init(jax.random.key(0), batch, training=True,
                         dropout_rng=jax.random.key(1))

    def loss(params):
        out, _ = m16.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, training=True, dropout_rng=jax.random.key(2),
            mutable=["batch_stats"])
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves)
