"""Pins the analytic comm-volume model (parallel/comm_model.py) against the
COMPILED node-parallel train step: the all_to_all operands found in the jaxpr
must sum to exactly the modeled halo wire bytes (VERDICT r2 next #8).  This
makes the ≥80 % scaling target falsifiable before multi-chip hardware exists:
the model's inputs (cut, H, layer dims) are checked here; only the ICI
bandwidth constant remains to be confirmed by measurement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.parallel import make_mesh
from phc_gnn_tpu.parallel.comm_model import (
    boundary_cuts,
    halo_volume,
    predict_scaling_efficiency,
    step_comm_volume,
)
from phc_gnn_tpu.parallel.halo import make_np_train_step, partition_nodes
from phc_gnn_tpu.train import create_train_state, make_train_step
from phc_gnn_tpu.train.loss import masked_l1

DIM = 16
MODEL_KW = dict(
    atom_input_dims=ZINC_ATOM_DIMS, bond_input_dims=ZINC_BOND_DIMS,
    atom_encoded_dim=DIM, mp_layers=(DIM, DIM), dropout_mpnn=(0.0, 0.0),
    downstream_layers=(DIM, 8), target_dim=1, dropout_dn=(0.0, 0.0),
    msg_aggr="softmax", mlp_mp=True)


def loss_fn(out, batch):
    return masked_l1(out, batch.y)


def _collect_eqns(jaxpr, prim_name, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == prim_name:
            out.append(eqn)
        for v in eqn.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for u in vs:
                inner = getattr(u, "jaxpr", u)
                if hasattr(inner, "eqns"):
                    _collect_eqns(inner, prim_name, out)
    return out


def test_boundary_cuts_match_partitioner():
    """The model's cut matrix must reproduce the partitioner's halo width
    (H = round_up(max cut, 8)) and send-list sizes."""
    for seed, S in [(0, 2), (1, 4), (2, 8)]:
        batch = synthetic_batch(batch_size=8, num_nodes=256, num_edges=512,
                                seed=seed)
        cut = boundary_cuts(batch, S)
        part = partition_nodes(batch, S)
        H_model = halo_volume(batch, S, [DIM])["H"]
        assert part.halo_send.shape[2] == H_model
        assert np.all(np.diag(cut) == 0)
        # total cut > 0 for a connected-ish random batch split several ways
        assert cut.sum() > 0


def test_halo_wire_bytes_match_jaxpr():
    """Count the all_to_alls in the traced (fwd+bwd) node-parallel step and
    sum their operand bytes: exactly 2 x L exchanges of [S*H, d_layer] f32,
    equal to halo_volume(...)['padded_bytes']."""
    S = 4
    mesh = make_mesh(dp=1, ep=S)
    batch = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=1)
    part = partition_nodes(batch, S)
    H = part.halo_send.shape[2]

    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **MODEL_KW)
    state = create_train_state(model_1, tx, batch, jax.random.key(0))
    model_np = PHCGNN(phm_dim=4, node_axis="ep", **MODEL_KW)
    step = make_np_train_step(model_np, tx, loss_fn, mesh, donate=False)

    jaxpr = jax.make_jaxpr(lambda s, b, lr: step(s, b, lr))(
        state, part, jnp.float32(1e-3))
    a2a = _collect_eqns(jaxpr.jaxpr, "all_to_all", [])
    L = len(MODEL_KW["mp_layers"])
    assert len(a2a) == 2 * L, f"expected {2 * L} all_to_alls, got {len(a2a)}"

    layer_dims = [DIM] * L  # add-skip: every conv consumes [*, DIM]
    for eqn in a2a:
        shape = tuple(eqn.invars[0].aval.shape)
        assert shape == (S * H, DIM), shape
    traced_bytes = sum(
        int(np.prod(eqn.invars[0].aval.shape)) * eqn.invars[0].aval.dtype.itemsize
        for eqn in a2a)
    model = halo_volume(batch, S, layer_dims)
    assert traced_bytes == model["padded_bytes"], (
        traced_bytes, model["padded_bytes"])


def _controlled_cut_batch(N, S, K):
    """One giant graph: a chain INSIDE each shard's contiguous node range
    (zero cross-shard edges) plus exactly K distinct cross-shard edges from
    shard 0's first K nodes into shard 1's first K nodes.  The boundary cut is
    K by construction, independent of N."""
    from phc_gnn_tpu.graph.batch import GraphsTuple
    NS = N // S
    send, recv = [], []
    for s in range(S):
        lo = s * NS
        send += list(range(lo, lo + NS - 1))
        recv += list(range(lo + 1, lo + NS))
    send += list(range(0, K))
    recv += list(range(NS, NS + K))
    send, recv = np.asarray(send, np.int32), np.asarray(recv, np.int32)
    order = np.argsort(recv, kind="stable")
    send, recv = send[order], recv[order]
    E = send.shape[0]
    return GraphsTuple(
        nodes=jnp.zeros((N, 1), jnp.int32), edges=jnp.zeros((E, 1), jnp.int32),
        senders=jnp.asarray(send), receivers=jnp.asarray(recv),
        graph_ids=jnp.zeros((N,), jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool), y=jnp.zeros((1, 1)))


def test_comm_is_cut_proportional_not_n():
    """Doubling N with an identical boundary cut must leave the halo wire
    bytes EXACTLY unchanged: the scheme's comm scales with the cut (graph
    property), never with node count."""
    S, K = 4, 24
    small = _controlled_cut_batch(256, S, K)
    big = _controlled_cut_batch(512, S, K)
    v_small = halo_volume(small, S, [DIM])
    v_big = halo_volume(big, S, [DIM])
    assert v_small["max_cut"] == v_big["max_cut"] == K
    assert v_small["padded_bytes"] == v_big["padded_bytes"]
    # and the partitioner's static halo width agrees with the model
    assert partition_nodes(small, S).halo_send.shape[2] == v_small["H"]
    assert partition_nodes(big, S).halo_send.shape[2] == v_big["H"]


def test_predicted_flagship_scaling_meets_target():
    """The recorded flagship operating point (1.91 ms/step, 4096n/8192e,
    d=200, 4 layers — STATUS.md round-2 measurements) under the modeled halo
    volume predicts >=80 % efficiency at ep=4 on v5e ICI.  This is the
    falsifiable claim hardware will check: if the measured efficiency
    undershoots, either the volume pin above or the bandwidth constant is wrong — the test documents which constants were assumed."""
    batch = synthetic_batch(batch_size=128, num_nodes=4096, num_edges=8192,
                            seed=3)
    vol = step_comm_volume(batch, 4, layer_dims=[200] * 4, pooled_dim=200,
                           bn_dims=[200] * 4)
    pred = predict_scaling_efficiency(
        step_time_1chip_s=1.91e-3,
        comm_bytes_per_shard=vol["total_bytes"], num_shards=4)
    # round 4: the AOT-compiled v5e 2x4 schedule shows the halo all_to_alls
    # as SYNCHRONOUS ops (AOT_SCHEDULE.json), so the prediction asserts the
    # NO-overlap bound — the former overlap=0.5 point guess is retired
    assert pred["efficiency_no_overlap"] >= 0.80, pred
    assert pred["efficiency"] <= pred["efficiency_full_overlap"]
