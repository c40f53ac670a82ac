"""North-star node-sharded parallelism with halo exchange (VERDICT r1 #3).

Pins, on the 8-device virtual CPU mesh:
- partition invariants (every real edge lives with its receiver's owner,
  aug sender indices decode back to the right global nodes),
- comm proportionality (halo width H tracks the boundary cut, not N),
- 1/S node-compute (per-shard GEMM rows = roundup(N/S)),
- exactness: the node-parallel train step equals the single-device step
  (including cross-shard BN batch statistics), and dp x np composes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.models import PHCGNN
from phc_gnn_tpu.parallel import make_mesh
from phc_gnn_tpu.parallel.halo import (
    make_dp_np_batch_specs,
    make_dp_np_train_step,
    make_np_train_step,
    partition_nodes,
)
from phc_gnn_tpu.train import create_train_state, make_train_step
from phc_gnn_tpu.train.loss import masked_l1

MODEL_KW = dict(
    atom_input_dims=ZINC_ATOM_DIMS, bond_input_dims=ZINC_BOND_DIMS,
    atom_encoded_dim=16, mp_layers=(16, 16), dropout_mpnn=(0.0, 0.0),
    downstream_layers=(16, 8), target_dim=1, dropout_dn=(0.0, 0.0),
    msg_aggr="softmax", mlp_mp=True)


def loss_fn(out, batch):
    return masked_l1(out, batch.y)


def _decode_global_edges(part, batch, S):
    """Reconstruct (global sender, global receiver) pairs of every real edge
    from the per-shard partitioned arrays."""
    NS = part.nodes.shape[1]
    H = part.halo_send.shape[2]
    hs = np.asarray(part.halo_send)
    send = np.asarray(part.senders)
    recv = np.asarray(part.receivers)
    emask = np.asarray(part.edge_mask)
    pairs = []
    for s in range(S):
        for e in range(send.shape[1]):
            if not emask[s, e]:
                continue
            g_recv = s * NS + int(recv[s, e])
            a = int(send[s, e])
            if a < NS:
                g_send = s * NS + a
            else:
                t, i = divmod(a - NS, H)
                g_send = t * NS + int(hs[t, s, i])
            pairs.append((g_send, g_recv))
    return sorted(pairs)


@pytest.mark.parametrize("S", [2, 4])
def test_partition_invariants(S):
    batch = synthetic_batch(batch_size=8, num_nodes=256, num_edges=512, seed=0)
    part = partition_nodes(batch, S)
    NS = part.nodes.shape[1]
    assert NS == ((256 + S - 1) // S + 7) // 8 * 8  # 1/S node rows per shard

    # node features / masks / graph ids survive the repack
    nodes = np.asarray(batch.nodes)
    for s in range(S):
        lo = s * NS
        n_here = max(0, min(256 - lo, NS))
        np.testing.assert_array_equal(
            np.asarray(part.nodes)[s, :n_here], nodes[lo:lo + n_here])

    # every real edge present exactly once, owned by its receiver's shard
    want = sorted(
        (int(a), int(b)) for a, b, m in zip(
            np.asarray(batch.senders), np.asarray(batch.receivers),
            np.asarray(batch.edge_mask)) if m)
    got = _decode_global_edges(part, batch, S)
    assert got == want


def test_halo_width_tracks_cut_not_n():
    """Comm bytes per layer are proportional to the boundary cut: for a batch
    of small disjoint molecules the max pairwise cut is tiny, so H must be
    far below NS (full replication would be N rows)."""
    batch = synthetic_batch(batch_size=32, num_nodes=1024, num_edges=2048,
                            seed=0)
    S = 4
    part = partition_nodes(batch, S)
    NS = part.nodes.shape[1]
    H = part.halo_send.shape[2]
    # independently compute the max cut: unique senders needed across a shard
    # boundary, per ordered pair
    send = np.asarray(batch.senders)
    recv = np.asarray(batch.receivers)
    mask = np.asarray(batch.edge_mask)
    owner = lambda v: np.minimum(v // NS, S - 1)
    max_cut = 0
    for t in range(S):
        for s in range(S):
            if t == s:
                continue
            sel = mask & (owner(recv) == s) & (owner(send) == t)
            max_cut = max(max_cut, len(np.unique(send[sel])))
    assert H == -(-max(max_cut, 1) // 8) * 8
    assert H < NS // 4, (H, NS)  # halo is a small fraction of the shard


def test_np_step_matches_single_device():
    """Node-parallel step (8 shards, halo exchange, cross-shard BN stats,
    softmax aggregation) equals the single-device step.  BN stays ON — the
    stat_axis psums must reproduce full-batch statistics exactly."""
    S = 8
    mesh = make_mesh(dp=1, ep=S)
    batch = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=1)
    part = partition_nodes(batch, S)

    # plain SGD (see test_ep_matches_single_device for why not Adam)
    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **MODEL_KW)
    state = create_train_state(model_1, tx, batch, jax.random.key(0))
    step_1 = make_train_step(model_1, tx, loss_fn, donate=False)
    new_1, loss_1, _ = step_1(state, batch, jnp.float32(1e-3))

    model_np = PHCGNN(phm_dim=4, node_axis="ep", **MODEL_KW)
    step_np = make_np_train_step(model_np, tx, loss_fn, mesh, donate=False)
    new_np, loss_np, _ = step_np(state, part, jnp.float32(1e-3))

    np.testing.assert_allclose(float(loss_1), float(loss_np), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(new_1.params),
                    jax.tree_util.tree_leaves(new_np.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-4,
                                   atol=1e-5)
    # BN running stats must agree too (global batch statistics)
    for x, y in zip(jax.tree_util.tree_leaves(new_1.batch_stats),
                    jax.tree_util.tree_leaves(new_np.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-5)


def test_np_step_with_scan_plan_matches_single_device():
    """Halo partitioning composing with the streaming-scan aggregation kernel
    (per-shard edge slices stay receiver-sorted, KERNELS.md): the node-parallel
    step with per-shard scan plans equals the single-device step."""
    S = 8
    mesh = make_mesh(dp=1, ep=S)
    batch = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=1)
    part = partition_nodes(batch, S, scan_plan=True, scan_block=128)
    assert part.scan_flags is not None and part.scan_flags.shape[0] == S
    # per-shard receivers must be sorted (the kernel's precondition)
    recv = np.asarray(part.receivers)
    assert all(np.all(recv[s, 1:] >= recv[s, :-1]) for s in range(S))

    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **MODEL_KW)
    state = create_train_state(model_1, tx, batch, jax.random.key(0))
    step_1 = make_train_step(model_1, tx, loss_fn, donate=False)
    new_1, loss_1, _ = step_1(state, batch, jnp.float32(1e-3))

    model_np = PHCGNN(phm_dim=4, node_axis="ep", **MODEL_KW)
    step_np = make_np_train_step(model_np, tx, loss_fn, mesh, donate=False)
    new_np, loss_np, _ = step_np(state, part, jnp.float32(1e-3))

    np.testing.assert_allclose(float(loss_1), float(loss_np), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(new_1.params),
                    jax.tree_util.tree_leaves(new_np.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-4,
                                   atol=1e-5)


def test_dp_np_combined_step_matches_single_device():
    """(dp=2, ep=4): two batches node-sharded 4 ways must reproduce the
    average of the two single-device steps (equal loss weights by
    construction)."""
    from jax.sharding import NamedSharding

    dp, S = 2, 4
    mesh = make_mesh(dp=dp, ep=S)
    batches = [synthetic_batch(batch_size=4, num_nodes=128, num_edges=256,
                               seed=s) for s in range(dp)]
    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **MODEL_KW)
    state = create_train_state(model_1, tx, batches[0], jax.random.key(0))

    # oracle: average the two single-device grads -> param delta average;
    # BN stats combine with node-count weights
    step_1 = make_train_step(model_1, tx, loss_fn, donate=False)
    deltas, losses, stats, n_nodes = [], [], [], []
    for b in batches:
        new_b, loss_b, _ = step_1(state, b, jnp.float32(1e-3))
        deltas.append(jax.tree_util.tree_map(lambda a, o: a - o, new_b.params,
                                             state.params))
        losses.append(float(loss_b))
        stats.append(new_b.batch_stats)
        n_nodes.append(float(np.asarray(b.node_mask).sum()))
    mean_params = jax.tree_util.tree_map(
        lambda o, d0, d1: o + (d0 + d1) / 2, state.params, *deltas)
    w0, w1 = n_nodes[0] / sum(n_nodes), n_nodes[1] / sum(n_nodes)
    mean_stats = jax.tree_util.tree_map(lambda a, b_: w0 * a + w1 * b_,
                                        *stats)

    parts = [partition_nodes(b, S) for b in batches]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *parts)
    specs = make_dp_np_batch_specs()
    sharded = jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), stacked,
        specs)
    model_np = PHCGNN(phm_dim=4, node_axis="ep", **MODEL_KW)
    step_np = make_dp_np_train_step(model_np, tx, loss_fn, mesh, donate=False)
    new_np, loss_np, _ = step_np(state, sharded, jnp.float32(1e-3))

    np.testing.assert_allclose(float(loss_np), np.mean(losses), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(mean_params),
                    jax.tree_util.tree_leaves(new_np.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-4,
                                   atol=1e-5)
    # BN running stats must be the node-count-weighted combination AND
    # identical on every device (the global-psum'd w_bn guarantees both;
    # an ep-local weight would silently decohere them across ep shards)
    np_stats = jax.device_get(new_np.batch_stats)
    for x, y in zip(jax.tree_util.tree_leaves(mean_stats),
                    jax.tree_util.tree_leaves(np_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-6)


def test_np_step_pna_matches_single_device():
    """PNA conv under node-sharded halo parallelism: multi-aggregator local
    reductions, local in-degrees for the scalers, and the post-stack BN's
    cross-shard stats must reproduce the single-device step exactly."""
    S = 4
    mesh = make_mesh(dp=1, ep=S)
    batch = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=2)
    part = partition_nodes(batch, S)
    kw = dict(MODEL_KW, msg_aggr="pna",
              avg_deg={"log": 1.2, "lin": 3.1, "exp": 1.0})

    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **kw)
    state = create_train_state(model_1, tx, batch, jax.random.key(0))
    step_1 = make_train_step(model_1, tx, loss_fn, donate=False)
    new_1, loss_1, _ = step_1(state, batch, jnp.float32(1e-3))

    model_np = PHCGNN(phm_dim=4, node_axis="ep", **kw)
    step_np = make_np_train_step(model_np, tx, loss_fn, mesh, donate=False)
    new_np, loss_np, _ = step_np(state, part, jnp.float32(1e-3))

    np.testing.assert_allclose(float(loss_1), float(loss_np), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(new_1.params),
                    jax.tree_util.tree_leaves(new_np.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-4,
                                   atol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(new_1.batch_stats),
                    jax.tree_util.tree_leaves(new_np.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-5)


def test_np_step_qbn_matches_single_device():
    """Quaternion whitening BN (per-feature 4x4 covariance, Cholesky solve)
    under halo parallelism: the cross-shard covariance psums must reproduce
    the single-device whitening exactly."""
    S = 4
    mesh = make_mesh(dp=1, ep=S)
    batch = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=3)
    part = partition_nodes(batch, S)
    kw = dict(MODEL_KW, norm_mp="q-batch-norm")

    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **kw)
    state = create_train_state(model_1, tx, batch, jax.random.key(0))
    step_1 = make_train_step(model_1, tx, loss_fn, donate=False)
    new_1, loss_1, _ = step_1(state, batch, jnp.float32(1e-3))

    model_np = PHCGNN(phm_dim=4, node_axis="ep", **kw)
    step_np = make_np_train_step(model_np, tx, loss_fn, mesh, donate=False)
    new_np, loss_np, _ = step_np(state, part, jnp.float32(1e-3))

    np.testing.assert_allclose(float(loss_1), float(loss_np), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(new_1.params),
                    jax.tree_util.tree_leaves(new_np.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-4,
                                   atol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(new_1.batch_stats),
                    jax.tree_util.tree_leaves(new_np.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-5)


def test_slot_overflow_carries_needed_sizes():
    """Undersized fixed slots raise SlotOverflow (never a bare
    AssertionError) carrying both needed sizes, and re-partitioning at those
    sizes succeeds (ADVICE r2: the trainer's rung growth catches exactly
    this)."""
    from phc_gnn_tpu.parallel.halo import SlotOverflow
    batch = synthetic_batch(batch_size=8, num_nodes=256, num_edges=512, seed=3)
    nat = partition_nodes(batch, 2)
    need_es, need_h = nat.senders.shape[1], nat.halo_send.shape[2]
    with pytest.raises(SlotOverflow) as ei:
        partition_nodes(batch, 2, edge_slots=max(need_es - 128, 128),
                        halo_slots=need_h)
    assert ei.value.needed_edge_slots == need_es
    assert ei.value.needed_halo_slots == need_h
    part = partition_nodes(batch, 2, edge_slots=ei.value.needed_edge_slots,
                           halo_slots=ei.value.needed_halo_slots)
    assert part.senders.shape[1] == need_es


def test_np_eval_matches_single_device():
    """Sharded eval under ep (VERDICT r2 weak #5): the node-parallel eval
    step (inference mode, running BN stats) must bit-match the single-device
    eval on the same state, incl. with per-shard scan plans attached."""
    from phc_gnn_tpu.parallel.halo import make_np_eval_step
    from phc_gnn_tpu.train.state import make_eval_step
    S = 8
    mesh = make_mesh(dp=1, ep=S)
    batch = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=2)

    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **MODEL_KW)
    state = create_train_state(model_1, tx, batch, jax.random.key(0))
    # one train step first so batch_stats are non-trivial
    step_1 = make_train_step(model_1, tx, loss_fn, donate=False)
    state, _, _ = step_1(state, batch, jnp.float32(1e-3))
    out_1 = make_eval_step(model_1)(state, batch)

    model_np = PHCGNN(phm_dim=4, node_axis="ep", **MODEL_KW)
    eval_np = make_np_eval_step(model_np, mesh)
    for part in (partition_nodes(batch, S),
                 partition_nodes(batch, S, scan_plan=True, scan_block=128)):
        out_np = eval_np(state, part)
        np.testing.assert_allclose(np.asarray(out_1), np.asarray(out_np),
                                   rtol=1e-5, atol=1e-6)


def test_dp_np_eval_matches_single_device():
    """(dp=2, ep=4) eval: two stacked node-partitioned batches evaluate to the
    same outputs as two single-device evals."""
    from phc_gnn_tpu.parallel import stack_batches
    from phc_gnn_tpu.parallel.halo import make_dp_np_eval_step
    from phc_gnn_tpu.train.state import make_eval_step
    mesh = make_mesh(dp=2, ep=4)
    b1 = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=3)
    b2 = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=4)

    tx = optax.chain(optax.scale(-1.0))
    model_1 = PHCGNN(phm_dim=4, **MODEL_KW)
    state = create_train_state(model_1, tx, b1, jax.random.key(0))
    ev_1 = make_eval_step(model_1)
    outs_1 = [ev_1(state, b) for b in (b1, b2)]

    # shared slot rungs so the two partitions stack to one static shape
    nat = [partition_nodes(b, 4) for b in (b1, b2)]
    es = max(p.senders.shape[1] for p in nat)
    h = max(p.halo_send.shape[2] for p in nat)
    parts = [partition_nodes(b, 4, edge_slots=es, halo_slots=h)
             for b in (b1, b2)]
    model_np = PHCGNN(phm_dim=4, node_axis="ep", **MODEL_KW)
    outs_np = make_dp_np_eval_step(model_np, mesh)(state, stack_batches(parts))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(outs_1[i]),
                                   np.asarray(outs_np[i]),
                                   rtol=1e-5, atol=1e-6)
