"""Multi-chip training through the benchmark harness (VERDICT r1 #4).

Runs the real ``run_benchmark`` CLI path under --dp/--ep on the 8-device
virtual CPU mesh (tests/conftest.py), checking convergence, artifact schema
parity with single-chip, --resume plumbing, and the exactness of the
load-weighted DP reductions (a fully-masked dummy pad shard contributes
nothing)."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from common import run_benchmark  # noqa: E402


SMALL = [
    "--input_embed_dim", "16", "--mp_units", "16,16", "--d_units", "16,8",
    "--batch_size", "8", "--n_runs", "1", "--seed", "0",
    "--dropout_mpnn", "0.0,0.0", "--dropout_dn", "0.0,0.0",
    "--scan_chunk", "0", "--aggr_msg", "softmax",
]


def _scalars(save_dir):
    path = os.path.join(save_dir, "run_1", "scalars.jsonl")
    return [json.loads(l) for l in open(path)]


def test_dp_ep_synthetic_run_converges(tmp_path):
    """Full synthetic training on a (dp=4, ep=2) mesh via the CLI; loss must
    drop and the artifact schema must match single-chip exactly."""
    save = str(tmp_path / "syn")
    summary = run_benchmark("synthetic", SMALL + [
        "--dp", "4", "--ep", "2", "--epochs", "3", "--save_dir", save])
    rows = _scalars(save)
    assert len(rows) == 3
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
    for key in ("epoch", "lr", "train_loss", "train_metric", "valid_loss",
                "valid_metric", "steps_per_s", "edges_per_s"):
        assert key in rows[0], rows[0]
    vt = json.load(open(os.path.join(save, "run_1", "val_test.json")))
    assert set(vt) == {"best_val", "test_bestval", "test_last"}
    assert all(np.isfinite(v) for v in vt.values())
    assert np.isfinite(summary["best_val"]["mean"])


def test_dp_resume_continues_epoch_count(tmp_path):
    """--resume picks up at the checkpointed epoch: 2 epochs then a resumed
    invocation to 4 yields exactly 4 scalars rows with contiguous epochs."""
    save = str(tmp_path / "syn")
    args = SMALL + ["--dp", "2", "--save_dir", save]
    run_benchmark("synthetic", args + ["--epochs", "2"])
    assert len(_scalars(save)) == 2
    run_benchmark("synthetic", args + ["--epochs", "4", "--resume"])
    rows = _scalars(save)
    assert [r["epoch"] for r in rows] == [0, 1, 2, 3]


def test_weighted_dp_step_ignores_dummy_shard():
    """A dp=2 step where shard 2 is a fully-masked dummy must equal the
    single-device step on the real batch alone (the load-weighted reductions
    give the dummy zero weight)."""
    from phc_gnn_tpu.data.synthetic import synthetic_batch
    from phc_gnn_tpu.models.phc_gnn import PHCGNN
    from phc_gnn_tpu.parallel import (
        make_dp_train_step,
        make_dummy_batch,
        make_mesh,
        shard_batch,
        stack_batches,
    )
    from phc_gnn_tpu.train.loss import masked_l1
    from phc_gnn_tpu.train.optim import make_optimizer
    from phc_gnn_tpu.train.state import create_train_state, make_train_step

    loss_fn = lambda out, batch: masked_l1(out, batch.y)  # noqa: E731
    kw = dict(atom_input_dims=[28], atom_encoded_dim=16, bond_input_dims=[4],
              mp_layers=(16, 16), downstream_layers=(16, 8), target_dim=1,
              dropout_mpnn=(0.0, 0.0), dropout_dn=(0.0, 0.0),
              norm_mp=None, norm_dn=None)
    model = PHCGNN(phm_dim=4, **kw)
    batch = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=5)
    tx = make_optimizer(1e-3)
    state = create_train_state(model, tx, batch, jax.random.key(0))

    step_1 = make_train_step(model, tx, loss_fn, donate=False)
    new_1, loss_1, _ = step_1(state, batch, jnp.float32(1e-3))

    mesh = make_mesh(dp=2, ep=1)
    step_dp = make_dp_train_step(model, tx, loss_fn, mesh, donate=False,
                                 loss_name="l1")
    stacked = shard_batch(stack_batches([batch, make_dummy_batch(batch)]),
                          mesh)
    new_dp, loss_dp, outs = step_dp(state, stacked, jnp.float32(1e-3))

    np.testing.assert_allclose(float(loss_1), float(loss_dp), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_1.params),
                    jax.tree_util.tree_leaves(new_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(new_1.batch_stats),
                    jax.tree_util.tree_leaves(new_dp.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_ep_only_harness_run(tmp_path):
    """ep-only (no dp) through the CLI: the edge-sharded model trains and
    evaluates (eval via the axis-free twin)."""
    save = str(tmp_path / "syn")
    summary = run_benchmark("synthetic", SMALL + [
        "--ep", "2", "--epochs", "2", "--save_dir", save])
    rows = _scalars(save)
    assert len(rows) == 2
    assert np.isfinite(summary["best_val"]["mean"])


def test_ep_harness_run_with_stream_kernel(tmp_path):
    """--agg_kernel stream under halo ep through the CLI: the trainer attaches
    per-shard scan plans (interpret-mode kernel on CPU) and training still
    converges."""
    save = str(tmp_path / "syn")
    summary = run_benchmark("synthetic", SMALL + [
        "--ep", "2", "--epochs", "2", "--agg_kernel", "stream",
        "--save_dir", save])
    rows = _scalars(save)
    assert len(rows) == 2
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
    assert np.isfinite(summary["best_val"]["mean"])


def test_halo_rung_growth_mid_group(tmp_path):
    """When a later member of a dp group needs bigger halo/edge slots than the
    partition rungs chosen for the first member, the whole group must be
    repacked to the grown static shapes (inside the prefetch thread).  Batch A
    has many tiny graphs (small boundary cuts); batch B has two ~60-node
    graphs that straddle shard boundaries (large cuts) — same padded shapes."""
    import numpy as np
    from phc_gnn_tpu.data.synthetic import random_graph
    from phc_gnn_tpu.graph.batch import batch_graphs
    from phc_gnn_tpu.parallel import partition_nodes
    from phc_gnn_tpu.train import ExperimentConfig, Trainer
    from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS

    def clique_graph(n, rng):
        s, r = np.meshgrid(np.arange(n), np.arange(n))
        keep = s != r
        ei = np.stack([s[keep], r[keep]]).astype(np.int32)
        return {"x": rng.integers(0, 28, (n, 1)).astype(np.int32),
                "edge_index": ei,
                "edge_attr": rng.integers(0, 4, (ei.shape[1], 1)).astype(
                    np.int32),
                "y": np.asarray([0.3], np.float32)}

    def make(dense, seed):
        rng = np.random.default_rng(seed)
        if dense:  # one 30-clique: 870 directed edges land in ONE shard
            graphs = [clique_graph(30, rng), clique_graph(4, rng)]
        else:      # sparse small graphs: per-shard edge counts ~200
            graphs = [random_graph(rng, mean_nodes=8) for _ in range(8)]
        return batch_graphs(graphs, num_nodes=192, num_edges=1024,
                            num_graphs=9, y_shape=(1,))

    batches = [make(False, 0), make(True, 1),   # group 1: grows mid-group
               make(False, 2), make(True, 3)]   # group 2: stays on the rungs
    # precondition: the dense batch genuinely exceeds the sparse batch's
    # 512-edge rung in some shard (otherwise this test is vacuous)
    need_sparse = partition_nodes(batches[0], 2).senders.shape[1]
    need_dense = partition_nodes(batches[1], 2).senders.shape[1]
    assert need_sparse <= 512 < need_dense, (need_sparse, need_dense)

    cfg = ExperimentConfig(
        dataset="synthetic", save_dir=str(tmp_path / "exp"), epochs=2,
        lr=1e-3, metric="mae", loss="l1", scheduler_mode="min",
        input_embed_dim=16, mp_units=(16, 16), d_units=(16,),
        dropout_mpnn=(0.0, 0.0), dropout_dn=(0.0,), aggr_msg="softmax",
        mlp_mp=True, target_dim=1, batch_size=8, dp=2, ep=2,
        agg_kernel="stream")

    from benchmarks.common import build_model
    model = build_model(cfg, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    trainer = Trainer(cfg, model, lambda seed: list(batches),
                      lambda: [batches[0]])
    res = trainer.do_run(1)
    assert np.isfinite(res["best_val"])


def test_dp_groups_compose_with_bucket_ladder():
    """_dp_groups queues mixed-shape batches per shape key (VERDICT r2 #6):
    every real batch appears exactly once, every yielded group has uniform
    leaf shapes, and epoch-end partial groups are dummy-padded to dp."""
    from phc_gnn_tpu.data.synthetic import synthetic_batch
    from phc_gnn_tpu.train.config import ExperimentConfig
    from phc_gnn_tpu.train.trainer import Trainer

    def mk(n, e, seed):
        return synthetic_batch(batch_size=4, num_nodes=n, num_edges=e,
                               seed=seed)

    # shapes A, B, A, B, A  (two bucket rungs interleaved)
    stream = [mk(128, 256, 0), mk(112, 224, 1), mk(128, 256, 2),
              mk(112, 224, 3), mk(128, 256, 4)]
    # _dp_groups reads self.dp and delegates to the shared self._groups
    self = type("T", (), {"dp": 2, "_groups": Trainer._groups})()
    out = list(Trainer._dp_groups(self, iter(stream)))
    assert len(out) == 3
    for real, group in out:
        assert len(group) == 2
        shapes = {tuple(l.shape for l in jax.tree_util.tree_leaves(b))
                  for b in group}
        assert len(shapes) == 1, "group mixes bucket shapes"
    # identity-level accounting: every real batch exactly once
    seen = [b for real, _ in out for b in real]
    assert len(seen) == 5 and {id(b) for b in seen} == {id(b) for b in stream}
    # the partial A-group got one dummy pad
    real, full = out[-1]
    assert len(real) == 1 and len(full) == 2
    assert not bool(np.asarray(full[1].graph_mask).any())


def test_dp_with_bucket_ladder_cli_converges(tmp_path):
    """dp=2 with --sub_buckets 3 through the CLI: the ladder's mixed bucket
    shapes train without the r2 uniform-shape ValueError and converge."""
    save = str(tmp_path / "syn")
    summary = run_benchmark("synthetic", SMALL + [
        "--dp", "2", "--epochs", "3", "--sub_buckets", "3",
        "--save_dir", save])
    rows = _scalars(save)
    assert len(rows) == 3
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
    assert np.isfinite(summary["best_val"]["mean"])


def test_profile_steps_under_ep(tmp_path):
    """--profile_steps now traces the shard_map'd step under dp/ep instead of
    skipping (VERDICT r2 weak #5): the trace directory must exist and contain
    a captured trace."""
    save = str(tmp_path / "syn")
    run_benchmark("synthetic", SMALL + [
        "--ep", "2", "--epochs", "1", "--profile_steps", "2",
        "--save_dir", save])
    prof = os.path.join(save, "run_1", "profile")
    assert os.path.isdir(prof)
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert found, "profiler trace wrote no files"


def test_profile_steps_under_dp_ep(tmp_path):
    save = str(tmp_path / "syn")
    run_benchmark("synthetic", SMALL + [
        "--dp", "2", "--ep", "2", "--epochs", "1", "--profile_steps", "1",
        "--save_dir", save])
    prof = os.path.join(save, "run_1", "profile")
    assert os.path.isdir(prof)


@pytest.mark.parametrize("axes", [["--dp", "2"], ["--ep", "2"],
                                  ["--dp", "2", "--ep", "2"]])
def test_scan_chunk_composes_with_mesh(tmp_path, axes):
    """--scan_chunk now drives whole same-shape chunks through ONE shard_map
    dispatch under dp/ep (VERDICT r2 weak #6).  The scanned run's loss
    trajectory must match the per-step-dispatch run: same collective step
    body, only the dispatch granularity differs."""
    base = SMALL + axes + ["--epochs", "2"]
    save0 = str(tmp_path / "nochunk")
    save1 = str(tmp_path / "chunk")
    run_benchmark("synthetic", base + ["--scan_chunk", "0",
                                       "--save_dir", save0])
    run_benchmark("synthetic", base + ["--scan_chunk", "3",
                                       "--save_dir", save1])
    rows0, rows1 = _scalars(save0), _scalars(save1)
    assert len(rows0) == len(rows1) == 2
    for r0, r1 in zip(rows0, rows1):
        np.testing.assert_allclose(r0["train_loss"], r1["train_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(r0["valid_metric"], r1["valid_metric"],
                                   rtol=1e-5)
