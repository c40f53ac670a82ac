"""Benchmark CLI smoke test: full train_zinc.py flow on a tiny synthetic npz
dataset written in the documented schema."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from phc_gnn_tpu.data import random_graph


def _write_npz(dirpath, name, n_graphs, seed):
    rng = np.random.default_rng(seed)
    graphs = [random_graph(rng, target_dim=1) for _ in range(n_graphs)]
    node_ptr, edge_ptr = [0], [0]
    xs, eis, eas, ys = [], [], [], []
    for g in graphs:
        xs.append(g["x"])
        eis.append(g["edge_index"] + node_ptr[-1])
        eas.append(g["edge_attr"])
        ys.append(np.asarray(g["y"]).reshape(-1))
        node_ptr.append(node_ptr[-1] + g["x"].shape[0])
        edge_ptr.append(edge_ptr[-1] + g["edge_index"].shape[1])
    np.savez(os.path.join(dirpath, name),
             x=np.concatenate(xs), edge_index=np.concatenate(eis, axis=1),
             edge_attr=np.concatenate(eas), y=np.stack(ys),
             node_ptr=np.asarray(node_ptr), edge_ptr=np.asarray(edge_ptr))


@pytest.fixture
def zinc_root(tmp_path):
    _write_npz(tmp_path, "zinc_train.npz", 24, 0)
    _write_npz(tmp_path, "zinc_valid.npz", 8, 1)
    _write_npz(tmp_path, "zinc_test.npz", 8, 2)
    return str(tmp_path)


def test_train_zinc_cli(zinc_root, tmp_path):
    save = str(tmp_path / "exp")
    from benchmarks.common import run_benchmark
    summary = run_benchmark("zinc", [
        "--data_root", zinc_root, "--save_dir", save,
        "--epochs", "2", "--batch_size", "8",
        "--input_embed_dim", "16", "--mp_units", "16,16",
        "--d_units", "16", "--dropout_mpnn", "0.0,0.0",
        "--dropout_dn", "0.0", "--lr", "1e-3"])
    assert np.isfinite(summary["best_val"]["mean"])
    assert os.path.exists(os.path.join(save, "params.json"))
    assert os.path.exists(os.path.join(save, "run_1", "val_test.json"))
    rows = [json.loads(l)
            for l in open(os.path.join(save, "run_1", "scalars.jsonl"))]
    assert len(rows) == 2


def test_parser_defaults_match_reference_semantics():
    from benchmarks.common import get_parser
    args = get_parser("hiv").parse_args([])
    assert args.aggr_msg == "softmax" and args.phm_dim == 4
    # reference train_hiv.py parser defaults
    assert args.weightdecay == 0.001
    assert args.dropout_mpnn == (0.3, 0.1) and args.d_units == (128, 32)
    args_z = get_parser("zinc").parse_args(["--mp_units", "64,64"])
    assert args_z.mp_units == (64, 64)
    assert args_z.sc_type == "last" and args_z.aggr_msg == "sum"
    assert args_z.input_embed_dim == 180 and args_z.batch_size == 256
    args_p = get_parser("pcba").parse_args([])
    assert args_p.phm_dim == 2
    assert args_p.d_units == (768, 256)
    args_ppa = get_parser("ppa").parse_args([])
    assert args_ppa.input_embed_dim == 500 and args_ppa.batch_size == 64


def test_all_dataset_configs_build_models():
    """Every dataset's default config must construct and initialize its model
    (catches dim/dropout/aggregation config mismatches without data)."""
    import jax
    from benchmarks.common import config_from_args, get_parser
    from phc_gnn_tpu.data import synthetic_batch
    from phc_gnn_tpu.data.features import (
        ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS, MNIST_ATOM_DIM, MNIST_BOND_DIM,
        PPA_EDGE_DIM, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    from phc_gnn_tpu.train import build_model

    dims = {
        "zinc": (ZINC_ATOM_DIMS, ZINC_BOND_DIMS),
        "hiv": (ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS),
        "pcba": (ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS),
        "ppa": ([1], PPA_EDGE_DIM),
        "mnist": (MNIST_ATOM_DIM, MNIST_BOND_DIM),
        "cifar10": (5, 1),
        "synthetic": (ZINC_ATOM_DIMS, ZINC_BOND_DIMS),
    }
    for ds, (atom, bond) in dims.items():
        args = get_parser(ds).parse_args([])
        cfg = config_from_args(ds, args)
        # shrink for test speed but keep layer structure
        cfg.input_embed_dim = 2 * cfg.phm_dim
        cfg.mp_units = tuple([cfg.input_embed_dim] * len(cfg.mp_units))
        cfg.d_units = (2 * cfg.phm_dim,)
        cfg.dropout_dn = (0.0,)
        model = build_model(cfg, atom, bond)
        nf = 1 if not isinstance(atom, (list, tuple)) else len(atom)
        ef = 1 if not isinstance(bond, (list, tuple)) else 1
        batch = synthetic_batch(batch_size=4, num_nodes=128, num_edges=256,
                                seed=0, target_dim=cfg.target_dim,
                                num_node_feats=nf,
                                num_atom_types=2, num_bond_types=2)
        if not isinstance(atom, (list, tuple)):
            batch = batch.replace(nodes=batch.nodes.astype("float32"))
        if not isinstance(bond, (list, tuple)):
            batch = batch.replace(edges=batch.edges.astype("float32"))
        variables = model.init(jax.random.key(0), batch, training=False)
        out = model.apply(variables, batch, training=False)
        assert out.shape == (batch.num_graphs, cfg.target_dim), ds


def test_ce_dataset_end_to_end(tmp_path):
    """mnist-style CE flow: scalar class labels, multi-class logits — the
    bucket stores label width 1 while the model emits target_dim classes."""
    import numpy as np
    from phc_gnn_tpu.data import random_graph

    rng = np.random.default_rng(0)

    def write(name, n, seed):
        r = np.random.default_rng(seed)
        graphs = [random_graph(r, target_dim=1) for _ in range(n)]
        node_ptr, edge_ptr = [0], [0]
        xs, eis, eas, ys, poss = [], [], [], [], []
        for g in graphs:
            x = r.random((g["x"].shape[0], 1)).astype(np.float32)
            xs.append(x)
            eis.append(g["edge_index"] + node_ptr[-1])
            eas.append(r.random((g["edge_index"].shape[1], 1)).astype(np.float32))
            ys.append(np.asarray([int(g["x"].shape[0] % 3)]))
            poss.append(r.random((x.shape[0], 2)).astype(np.float32))
            node_ptr.append(node_ptr[-1] + x.shape[0])
            edge_ptr.append(edge_ptr[-1] + g["edge_index"].shape[1])
        np.savez(tmp_path / name, x=np.concatenate(xs),
                 edge_index=np.concatenate(eis, axis=1),
                 edge_attr=np.concatenate(eas), y=np.stack(ys),
                 node_ptr=np.asarray(node_ptr), edge_ptr=np.asarray(edge_ptr),
                 pos=np.concatenate(poss))

    write("mnist_train.npz", 24, 1)
    write("mnist_valid.npz", 8, 2)
    write("mnist_test.npz", 8, 3)
    from benchmarks.common import run_benchmark
    summary = run_benchmark("mnist", [
        "--data_root", str(tmp_path), "--save_dir", str(tmp_path / "exp"),
        "--epochs", "1", "--batch_size", "8", "--input_embed_dim", "8",
        "--mp_units", "8,8", "--d_units", "8", "--dropout_mpnn", "0.0,0.0",
        "--dropout_dn", "0.0", "--target_dim", "3"])
    assert np.isfinite(summary["best_val"]["mean"])


def test_inference_cli_restores_best(tmp_path, zinc_root):
    """Train briefly, then run the inference entry point against the best
    export; its metric must match the training run's test@bestval."""
    save = str(tmp_path / "exp")
    from benchmarks.common import run_benchmark
    summary = run_benchmark("zinc", [
        "--data_root", zinc_root, "--save_dir", save,
        "--epochs", "2", "--batch_size", "8", "--input_embed_dim", "16",
        "--mp_units", "16,16", "--d_units", "16", "--dropout_mpnn", "0.0,0.0",
        "--dropout_dn", "0.0", "--lr", "1e-3"])

    import io
    from contextlib import redirect_stdout
    import benchmarks.inference as inf
    buf = io.StringIO()
    argv = sys.argv
    try:
        sys.argv = ["inference.py", "zinc", "--data_root", zinc_root,
                    "--save_dir", save, "--run", "1",
                    "--input_embed_dim", "16", "--mp_units", "16,16",
                    "--d_units", "16", "--dropout_mpnn", "0.0,0.0",
                    "--dropout_dn", "0.0"]
        with redirect_stdout(buf):
            inf.main()
    finally:
        sys.argv = argv
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["dataset"] == "zinc"
    np.testing.assert_allclose(result["mae"],
                               summary["test_bestval"]["mean"], rtol=1e-4)


def test_scan_chunk_with_stream_kernel(tmp_path):
    """scan_chunk (multi-step jit scanning) composes with --agg_kernel stream
    (scan-plan-carrying batches): the plan arrays stack/scan like any other
    batch field and training converges."""
    from benchmarks.common import run_benchmark
    save = str(tmp_path / "sc_stream")
    summary = run_benchmark("synthetic", [
        "--input_embed_dim", "16", "--mp_units", "16,16", "--d_units", "16,8",
        "--batch_size", "8", "--n_runs", "1", "--seed", "0",
        "--dropout_mpnn", "0.0,0.0", "--dropout_dn", "0.0,0.0",
        "--scan_chunk", "4", "--aggr_msg", "softmax",
        "--agg_kernel", "stream", "--epochs", "2", "--save_dir", save])
    assert np.isfinite(summary["best_val"]["mean"])
    rows = [json.loads(l)
            for l in open(os.path.join(save, "run_1", "scalars.jsonl"))]
    assert len(rows) == 2 and rows[-1]["train_loss"] < rows[0]["train_loss"]


def test_profile_steps_writes_trace(tmp_path):
    """--profile_steps K captures a jax.profiler trace of the first K train
    steps into run_dir/profile (SURVEY 5.1 first-class profiling)."""
    from benchmarks.common import run_benchmark
    save = str(tmp_path / "prof")
    run_benchmark("synthetic", [
        "--epochs", "1", "--batch_size", "8", "--input_embed_dim", "16",
        "--mp_units", "16,16", "--d_units", "16", "--dropout_mpnn", "0,0",
        "--dropout_dn", "0", "--profile_steps", "2", "--scan_chunk", "0",
        "--n_runs", "1", "--save_dir", save])
    pdir = os.path.join(save, "run_1", "profile")
    found = [f for _, _, fs in os.walk(pdir) for f in fs]
    assert any(f.endswith(".xplane.pb") for f in found), found


def test_pcba_canonical_recipe_is_the_measured_one():
    """The canonical pcba invocation must run the measured-fastest recipe
    (KERNELS.md round-4 pcba table: grad_accum 4 x 128-graph 4096n/8192e
    sub-batches = 2.18 M edges/s, vs 1.24 M for one 16384n bucket) — both in
    DATASET_DEFAULTS and in the committed launcher, so they cannot drift
    from the measurement (VERDICT r4 weak #5)."""
    from benchmarks.common import get_parser

    args = get_parser("pcba").parse_args([])
    assert args.grad_accum == 4 and args.batch_size == 128
    assert args.max_nodes == 4096 and args.max_edges == 8192
    assert args.eval_batch_size == 512  # eval path has no accumulation
    # logical optimizer batch stays the reference's 512 graphs
    assert args.grad_accum * args.batch_size == 512

    sh = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "run_script_pcba_phm2.sh")
    text = open(sh).read()
    for flag in ("--grad_accum 4", "--batch_size 128", "--max_nodes 4096",
                 "--max_edges 8192", "--eval_batch_size 512"):
        assert flag in text, flag
