"""L5 harness tests: losses, evaluators, plateau scheduler, end-to-end training
on synthetic ZINC-like data with checkpoint/resume."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phc_gnn_tpu.data import ZINC_ATOM_DIMS, ZINC_BOND_DIMS, synthetic_batch
from phc_gnn_tpu.train import (
    ExperimentConfig,
    ReduceLROnPlateau,
    Trainer,
    build_model,
    get_evaluator,
)
from phc_gnn_tpu.train.loss import (
    masked_bce_with_logits,
    masked_cross_entropy,
    masked_l1,
)


# ---------------- losses ----------------

def test_masked_bce_matches_manual():
    logits = jnp.asarray([[0.5, -1.0], [2.0, 0.0]])
    targets = jnp.asarray([[1.0, np.nan], [0.0, 1.0]])
    got = float(masked_bce_with_logits(logits, targets))
    def bce(x, t):
        return max(x, 0) - x * t + np.log1p(np.exp(-abs(x)))
    want = (bce(0.5, 1) + bce(2.0, 0) + bce(0.0, 1)) / 3
    assert abs(got - want) < 1e-6


def test_masked_l1_ignores_nan():
    logits = jnp.asarray([[1.0], [2.0], [5.0]])
    targets = jnp.asarray([[0.0], [np.nan], [4.0]])
    assert abs(float(masked_l1(logits, targets)) - 1.0) < 1e-6


def test_masked_ce():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    labels = jnp.asarray([0, 0])
    mask = jnp.asarray([True, False])
    got = float(masked_cross_entropy(logits, labels, mask))
    assert got < 1e-3  # only the correct, masked-in row counts


# ---------------- evaluators ----------------

def test_rocauc_perfect_and_random():
    ev = get_evaluator("rocauc")
    y = np.array([0, 0, 1, 1], float)
    assert ev(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert ev(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert abs(ev(y, np.array([0.5, 0.5, 0.5, 0.5])) - 0.5) < 1e-9


def test_rocauc_multitask_with_nans():
    ev = get_evaluator("rocauc")
    y = np.array([[0, np.nan], [1, np.nan], [1, np.nan], [0, np.nan]])
    p = np.array([[0.2, 0.5], [0.7, 0.5], [0.9, 0.5], [0.1, 0.5]])
    assert ev(y, p) == 1.0  # column 2 skipped entirely


def test_ap_simple():
    ev = get_evaluator("ap")
    y = np.array([1, 0, 1, 0], float)
    p = np.array([0.9, 0.8, 0.7, 0.1])
    # hits at rank 1 (prec 1.0) and rank 3 (prec 2/3)
    assert abs(ev(y, p) - (1.0 + 2 / 3) / 2) < 1e-9


def test_accuracy_and_mae():
    assert get_evaluator("acc")(np.array([0, 1, 2]),
                                np.eye(3)[[0, 1, 0]]) == pytest.approx(2 / 3)
    assert get_evaluator("mae")(np.array([1.0, 2.0]),
                                np.array([2.0, 2.0])) == pytest.approx(0.5)


# ---------------- scheduler ----------------

def test_plateau_scheduler_max_mode():
    s = ReduceLROnPlateau(lr=1.0, mode="max", factor=0.5, patience=2)
    assert s.step(0.5) == 1.0       # first call sets best
    assert s.step(0.6) == 1.0       # improved
    for _ in range(2):
        assert s.step(0.4) == 1.0   # within patience
    assert s.step(0.4) == 0.5       # patience exceeded -> reduce
    s2 = ReduceLROnPlateau(lr=1e-6, mode="min", factor=0.5, patience=0,
                           min_lr=1e-6)
    s2.step(1.0)
    assert s2.step(2.0) == 1e-6     # clamped at min_lr


def test_plateau_scheduler_negative_metric_matches_torch():
    """Pin torch's rel-threshold semantics for NEGATIVE metrics: is_better uses
    best*(1+threshold) (max) / best*(1-threshold) (min) regardless of sign
    (VERDICT r1 weak #8; divergence note in PARITY.md)."""
    # max mode, negative best: bar is best*(1+t) which is MORE negative than
    # best, so a tiny regression still counts as "improved" (torch behavior).
    s = ReduceLROnPlateau(lr=1.0, mode="max", factor=0.5, patience=0,
                          threshold=1e-2)
    s.step(-1.0)
    assert s.step(-1.005) == 1.0        # > -1.01  -> improved under torch rule
    assert s.best == -1.005
    assert s.step(-1.02) == 0.5         # < -1.01495 -> bad epoch, reduce
    # min mode, negative best: bar is best*(1-t), CLOSER to zero than best,
    # so equal-or-slightly-worse values are "improved" under torch's rule.
    s = ReduceLROnPlateau(lr=1.0, mode="min", factor=0.5, patience=0,
                          threshold=1e-2)
    s.step(-1.0)
    assert s.step(-0.995) == 1.0        # < -0.99 -> improved (torch)
    assert s.step(-0.95) == 0.5         # >= best*(1-t) -> reduce

    # cross-check against the actual torch scheduler when torch is available
    torch = pytest.importorskip("torch")
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=0, threshold=1e-2)
    ours = ReduceLROnPlateau(lr=1.0, mode="max", factor=0.5, patience=0,
                             threshold=1e-2)
    for m in [-1.0, -1.005, -1.02, -1.0, -2.0, -1.9, 0.5, 0.49, 0.6]:
        ref.step(m)
        lr_ref = opt.param_groups[0]["lr"]
        lr_ours = ours.step(m)
        assert lr_ours == pytest.approx(lr_ref)


# ---------------- end-to-end training ----------------

def _providers(n_train=6, n_valid=2, bs=16):
    def train_batches(seed):
        return [synthetic_batch(batch_size=bs, num_nodes=512, num_edges=1024,
                                seed=1000 + (seed + i) % n_train)
                for i in range(n_train)]

    def valid_batches():
        return [synthetic_batch(batch_size=bs, num_nodes=512, num_edges=1024,
                                seed=77 + i) for i in range(n_valid)]

    return train_batches, valid_batches


def test_trainer_end_to_end(tmp_path):
    """Minimum end-to-end slice (SURVEY.md section 7 step 4): ZINC-like regression,
    L1 loss, Adam, jitted steps; loss must decrease and artifacts appear."""
    cfg = ExperimentConfig(
        dataset="synthetic", save_dir=str(tmp_path / "exp"), epochs=4,
        lr=3e-3, metric="mae", loss="l1", scheduler_mode="min",
        input_embed_dim=32, mp_units=(32, 32), d_units=(32, 16),
        dropout_mpnn=(0.0, 0.0), dropout_dn=(0.0, 0.0), aggr_msg="softmax",
        mlp_mp=True, target_dim=1, batch_size=16, weightdecay=0.01,
        patience=5)
    model = build_model(cfg, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    train_b, valid_b = _providers()
    trainer = Trainer(cfg, model, train_b, valid_b, test_batches=valid_b)
    summary = trainer.run()

    assert "best_val" in summary and "test_bestval" in summary
    run_dir = tmp_path / "exp" / "run_1"
    rows = [json.loads(l) for l in open(run_dir / "scalars.jsonl")]
    assert len(rows) == 4
    # training loss decreases over epochs
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
    assert np.isfinite(summary["best_val"]["mean"])
    assert (run_dir / "val_test.json").exists()
    assert (tmp_path / "exp" / "params.json").exists()
    assert (run_dir / "ckpt" / "best").exists()


def test_trainer_resume(tmp_path):
    cfg = ExperimentConfig(
        dataset="synthetic", save_dir=str(tmp_path / "exp"), epochs=2,
        lr=1e-3, metric="mae", loss="l1", scheduler_mode="min",
        input_embed_dim=16, mp_units=(16, 16), d_units=(16,),
        dropout_mpnn=(0.0, 0.0), dropout_dn=(0.0,), aggr_msg="sum",
        mlp_mp=True, target_dim=1, batch_size=8)
    model = build_model(cfg, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    train_b, valid_b = _providers(n_train=2, n_valid=1, bs=8)
    trainer = Trainer(cfg, model, train_b, valid_b)
    trainer.do_run(1)
    # resume: epochs already done -> no extra epochs, state restores cleanly
    res = trainer.do_run(1, resume=True)
    assert np.isfinite(res["best_val"])


def test_trainer_rbg_rng_trains_and_resumes(tmp_path):
    """rng_impl='rbg' (TPU hardware RNG for dropout masks): training works
    with dropout ON, the rbg-typed key round-trips through the orbax
    checkpoint on resume, and param init (threefry) is unchanged."""
    cfg = ExperimentConfig(
        dataset="synthetic", save_dir=str(tmp_path / "exp"), epochs=2,
        lr=1e-3, metric="mae", loss="l1", scheduler_mode="min",
        input_embed_dim=16, mp_units=(16, 16), d_units=(16,),
        dropout_mpnn=(0.3, 0.3), dropout_dn=(0.3,), aggr_msg="sum",
        mlp_mp=True, target_dim=1, batch_size=8, rng_impl="rbg")
    model = build_model(cfg, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    train_b, valid_b = _providers(n_train=2, n_valid=1, bs=8)
    trainer = Trainer(cfg, model, train_b, valid_b)
    res = trainer.do_run(1)
    assert np.isfinite(res["best_val"])
    res2 = trainer.do_run(1, resume=True)
    assert np.isfinite(res2["best_val"])

    # param init is rng_impl-independent (threefry init key)
    cfg_tf = dataclasses.replace(cfg, rng_impl="threefry2x32",
                                 save_dir=str(tmp_path / "exp_tf"))
    from phc_gnn_tpu.train import create_train_state, make_optimizer
    sample = next(iter(train_b(cfg.seed)))
    tx = make_optimizer(1e-3)
    for c in (cfg, cfg_tf):
        impl = c.rng_impl
        st = create_train_state(model, tx, sample,
                                jax.random.key(0, impl=impl),
                                init_rng=jax.random.key(0))
        if impl == "rbg":
            p_rbg = st.params
        else:
            p_tf = st.params
    for a, b in zip(jax.tree_util.tree_leaves(p_rbg),
                    jax.tree_util.tree_leaves(p_tf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_scan_chunk_matches_default(tmp_path):
    """scan_chunk training produces the same artifacts and sane losses."""
    common = dict(
        dataset="synthetic", epochs=2, lr=1e-3, metric="mae", loss="l1",
        scheduler_mode="min", input_embed_dim=16, mp_units=(16, 16),
        d_units=(16,), dropout_mpnn=(0.0, 0.0), dropout_dn=(0.0,),
        aggr_msg="sum", mlp_mp=True, target_dim=1, batch_size=8)
    train_b, valid_b = _providers(n_train=4, n_valid=1, bs=8)
    cfg1 = ExperimentConfig(save_dir=str(tmp_path / "a"), **common)
    cfg2 = ExperimentConfig(save_dir=str(tmp_path / "b"), scan_chunk=4,
                            **common)
    model1 = build_model(cfg1, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    model2 = build_model(cfg2, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    r1 = Trainer(cfg1, model1, train_b, valid_b).do_run(1)
    r2 = Trainer(cfg2, model2, train_b, valid_b).do_run(1)
    assert abs(r1["best_val"] - r2["best_val"]) < 1e-4


def test_rocauc_ap_match_sklearn():
    """Cross-check our numpy metric implementations against scikit-learn."""
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    for _ in range(5):
        y = (rng.random(200) > 0.7).astype(float)
        p = rng.normal(size=200)
        # inject ties
        p[::7] = p[0]
        ours_auc = get_evaluator("rocauc")(y, p)
        ours_ap = get_evaluator("ap")(y, p)
        np.testing.assert_allclose(ours_auc, sk.roc_auc_score(y, p), rtol=1e-9)
        np.testing.assert_allclose(ours_ap, sk.average_precision_score(y, p),
                                   rtol=1e-9)


def test_lr_actually_scales_adam_updates():
    """The lr passed to the train step must scale the Adam update (plateau
    scheduler efficacy — regression test for the frozen-lr bug)."""
    from phc_gnn_tpu.train import create_train_state, make_optimizer, make_train_step
    from phc_gnn_tpu.train.loss import masked_l1

    cfg_kw = dict(atom_input_dims=ZINC_ATOM_DIMS, bond_input_dims=ZINC_BOND_DIMS,
                  atom_encoded_dim=16, mp_layers=(16,), dropout_mpnn=(0.0,),
                  downstream_layers=(16,), target_dim=1, dropout_dn=(0.0,),
                  msg_aggr="sum", mlp_mp=True, norm_mp=None, norm_dn=None)
    from phc_gnn_tpu.models import PHCGNN
    model = PHCGNN(phm_dim=4, **cfg_kw)
    batch = synthetic_batch(batch_size=4, num_nodes=128, num_edges=256, seed=0)
    tx = make_optimizer(1e-3)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    step = make_train_step(model, tx, lambda o, b: masked_l1(o, b.y),
                           donate=False)

    s_big, _, _ = step(state, batch, jnp.float32(1e-2))
    s_small, _, _ = step(state, batch, jnp.float32(1e-4))

    def delta(a, b):
        return max(float(jnp.abs(x - y).max()) for x, y in
                   zip(jax.tree_util.tree_leaves(a.params),
                       jax.tree_util.tree_leaves(b.params)))

    d_big = delta(s_big, state)
    d_small = delta(s_small, state)
    assert d_big > 50 * d_small  # ~100x lr ratio -> ~100x update ratio


def test_log_weights_artifact(tmp_path):
    cfg = ExperimentConfig(
        dataset="synthetic", save_dir=str(tmp_path / "exp"), epochs=1,
        lr=1e-3, metric="mae", loss="l1", scheduler_mode="min",
        input_embed_dim=16, mp_units=(16,), d_units=(16,),
        dropout_mpnn=(0.0,), dropout_dn=(0.0,), aggr_msg="sum",
        mlp_mp=True, target_dim=1, batch_size=8, log_weights=True)
    model = build_model(cfg, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    train_b, valid_b = _providers(n_train=2, n_valid=1, bs=8)
    Trainer(cfg, model, train_b, valid_b).do_run(1)
    rows = [json.loads(l)
            for l in open(tmp_path / "exp" / "run_1" / "weights.jsonl")]
    assert len(rows) == 1
    some = next(iter(rows[0]["params"].values()))
    assert {"mean", "std", "min", "max"} <= set(some)


def test_trainer_classification_pipeline(tmp_path):
    """hiv-style pipeline: BCE loss + ROC-AUC metric + max-mode scheduler on a
    synthetic binary task (label = graph bigger than average)."""
    from phc_gnn_tpu.data import random_graph

    rng = np.random.default_rng(0)

    def make(n, seed):
        r = np.random.default_rng(seed)
        gs = [random_graph(r, target_dim=1) for _ in range(n)]
        for g in gs:
            g["y"] = np.asarray([1.0 if g["y"][0] > 0 else 0.0])
        return gs

    train_g, valid_g = make(64, 1), make(32, 2)
    from phc_gnn_tpu.data import PaddedLoader, compute_bucket_spec
    spec = compute_bucket_spec(train_g, 16, target_dim=1)

    cfg = ExperimentConfig(
        dataset="synthetic", save_dir=str(tmp_path / "exp"), epochs=3,
        lr=3e-3, metric="rocauc", loss="bce", scheduler_mode="max",
        input_embed_dim=16, mp_units=(16, 16), d_units=(16,),
        dropout_mpnn=(0.0, 0.0), dropout_dn=(0.0,), aggr_msg="softmax",
        mlp_mp=True, target_dim=1, batch_size=16)
    model = build_model(cfg, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    trainer = Trainer(cfg, model,
                      lambda s: PaddedLoader(train_g, spec, shuffle=True, seed=s),
                      lambda: PaddedLoader(valid_g, spec))
    res = trainer.do_run(1)
    # learnable signal: AUC should beat chance (loose: 3 epochs, small data)
    assert res["best_val"] > 0.55


def test_resume_restores_scheduler_and_best(tmp_path):
    """Resume must carry the reduced lr and best-val forward, not reset them."""
    cfg = ExperimentConfig(
        dataset="synthetic", save_dir=str(tmp_path / "exp"), epochs=3,
        lr=1e-2, metric="mae", loss="l1", scheduler_mode="min",
        input_embed_dim=16, mp_units=(16,), d_units=(16,),
        dropout_mpnn=(0.0,), dropout_dn=(0.0,), aggr_msg="sum",
        mlp_mp=True, target_dim=1, batch_size=8, patience=0, factor=0.5)
    model = build_model(cfg, ZINC_ATOM_DIMS, ZINC_BOND_DIMS)
    train_b, valid_b = _providers(n_train=2, n_valid=1, bs=8)
    trainer = Trainer(cfg, model, train_b, valid_b)
    trainer.do_run(1)
    import json as _json
    saved = _json.load(open(tmp_path / "exp" / "run_1" / "trainer_state.json"))
    assert np.isfinite(saved["best_val"])
    # resume: finished run evaluates with restored state; saved lr persists
    trainer2 = Trainer(cfg, model, train_b, valid_b)
    res = trainer2.do_run(1, resume=True)
    assert np.isfinite(res["best_val"])
    saved2 = _json.load(open(tmp_path / "exp" / "run_1" / "trainer_state.json"))
    assert saved2["lr"] == saved["lr"]


def test_grad_accum_step_equals_dp_step():
    """grad_accum is dp over time: one accumulated step over [b1, b2] must
    equal the dp=2 step on the same pair (identical weighted-mean gradient,
    loss, and BN-stat combination)."""
    import optax
    from phc_gnn_tpu.data import synthetic_batch
    from phc_gnn_tpu.models import PHCGNN
    from phc_gnn_tpu.parallel import make_dp_train_step, make_mesh, \
        shard_batch, stack_batches
    from phc_gnn_tpu.train.loss import masked_l1
    from phc_gnn_tpu.train.state import create_train_state, \
        make_accum_train_step

    loss_fn = lambda out, b: masked_l1(out, b.y)  # noqa: E731
    kw = dict(atom_input_dims=[28], atom_encoded_dim=16, bond_input_dims=[4],
              mp_layers=(16, 16), downstream_layers=(16, 8), target_dim=1,
              dropout_mpnn=(0.0, 0.0), dropout_dn=(0.0, 0.0))
    model = PHCGNN(phm_dim=4, **kw)
    b1 = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=1)
    b2 = synthetic_batch(batch_size=6, num_nodes=160, num_edges=384, seed=2)
    tx = optax.chain(optax.scale(-1.0))
    state = create_train_state(model, tx, b1, jax.random.key(0))

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), b1, b2)
    accum = make_accum_train_step(model, tx, loss_fn, donate=False,
                                  loss_name="l1")
    new_a, loss_a, outs_a = accum(state, stacked, jnp.float32(1e-3))
    assert outs_a.shape[0] == 2

    mesh = make_mesh(dp=2, ep=1)
    dp_step = make_dp_train_step(model, tx, loss_fn, mesh, donate=False,
                                 loss_name="l1")
    new_d, loss_d, outs_d = dp_step(
        state, shard_batch(stack_batches([b1, b2]), mesh), jnp.float32(1e-3))

    np.testing.assert_allclose(float(loss_a), float(loss_d), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_a.params),
                    jax.tree_util.tree_leaves(new_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_a.batch_stats),
                    jax.tree_util.tree_leaves(new_d.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_grad_accum_cli_converges(tmp_path):
    import json
    import os
    import sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    from common import run_benchmark
    save = str(tmp_path / "syn")
    run_benchmark("synthetic", [
        "--input_embed_dim", "16", "--mp_units", "16,16", "--d_units", "16,8",
        "--batch_size", "8", "--n_runs", "1", "--seed", "0",
        "--dropout_mpnn", "0.0,0.0", "--dropout_dn", "0.0,0.0",
        "--grad_accum", "2", "--epochs", "3", "--save_dir", save])
    rows = [json.loads(l) for l in
            open(os.path.join(save, "run_1", "scalars.jsonl"))]
    assert len(rows) == 3
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
