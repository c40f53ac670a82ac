"""Full-pipeline trained-convergence parity vs the ACTUAL reference (VERDICT
r3 #1).

Runs the reference's own training loop — `benchmarks.train_zinc.do_run` /
`benchmarks.train_hiv.do_run` imported from /root/reference, torch on CPU,
through tests/pyg_shim — and our CLI (`benchmarks/train_zinc.py` /
`train_hiv.py`) end to end on the SAME committed deterministic synthetic
molecular dataset (phc_gnn_tpu/data/parity.py), from the SAME initial weights
(reference init transplanted into our params via --init_from), with the same
hyperparameters, for >= 30 epochs each.  Writes a `record.json` per task with
both sides' per-epoch validation trajectories and best-val/test metrics;
tests/test_convergence_parity_record.py pins the committed records against
stated tolerances.

Usage:
    python scripts/run_convergence_parity.py --task zinc [--smoke]
    python scripts/run_convergence_parity.py --task hiv  [--smoke]
"""

import argparse
import glob
import json
import os
import pickle
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("PHC_REFERENCE", "/root/reference")
SHIM = os.path.join(REPO, "tests", "pyg_shim")
# `benchmarks` must resolve to the REFERENCE package in this process (ours is
# only ever run as a subprocess), so REF goes ahead of REPO.
sys.path[:0] = [SHIM, REF, REPO, os.path.join(REPO, "tests")]
# the orchestrator itself only needs jax for the weight transplant — force it
# off the TPU so transplant arrays never ride the tunnel.  The axon
# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS latched,
# so the env-var route is too late; config.update post-import works as long
# as no backend has initialized (same pattern as tests/conftest.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

# torch >= 2.7 removed ReduceLROnPlateau's no-op `verbose` kwarg; the
# reference (torch 1.7 era) passes verbose=True (train_zinc.py:300-302).
# Re-accept and drop it — semantics unchanged (it only printed messages).
_SchedBase = torch.optim.lr_scheduler.ReduceLROnPlateau


class _PlateauCompat(_SchedBase):
    def __init__(self, *a, verbose=False, **k):
        super().__init__(*a, **k)


torch.optim.lr_scheduler.ReduceLROnPlateau = _PlateauCompat

# torch >= 2.6 flipped torch.load's weights_only default to True, which
# rejects the reference's whole-module checkpoints (train_zinc.py:390
# torch.save(model)).  This runner only ever loads files it just wrote.
_torch_load = torch.load


def _load_compat(*a, **k):
    k.setdefault("weights_only", False)
    return _torch_load(*a, **k)


torch.load = _load_compat

# Shared hyperparameters per task.  zinc-like follows run_script_zinc_phm4.sh
# (sum aggregation, GINE MLP, sc_type last, dropout only downstream, wd 0.01,
# factor 0.5); hiv-like follows run_script_hiv_phm4.sh (softmax aggregation,
# soft-attention pooling, dropout 0.2/0.3, wd 0.1, factor 0.75).  Widths are
# scaled ~1/2 from canonical so the torch-CPU side stays minutes, not hours.
#
# Round 5 adds the two model families the first three records left uncovered
# (VERDICT r4 #4):
#   - "concat": PHMSkipConnectConcat (reference models.py:271 — the
#     dim-growth skip path).  Trained through the reference's own pcba-style
#     masked-BCE loop: with ref target_dim=2 the concat downstream's
#     documented dim quirk (models.py:411 passes phm_dim*target_dim, so the
#     model emits phm_dim*2 = 8 real logits) lines the output up with the
#     8-task parity labels; our side runs --type concat --target_dim 8
#     (forward parity: test_concat_softmax_linear).  The only repair applied
#     to the reference class is the established divergence-#8 one-line
#     reshape fix (fixed_concat) without which phm_dim>1 crashes outright.
#   - "quat": QuaternionSkipConnectAdd with the whitening 'q-batch-norm'
#     (quaternion/undirectional/models.py:25, quaternion/norm.py:104-276) —
#     exercises the running-covariance dynamics end to end; ours is
#     PHCGNN(n=4) with --norm_mp q-batch-norm (forward parity:
#     test_quaternion_add_whitening_bn).
#
# Per-config keys: "script" picks the reference training script family
# (loss/evaluator plumbing); "family" picks the model class;
# "ref_target_dim" (default target_dim) is what the reference constructor
# gets; "model_type"/"norm_mp"/"norm_dn" are forwarded to our CLI.
HPARAMS = {
    "zinc": dict(phm_dim=4, input_embed_dim=96, mp_units="96,96,96",
                 d_units="96,48", mlp_mp=True, aggr_msg="sum",
                 aggr_node="sum", sc_type="last", pooling="softattention",
                 dropout_mpnn="0.0,0.0,0.0", dropout_dn="0.2,0.1",
                 weightdecay=0.01, weightdecay2=0.0, regularization=2,
                 grad_clipping=2.0, lr=1e-3, patience=5, factor=0.5,
                 batch_size=128, epochs=40, seed=0, min_lr=1e-6,
                 atom_dims=[28], bond_dims=[4], target_dim=1,
                 metric="mae", mode="min"),
    "pcba": dict(phm_dim=2, input_embed_dim=64, mp_units="64,64",
                 d_units="96,48", mlp_mp=False, aggr_msg="sum",
                 aggr_node="sum", sc_type="last", pooling="softattention",
                 dropout_mpnn="0.1,0.1", dropout_dn="0.3,0.1",
                 weightdecay=1e-4, weightdecay2=0.0, regularization=2,
                 grad_clipping=2.0, lr=1e-3, patience=5, factor=0.75,
                 batch_size=128, epochs=30, seed=0, min_lr=1e-6,
                 atom_dims=[119, 5, 12, 12, 10, 6, 6, 2, 2],
                 bond_dims=[5, 6, 2], target_dim=8,
                 metric="ap", mode="max"),
    "hiv": dict(phm_dim=4, input_embed_dim=96, mp_units="96,96",
                d_units="64,32", mlp_mp=True, aggr_msg="softmax",
                aggr_node="softmax", sc_type="first", pooling="softattention",
                dropout_mpnn="0.2,0.2", dropout_dn="0.3,0.1",
                weightdecay=0.1, weightdecay2=0.0, regularization=2,
                grad_clipping=2.0, lr=1e-3, patience=5, factor=0.75,
                batch_size=128, epochs=35, seed=0, min_lr=1e-6,
                atom_dims=[119, 5, 12, 12, 10, 6, 6, 2, 2],
                bond_dims=[5, 6, 2], target_dim=1,
                metric="rocauc", mode="max"),
    "concat": dict(script="pcba", family="phm-concat", phm_dim=4,
                   input_embed_dim=48, mp_units="48,48", d_units="64,32",
                   mlp_mp=False, aggr_msg="softmax", aggr_node="softmax",
                   sc_type="first", pooling="softattention",
                   dropout_mpnn="0.1,0.1", dropout_dn="0.3,0.1",
                   weightdecay=1e-4, weightdecay2=0.0, regularization=2,
                   grad_clipping=2.0, lr=1e-3, patience=5, factor=0.75,
                   batch_size=128, epochs=30, seed=0, min_lr=1e-6,
                   atom_dims=[119, 5, 12, 12, 10, 6, 6, 2, 2],
                   bond_dims=[5, 6, 2], ref_target_dim=2, target_dim=8,
                   model_type="concat", metric="ap", mode="max"),
    "quat": dict(script="zinc", family="quat-add", phm_dim=4,
                 input_embed_dim=96, mp_units="96,96,96", d_units="96,48",
                 mlp_mp=True, aggr_msg="sum", aggr_node="sum",
                 sc_type="first", pooling="softattention",
                 dropout_mpnn="0.0,0.0,0.0", dropout_dn="0.2,0.1",
                 weightdecay=0.01, weightdecay2=0.0, regularization=2,
                 grad_clipping=2.0, lr=1e-3, patience=5, factor=0.5,
                 batch_size=128, epochs=40, seed=0, min_lr=1e-6,
                 atom_dims=[28], bond_dims=[4], target_dim=1,
                 norm_mp="q-batch-norm", norm_dn="naive-batch-norm",
                 metric="mae", mode="min"),
}

# family -> the reference CLI's --type string (train_hiv.py:65-66 choices);
# do_run's regularization branch keys off it ("quaternion" in args.type ->
# quaternion_weight_regularization, else phm_weight_regularization)
REF_TYPE = {"phm-add": "undirectional-phm-sc-add",
            "phm-concat": "undirectional-phm-sc-cat",
            "quat-add": "undirectional-quaternion-sc-add"}


def build_ref_model(task, hp):
    """Construct the reference model exactly as its main() would
    (train_zinc.py:537-600 kwargs), for whichever of the three covered
    families hp selects."""
    family = hp.get("family", "phm-add")
    if family == "quat-add":
        from phc.quaternion.undirectional.models import \
            QuaternionSkipConnectAdd

        return QuaternionSkipConnectAdd(
            atom_input_dims=hp["atom_dims"],
            atom_encoded_dim=hp["input_embed_dim"],
            bond_input_dims=hp["bond_dims"], naive_encoder=False,
            init="quaternion", same_dropout=False,
            mp_layers=[int(v) for v in hp["mp_units"].split(",")],
            dropout_mpnn=[float(v) for v in hp["dropout_mpnn"].split(",")],
            norm_mp=hp["norm_mp"], add_self_loops=True,
            msg_aggr=hp["aggr_msg"], node_aggr=hp["aggr_node"],
            mlp=hp["mlp_mp"], pooling=hp["pooling"], activation="relu",
            real_trafo="linear",
            downstream_layers=[int(v) for v in hp["d_units"].split(",")],
            target_dim=hp["target_dim"],
            dropout_dn=[float(v) for v in hp["dropout_dn"].split(",")],
            norm_dn=hp["norm_dn"], msg_encoder="identity",
            initial_beta=1.0, learn_beta=True)
    if family == "phm-concat":
        from phc.hypercomplex.undirectional.models import \
            PHMSkipConnectConcat

        from test_full_model_parity import fixed_concat

        cls = fixed_concat(PHMSkipConnectConcat)
        return cls(
            phm_dim=hp["phm_dim"], learn_phm=True, phm_rule=None,
            atom_input_dims=hp["atom_dims"],
            atom_encoded_dim=hp["input_embed_dim"],
            bond_input_dims=hp["bond_dims"], naive_encoder=False,
            mp_layers=[int(v) for v in hp["mp_units"].split(",")],
            dropout_mpnn=[float(v) for v in hp["dropout_mpnn"].split(",")],
            w_init="phm", c_init="standard", same_dropout=False,
            norm_mp="naive-batch-norm", add_self_loops=True,
            msg_aggr=hp["aggr_msg"], node_aggr=hp["aggr_node"],
            mlp=hp["mlp_mp"], pooling=hp["pooling"], activation="relu",
            real_trafo="linear",
            downstream_layers=[int(v) for v in hp["d_units"].split(",")],
            target_dim=hp.get("ref_target_dim", hp["target_dim"]),
            dropout_dn=[float(v) for v in hp["dropout_dn"].split(",")],
            norm_dn="naive-batch-norm", msg_encoder="identity",
            aggregators=["mean", "min", "max", "std"],
            scalers=["identity", "amplification", "attenuation"], deg=None,
            post_layers=1, msg_scalers=False, initial_beta=1.0,
            learn_beta=True)

    from phc.hypercomplex.undirectional.models import PHMSkipConnectAdd

    return PHMSkipConnectAdd(
        phm_dim=hp["phm_dim"], learn_phm=True, phm_rule=None,
        atom_input_dims=hp["atom_dims"],
        atom_encoded_dim=hp["input_embed_dim"],
        bond_input_dims=hp["bond_dims"], naive_encoder=False,
        mp_layers=[int(v) for v in hp["mp_units"].split(",")],
        dropout_mpnn=[float(v) for v in hp["dropout_mpnn"].split(",")],
        w_init="phm", c_init="standard", same_dropout=False,
        norm_mp="naive-batch-norm", add_self_loops=True,
        msg_aggr=hp["aggr_msg"], node_aggr=hp["aggr_node"],
        mlp=hp["mlp_mp"], pooling=hp["pooling"], activation="relu",
        real_trafo="linear",
        downstream_layers=[int(v) for v in hp["d_units"].split(",")],
        target_dim=hp["target_dim"],
        dropout_dn=[float(v) for v in hp["dropout_dn"].split(",")],
        norm_dn="naive-batch-norm", msg_encoder="identity",
        sc_type=hp["sc_type"],
        aggregators=["mean", "min", "max", "std"],
        scalers=["identity", "amplification", "attenuation"], deg=None,
        post_layers=1, msg_scalers=False, initial_beta=1.0, learn_beta=True)


def to_data_list(graphs, script):
    """npz graph dicts -> shim torch_geometric Data objects, with the y shape
    each reference script expects (zinc: (1,) dense scalar, train_zinc.py:193;
    hiv: (1, 1) possibly-NaN task matrix, train_hiv.py:174)."""
    from torch_geometric.data import Data

    out = []
    for g in graphs:
        y = torch.from_numpy(np.asarray(g["y"], np.float32))
        if script in ("hiv", "pcba"):
            y = y.reshape(1, -1)
        out.append(Data(x=torch.from_numpy(g["x"]),
                        edge_index=torch.from_numpy(g["edge_index"]),
                        edge_attr=torch.from_numpy(g["edge_attr"]),
                        y=y))
    return out


def ref_args(task, hp, save_dir):
    """The reference's own argparse namespace (get_parser with patched argv):
    do_run reads seed/n_runs/lr/patience/factor/epochs/... from it."""
    script = hp.get("script", task)
    mod = __import__(f"benchmarks.train_{script}", fromlist=["get_parser"])
    argv = ["prog",
            "--type", REF_TYPE[hp.get("family", "phm-add")],
            "--save_dir", save_dir,
            "--n_runs", "1",
            "--seed", str(hp["seed"]),
            "--batch_size", str(hp["batch_size"]),
            "--phm_dim", str(hp["phm_dim"]),
            "--input_embed_dim", str(hp["input_embed_dim"]),
            "--mp_units", hp["mp_units"],
            "--d_units", hp["d_units"],
            "--mlp_mp", str(hp["mlp_mp"]),
            "--dropout_mpnn", hp["dropout_mpnn"],
            "--dropout_dn", hp["dropout_dn"],
            "--weightdecay", str(hp["weightdecay"]),
            "--weightdecay2", str(hp["weightdecay2"]),
            "--regularization", str(hp["regularization"]),
            "--grad_clipping", str(hp["grad_clipping"]),
            "--lr", str(hp["lr"]),
            "--patience", str(hp["patience"]),
            "--factor", str(hp["factor"]),
            "--epochs", str(hp["epochs"]),
            "--aggr_msg", hp["aggr_msg"],
            "--aggr_node", hp["aggr_node"],
            "--sc_type", hp["sc_type"],
            "--pooling", hp["pooling"],
            "--log_weights", "False",
            ]
    if script == "zinc":
        argv += ["--min_lr", str(hp["min_lr"]), "--max_time", "100"]
    old = sys.argv
    try:
        sys.argv = argv
        return mod, mod.get_parser()
    finally:
        sys.argv = old


def run_reference(task, hp, data, out_dir):
    """set_seed_all + reset_parameters (exactly do_run's own re-init), pin the
    reference's uninitialized bias element, transplant init for our side, then
    hand everything to the reference's actual do_run."""
    from benchmarks.utils import CustomRemoveIsolatedNodes, set_seed_all
    from torch_geometric.data import DataLoader

    from test_full_model_parity import (_pin_uninit_biases, q_transplant,
                                        transplant)

    script = hp.get("script", task)
    family = hp.get("family", "phm-add")
    ref_dir = os.path.join(out_dir, "reference")
    os.makedirs(ref_dir, exist_ok=True)
    mod, args = ref_args(task, hp, ref_dir)

    model = build_ref_model(task, hp)
    # do_run re-seeds with args.seed + i - 1 and calls reset_parameters —
    # replaying that here makes the transplanted init IDENTICAL to the init
    # do_run will produce (the pinned uninit bias element lives in storage the
    # reset does not touch, so it survives do_run's re-init; quaternion
    # layers initialize every element, so pinning is a no-op there)
    set_seed_all(hp["seed"])
    model.reset_parameters()
    _pin_uninit_biases(model)
    if family == "quat-add":
        init = q_transplant(
            model, atom_dims=hp["atom_dims"], bond_dims=hp["bond_dims"],
            aggr=hp["aggr_msg"], mlp=hp["mlp_mp"], pooling=hp["pooling"])
    else:
        init = transplant(
            model, n=hp["phm_dim"], atom_dims=hp["atom_dims"],
            bond_dims=hp["bond_dims"], aggr=hp["aggr_msg"], mlp=hp["mlp_mp"],
            pooling=hp["pooling"], norm_mp="naive-batch-norm",
            norm_dn="naive-batch-norm")
    init = __import__("jax").tree_util.tree_map(
        lambda a: np.array(a), init)
    init_path = os.path.join(out_dir, "init_params.pkl")
    with open(init_path, "wb") as f:
        pickle.dump(init, f)

    train_loader = DataLoader(to_data_list(data["train"], script),
                              batch_size=hp["batch_size"], shuffle=True)
    valid_loader = DataLoader(to_data_list(data["valid"], script),
                              batch_size=hp["batch_size"])
    test_loader = DataLoader(to_data_list(data["test"], script),
                             batch_size=hp["batch_size"])
    device = torch.device("cpu")
    t0 = time.time()
    if script == "zinc":
        evaluator = mod.Evaluator()
        mod.do_run(1, model, args, None, train_loader, valid_loader,
                   test_loader, device, evaluator, t0)
    else:
        from ogb.graphproppred import Evaluator
        evaluator = Evaluator({"hiv": "ogbg-molhiv",
                               "pcba": "ogbg-molpcba"}[script])
        mod.do_run(1, model, args, CustomRemoveIsolatedNodes(), train_loader,
                   valid_loader, test_loader, device, evaluator)
    print(f"[reference] {task} done in {time.time() - t0:.0f}s")

    run_dir = os.path.join(ref_dir, "run_1")
    with open(os.path.join(run_dir, "arrays.pickle"), "rb") as f:
        arrays = pickle.load(f)
    with open(os.path.join(run_dir, "val_test.json")) as f:
        val_test = json.load(f)
    key = evaluator.eval_metric
    # torch checkpoints (whole pickled modules) and TB event files are run
    # byproducts, not record material — drop them before committing
    for p in glob.glob(os.path.join(run_dir, "model*.pt")) + \
            glob.glob(os.path.join(run_dir, "events.out.tfevents*")):
        os.remove(p)
    return init_path, {
        "val_metric": [m[key] for m in arrays["val_metrics"]],
        "train_loss": [m["loss"] for m in arrays["train_metrics"]],
        "lr": arrays["lr"],
        "best_val": val_test["best_val"],
        "test_bestval": val_test["test_best_valEpoch"],
        "test_last": val_test["test_lastEpoch"],
    }


def run_ours(task, hp, data_root, out_dir, init_path, platform):
    ours_dir = os.path.join(out_dir, "ours")
    shutil.rmtree(ours_dir, ignore_errors=True)
    # platform=cpu must survive the axon sitecustomize's startup jax import
    # (env vars are latched by then) — wrap the CLI in a config.update
    launcher = ("import jax, sys, runpy; "
                + ("jax.config.update('jax_platforms', 'cpu'); "
                   if platform == "cpu" else "")
                + "sys.argv = sys.argv[1:]; "
                  "runpy.run_path(sys.argv[0], run_name='__main__')")
    script = hp.get("script", task)
    argv = [sys.executable, "-c", launcher,
            os.path.join("benchmarks", f"train_{script}.py"),
            "--data_root", data_root,
            "--save_dir", ours_dir,
            "--init_from", init_path,
            "--n_runs", "1",
            "--seed", str(hp["seed"]),
            "--batch_size", str(hp["batch_size"]),
            "--phm_dim", str(hp["phm_dim"]),
            "--input_embed_dim", str(hp["input_embed_dim"]),
            "--mp_units", hp["mp_units"],
            "--d_units", hp["d_units"],
            "--mlp_mp", str(hp["mlp_mp"]),
            "--dropout_mpnn", hp["dropout_mpnn"],
            "--dropout_dn", hp["dropout_dn"],
            "--weightdecay", str(hp["weightdecay"]),
            "--weightdecay2", str(hp["weightdecay2"]),
            "--regularization", str(hp["regularization"]),
            "--grad_clipping", str(hp["grad_clipping"]),
            "--lr", str(hp["lr"]),
            "--patience", str(hp["patience"]),
            "--factor", str(hp["factor"]),
            "--epochs", str(hp["epochs"]),
            "--min_lr", str(hp["min_lr"]),
            "--aggr_msg", hp["aggr_msg"],
            "--aggr_node", hp["aggr_node"],
            "--sc_type", hp["sc_type"],
            "--pooling", hp["pooling"],
            "--target_dim", str(hp.get("target_dim", 1)),
            ]
    # family extras: concat model type / whitening norms (our CLI flags)
    if "model_type" in hp:
        argv += ["--type", hp["model_type"]]
    if "norm_mp" in hp:
        argv += ["--norm_mp", hp["norm_mp"]]
    if "norm_dn" in hp:
        argv += ["--norm_dn", hp["norm_dn"]]
    env = dict(os.environ)
    env.pop("PHC_DATA_ROOT", None)
    t0 = time.time()
    subprocess.run(argv, cwd=REPO, env=env, check=True)
    print(f"[ours] {task} done in {time.time() - t0:.0f}s")

    run_dir = os.path.join(ours_dir, "run_1")
    rows = [json.loads(l) for l in open(os.path.join(run_dir,
                                                     "scalars.jsonl"))]
    with open(os.path.join(run_dir, "val_test.json")) as f:
        val_test = json.load(f)
    shutil.rmtree(os.path.join(run_dir, "ckpt"), ignore_errors=True)
    return {
        "val_metric": [r["valid_metric"] for r in rows],
        "train_loss": [r["train_loss"] for r in rows],
        "lr": [r["lr"] for r in rows],
        "best_val": val_test["best_val"],
        "test_bestval": val_test["test_bestval"],
        "test_last": val_test["test_last"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["zinc", "hiv", "pcba", "concat",
                                       "quat"],
                    required=True)
    ap.add_argument("--out", default=os.path.join(REPO, "parity_runs"))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dataset + 3 epochs: plumbing check only")
    ap.add_argument("--ours_platform", default="cpu", choices=["cpu", "tpu"],
                    help="backend for our CLI subprocess (record runs use "
                         "cpu for reproducibility independent of the tunnel)")
    args = ap.parse_args()

    from phc_gnn_tpu.data.parity import generate_parity_dataset, \
        make_parity_graphs

    hp = dict(HPARAMS[args.task])
    splits = None
    if args.smoke:
        splits = {"train": 200, "valid": 64, "test": 64}
        hp["epochs"] = 3
    out_dir = os.path.join(args.out, args.task + ("_smoke" if args.smoke
                                                  else ""))
    os.makedirs(out_dir, exist_ok=True)
    data_task = hp.get("script", args.task)  # dataset family = loss family
    data_root = os.path.join(out_dir, "data")
    generate_parity_dataset(data_task, data_root, seed=7, splits=splits)
    data = make_parity_graphs(data_task, seed=7, splits=splits)

    init_path, ref_rec = run_reference(args.task, hp, data, out_dir)
    ours_rec = run_ours(args.task, hp, data_root, out_dir, init_path,
                        args.ours_platform)

    record = {"task": args.task, "hparams": {k: v for k, v in hp.items()},
              "dataset": {k: len(v) for k, v in data.items()},
              "generator_seed": 7,
              "reference": ref_rec, "ours": ours_rec}
    rec_path = os.path.join(out_dir, "record.json")
    with open(rec_path, "w") as f:
        json.dump(record, f, indent=2)
    # raw dataset files are regenerable from the committed generator — don't
    # bloat the repo with them
    shutil.rmtree(data_root, ignore_errors=True)

    print(f"record -> {rec_path}")
    print(f"{'epoch':>5} {'ref_val':>10} {'ours_val':>10}")
    for i, (a, b) in enumerate(zip(ref_rec["val_metric"],
                                   ours_rec["val_metric"])):
        print(f"{i:>5} {a:>10.4f} {b:>10.4f}")
    print(f"best_val       ref {ref_rec['best_val']:.4f}   "
          f"ours {ours_rec['best_val']:.4f}")
    print(f"test_bestval   ref {ref_rec['test_bestval']:.4f}   "
          f"ours {ours_rec['test_bestval']:.4f}")
    print(f"test_last      ref {ref_rec['test_last']:.4f}   "
          f"ours {ours_rec['test_last']:.4f}")


if __name__ == "__main__":
    main()
