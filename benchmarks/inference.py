"""Standalone inference: load a trained run's best checkpoint and evaluate the
test split (reference: benchmarks/inference.ipynb).

Usage: python benchmarks/inference.py <dataset> --save_dir experiments/<ds> \
           --run 1 --data_root <dir>
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from benchmarks.common import (config_from_args, get_parser, label_dim,
                               load_splits)
from phc_gnn_tpu.data import PaddedLoader, compute_bucket_spec
from phc_gnn_tpu.train import (
    CheckpointManager,
    Trainer,
    build_model,
    create_train_state,
    make_optimizer,
)


def main():
    dataset = sys.argv[1]
    parser = get_parser(dataset)
    parser.add_argument("--run", type=int, default=1)
    args = parser.parse_args(sys.argv[2:])
    cfg = config_from_args(dataset, args)

    splits, atom_dims, bond_dims, transform = load_splits(dataset, args.data_root)
    bucket = compute_bucket_spec(splits["test"], cfg.batch_size,
                                 target_dim=label_dim(cfg))

    def batches():
        return PaddedLoader(splits["test"], bucket, transform=transform)

    model = build_model(cfg, atom_dims, bond_dims)
    tx = make_optimizer(cfg.lr)
    sample = next(iter(batches()))
    state = create_train_state(model, tx, sample, jax.random.key(0))

    run_dir = os.path.join(cfg.save_dir, f"run_{args.run}")
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    slim = {"params": state.params, "batch_stats": state.batch_stats}
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), slim)
    restored = ckpt.restore_best(abstract)
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"])

    trainer = Trainer(cfg, model, lambda s: batches(), batches, batches)
    result = trainer.evaluate(state, batches())
    print(json.dumps({"dataset": dataset, "run": args.run, **result}))


if __name__ == "__main__":
    main()
