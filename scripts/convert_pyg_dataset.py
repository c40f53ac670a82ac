"""Convert PyG datasets (ZINC, GNNBenchmarkDataset MNIST/CIFAR10) to the npz
schema read by phc_gnn_tpu.data.datasets.load_npz_dataset.

Run on any machine with torch_geometric installed:

    python scripts/convert_pyg_dataset.py zinc /data/pyg /data/phc
    python scripts/convert_pyg_dataset.py mnist /data/pyg /data/phc
    python scripts/convert_pyg_dataset.py cifar10 /data/pyg /data/phc
"""

from __future__ import annotations

import sys

import numpy as np


def convert(name: str, pyg_root: str, out_dir: str):
    import torch_geometric.datasets as D

    name = name.lower()
    splits = {}
    if name == "zinc":
        for part, pyg_split in (("train", "train"), ("valid", "val"),
                                ("test", "test")):
            splits[part] = D.ZINC(pyg_root, subset=True, split=pyg_split)
    elif name in ("mnist", "cifar10"):
        for part, pyg_split in (("train", "train"), ("valid", "val"),
                                ("test", "test")):
            splits[part] = D.GNNBenchmarkDataset(pyg_root, name.upper(),
                                                 split=pyg_split)
    else:
        raise SystemExit(f"unknown dataset {name}")

    for part, ds in splits.items():
        xs, eis, eas, ys, poss = [], [], [], [], []
        node_ptr, edge_ptr = [0], [0]
        for data in ds:
            xs.append(np.asarray(data.x))
            ei = np.asarray(data.edge_index)
            eis.append(ei + node_ptr[-1])
            ea = np.asarray(data.edge_attr)
            eas.append(ea if ea.ndim == 2 else ea[:, None])
            ys.append(np.asarray(data.y).reshape(-1))
            if getattr(data, "pos", None) is not None:
                poss.append(np.asarray(data.pos))
            node_ptr.append(node_ptr[-1] + data.num_nodes)
            edge_ptr.append(edge_ptr[-1] + ei.shape[1])
        out = dict(
            x=np.concatenate(xs), edge_index=np.concatenate(eis, axis=1),
            edge_attr=np.concatenate(eas), y=np.stack(ys),
            node_ptr=np.asarray(node_ptr), edge_ptr=np.asarray(edge_ptr))
        if poss:
            out["pos"] = np.concatenate(poss)
        np.savez_compressed(f"{out_dir}/{name}_{part}.npz", **out)
        print(f"wrote {out_dir}/{name}_{part}.npz ({len(ds)} graphs)")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2], sys.argv[3])
