"""Generate the committed tiny dataset fixtures under tests/fixtures/.

Two fixtures, byte-identical in SCHEMA to the real datasets' on-disk layouts
(so the exact production code paths run against them):

1. ``tests/fixtures/ogbg_molhiv/`` — the official OGB graph-prop-pred raw
   layout (raw/*.csv.gz + split/scaffold/*.csv.gz), exactly what
   ``ogb.graphproppred.PygGraphPropPredDataset`` materializes on disk
   (reference loads it at benchmarks/train_hiv.py:459).  12 handcrafted
   molecule-like graphs with valid OGB atom (9-col) / bond (3-col)
   categorical features, both edge directions stored, binary labels.
2. ``tests/fixtures/zinc_{train,valid,test}.npz`` — the npz schema of
   scripts/convert_pyg_dataset.py for ZINC-subset (28 atom / 4 bond types,
   float regression target).

Deterministic (seeded); rerunning reproduces the committed bytes.
Usage: python scripts/make_fixtures.py
"""

from __future__ import annotations

import gzip
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(os.path.dirname(HERE), "tests", "fixtures")

# OGB vocab sizes (phc_gnn_tpu/data/features.py): keep every entry in range
ATOM_DIMS = [119, 5, 12, 12, 10, 6, 6, 2, 2]
BOND_DIMS = [5, 6, 2]


def _ring(n):
    s = np.arange(n)
    return np.stack([s, (s + 1) % n])


def _chain(n):
    s = np.arange(n - 1)
    return np.stack([s, s + 1])


def _star(n):
    leaves = np.arange(1, n)
    return np.stack([np.zeros(n - 1, np.int64), leaves])


def make_graphs(rng, num, kind="ogb"):
    graphs = []
    topo = [(_ring, 6), (_chain, 4), (_star, 5), (_ring, 5), (_chain, 7),
            (_ring, 8), (_star, 4), (_chain, 3)]
    for i in range(num):
        fn, n = topo[i % len(topo)]
        ei = fn(n)
        # undirected: store both directions like OGB raw edge.csv.gz
        ei = np.concatenate([ei, ei[::-1]], axis=1)
        e = ei.shape[1]
        if kind == "ogb":
            x = np.stack([rng.integers(0, d, size=n) for d in ATOM_DIMS], 1)
            ea = np.stack([rng.integers(0, d, size=e) for d in BOND_DIMS], 1)
        else:  # zinc
            x = rng.integers(0, 28, size=(n, 1))
            ea = rng.integers(0, 4, size=(e, 1))
        graphs.append({"x": x.astype(np.int64), "edge_index": ei.astype(np.int64),
                       "edge_attr": ea.astype(np.int64)})
    return graphs


def write_csv_gz(path, arr):
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    lines = "\n".join(",".join(_fmt(v) for v in row) for row in arr)
    # fixed mtime=0 so regeneration is byte-identical
    with open(path, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write((lines + "\n").encode())


def _fmt(v):
    if np.isnan(float(v)):
        return ""  # OGB raw csv stores missing multi-task labels as empty
    if float(v) == int(v):
        return str(int(v))
    return repr(float(v))


def write_ogb_fixture():
    rng = np.random.default_rng(7)
    graphs = make_graphs(rng, 12, "ogb")
    # labels: star/ring parity-ish binary labels, deterministic
    labels = np.asarray([[i % 2] for i in range(len(graphs))], np.int64)

    root = os.path.join(FIXDIR, "ogbg_molhiv")
    raw = os.path.join(root, "raw")
    split = os.path.join(root, "split", "scaffold")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    write_csv_gz(os.path.join(raw, "edge.csv.gz"),
                 np.concatenate([g["edge_index"].T for g in graphs]))
    write_csv_gz(os.path.join(raw, "node-feat.csv.gz"),
                 np.concatenate([g["x"] for g in graphs]))
    write_csv_gz(os.path.join(raw, "edge-feat.csv.gz"),
                 np.concatenate([g["edge_attr"] for g in graphs]))
    write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                 [g["x"].shape[0] for g in graphs])
    write_csv_gz(os.path.join(raw, "num-edge-list.csv.gz"),
                 [g["edge_index"].shape[1] for g in graphs])
    write_csv_gz(os.path.join(raw, "graph-label.csv.gz"), labels)
    write_csv_gz(os.path.join(split, "train.csv.gz"), np.arange(0, 8))
    write_csv_gz(os.path.join(split, "valid.csv.gz"), np.arange(8, 10))
    write_csv_gz(os.path.join(split, "test.csv.gz"), np.arange(10, 12))
    print("wrote", root)


def write_zinc_fixture():
    rng = np.random.default_rng(11)
    for part, num in (("train", 8), ("valid", 2), ("test", 2)):
        graphs = make_graphs(rng, num, "zinc")
        node_ptr = np.cumsum([0] + [g["x"].shape[0] for g in graphs])
        edge_ptr = np.cumsum([0] + [g["edge_index"].shape[1] for g in graphs])
        x = np.concatenate([g["x"] for g in graphs])
        # npz schema stores edge_index with GLOBAL node ids (reader subtracts
        # the node offset back off)
        ei = np.concatenate(
            [g["edge_index"] + node_ptr[i] for i, g in enumerate(graphs)],
            axis=1)
        ea = np.concatenate([g["edge_attr"] for g in graphs])
        # regression target: simple deterministic structural stat + noise-free
        y = np.asarray([[g["x"].shape[0] - 0.5 * g["edge_index"].shape[1] / 2]
                        for g in graphs], np.float32)
        np.savez(os.path.join(FIXDIR, f"zinc_{part}.npz"),
                 x=x, edge_index=ei, edge_attr=ea, y=y,
                 node_ptr=node_ptr.astype(np.int64),
                 edge_ptr=edge_ptr.astype(np.int64))
        print("wrote", os.path.join(FIXDIR, f"zinc_{part}.npz"))


def write_pcba_fixture():
    """ogbg-molpcba raw layout: 128-task labels with NaN holes (empty csv
    cells, like the real dataset — reference benchmarks/train_pcba.py)."""
    rng = np.random.default_rng(13)
    graphs = make_graphs(rng, 12, "ogb")
    n_tasks = 128
    labels = rng.integers(0, 2, size=(len(graphs), n_tasks)).astype(np.float32)
    holes = rng.random((len(graphs), n_tasks)) < 0.5
    labels[holes] = np.nan
    # every task keeps at least one positive and one negative somewhere so
    # the AP metric is defined on the fixture
    labels[0] = 1.0
    labels[1] = 0.0

    root = os.path.join(FIXDIR, "ogbg_molpcba")
    raw = os.path.join(root, "raw")
    split = os.path.join(root, "split", "scaffold")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)
    write_csv_gz(os.path.join(raw, "edge.csv.gz"),
                 np.concatenate([g["edge_index"].T for g in graphs]))
    write_csv_gz(os.path.join(raw, "node-feat.csv.gz"),
                 np.concatenate([g["x"] for g in graphs]))
    write_csv_gz(os.path.join(raw, "edge-feat.csv.gz"),
                 np.concatenate([g["edge_attr"] for g in graphs]))
    write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                 [g["x"].shape[0] for g in graphs])
    write_csv_gz(os.path.join(raw, "num-edge-list.csv.gz"),
                 [g["edge_index"].shape[1] for g in graphs])
    write_csv_gz(os.path.join(raw, "graph-label.csv.gz"), labels)
    write_csv_gz(os.path.join(split, "train.csv.gz"), np.arange(0, 8))
    write_csv_gz(os.path.join(split, "valid.csv.gz"), np.arange(8, 10))
    write_csv_gz(os.path.join(split, "test.csv.gz"), np.arange(10, 12))
    print("wrote", root)


def write_ppa_fixture():
    """ogbg-ppa raw layout: NO node-feat file, continuous 7-dim edge
    features, integer species-class labels, split/species/ (reference
    benchmarks/train_ppa.py:158-187 derives node features from edges)."""
    rng = np.random.default_rng(17)
    graphs = make_graphs(rng, 12, "ogb")
    n_classes = 5  # tiny stand-in for ppa's 37; target_dim comes from the CLI

    root = os.path.join(FIXDIR, "ogbg_ppa")
    raw = os.path.join(root, "raw")
    split = os.path.join(root, "split", "species")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)
    write_csv_gz(os.path.join(raw, "edge.csv.gz"),
                 np.concatenate([g["edge_index"].T for g in graphs]))
    # continuous edge features, quantized so the csv round-trips exactly
    efeat = np.round(rng.random(
        (sum(g["edge_index"].shape[1] for g in graphs), 7)), 4)
    write_csv_gz(os.path.join(raw, "edge-feat.csv.gz"),
                 efeat.astype(np.float32))
    write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                 [g["x"].shape[0] for g in graphs])
    write_csv_gz(os.path.join(raw, "num-edge-list.csv.gz"),
                 [g["edge_index"].shape[1] for g in graphs])
    write_csv_gz(os.path.join(raw, "graph-label.csv.gz"),
                 np.asarray([[i % n_classes] for i in range(len(graphs))]))
    write_csv_gz(os.path.join(split, "train.csv.gz"), np.arange(0, 8))
    write_csv_gz(os.path.join(split, "valid.csv.gz"), np.arange(8, 10))
    write_csv_gz(os.path.join(split, "test.csv.gz"), np.arange(10, 12))
    print("wrote", root)


def write_cifar10_fixture():
    """CIFAR10-superpixel npz splits: continuous RGB x [n,3] + pos [n,2]
    (concat_x_pos -> 5 = CIFAR10_ATOM_DIM), float edge_attr [e,1], integer
    class labels (reference benchmarks/train_cifar10.py)."""
    rng = np.random.default_rng(19)
    for part, num in (("train", 8), ("valid", 2), ("test", 2)):
        graphs = make_graphs(rng, num, "zinc")
        node_ptr = np.cumsum([0] + [g["x"].shape[0] for g in graphs])
        edge_ptr = np.cumsum([0] + [g["edge_index"].shape[1] for g in graphs])
        total_n = int(node_ptr[-1])
        x = np.round(rng.random((total_n, 3)), 4).astype(np.float32)
        pos = np.round(rng.random((total_n, 2)), 4).astype(np.float32)
        ei = np.concatenate(
            [g["edge_index"] + node_ptr[i] for i, g in enumerate(graphs)],
            axis=1)
        ea = np.round(rng.random((int(edge_ptr[-1]), 1)), 4).astype(np.float32)
        y = np.asarray([[i % 10] for i in range(num)], np.int64)
        np.savez(os.path.join(FIXDIR, f"cifar10_{part}.npz"),
                 x=x, edge_index=ei, edge_attr=ea, y=y, pos=pos,
                 node_ptr=node_ptr.astype(np.int64),
                 edge_ptr=edge_ptr.astype(np.int64))
        print("wrote", os.path.join(FIXDIR, f"cifar10_{part}.npz"))


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    write_ogb_fixture()
    write_zinc_fixture()
    write_pcba_fixture()
    write_ppa_fixture()
    write_cifar10_fixture()
