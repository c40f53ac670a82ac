"""Dataset readers for the six reference benchmarks — dependency-free parsers.

This environment has no ogb / torch_geometric packages and no network egress,
so each reader parses the dataset's *standard on-disk format* from a local
directory (point ``root`` at a pre-downloaded copy):

- OGB graph-prop-pred (ogbg-molhiv / ogbg-molpcba / ogbg-ppa): the official
  ``raw/*.csv.gz`` layout (edge.csv.gz, node-feat.csv.gz, edge-feat.csv.gz,
  num-node-list.csv.gz, num-edge-list.csv.gz, graph-label.csv.gz) plus
  ``split/<name>/{train,valid,test}.csv.gz``.  This is exactly what
  ``ogb.graphproppred.PygGraphPropPredDataset`` downloads (reference:
  train_hiv.py:459).
- ZINC-subset / MNIST / CIFAR10 superpixels: a simple ``.npz`` per-split schema
  (documented below) convertible from the PyG datasets with
  ``scripts/convert_pyg_dataset.py`` on any machine that has PyG.

All readers return ``{"train": [graph...], "valid": [...], "test": [...]}``
with graphs as dicts {"x", "edge_index", "edge_attr", "y", ["pos"]}.
"""

from __future__ import annotations

import csv
import gzip
import io
import os
from typing import Dict, List, Optional

import numpy as np

__all__ = ["load_ogb_graphproppred", "load_npz_dataset", "dataset_stats",
           "degree_histogram"]


def _read_csv_gz(path: str, dtype=np.int64) -> np.ndarray:
    """Read a (possibly gzipped) headerless numeric csv into a 2-D array."""
    opener = gzip.open if path.endswith(".gz") else open
    rows: List[List[float]] = []
    with opener(path, "rt", newline="") as f:
        for row in csv.reader(f):
            if row:
                rows.append([float(v) if v not in ("", "nan") else np.nan
                             for v in row])
    arr = np.asarray(rows)
    # cast to the integer dtype only when the data is genuinely integral
    # (ogbg-ppa ships continuous float edge features in the same layout)
    if not np.isnan(arr).any() and np.array_equal(arr, np.round(arr)):
        arr = arr.astype(dtype)
    return arr


def _first_existing(*paths):
    for p in paths:
        if os.path.exists(p):
            return p
    return None


def load_ogb_graphproppred(root: str, split_name: str = "scaffold",
                           undirected_already: bool = True) -> Dict[str, List[dict]]:
    """Parse an OGB graph-property-prediction dataset directory.

    ``root`` is the dataset dir containing ``raw/`` and ``split/``
    (e.g. <data>/ogbg_molhiv).  Edge lists in OGB raw files already contain
    both directions for molecular graphs.
    """
    raw = os.path.join(root, "raw")
    if not os.path.isdir(raw):
        raise FileNotFoundError(
            f"OGB raw dir not found at {raw}; download the dataset with the "
            "ogb package elsewhere and point root at it")
    edges = _read_csv_gz(os.path.join(raw, "edge.csv.gz"), np.int32)
    num_nodes = _read_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                             np.int64).ravel()
    num_edges = _read_csv_gz(os.path.join(raw, "num-edge-list.csv.gz"),
                             np.int64).ravel()
    labels = _read_csv_gz(os.path.join(raw, "graph-label.csv.gz"), np.float32)
    node_feat_p = _first_existing(os.path.join(raw, "node-feat.csv.gz"))
    edge_feat_p = _first_existing(os.path.join(raw, "edge-feat.csv.gz"))
    node_feat = (_read_csv_gz(node_feat_p, np.int32)
                 if node_feat_p else None)
    edge_feat = (_read_csv_gz(edge_feat_p, np.int32)
                 if edge_feat_p else None)

    graphs: List[dict] = []
    n_off = e_off = 0
    for n, e in zip(num_nodes, num_edges):
        n, e = int(n), int(e)
        ei = edges[e_off:e_off + e].T.astype(np.int32)  # [2, e]
        g = {
            "x": (node_feat[n_off:n_off + n] if node_feat is not None
                  else np.zeros((n, 1), np.int32)),
            "edge_index": ei,
            "edge_attr": (edge_feat[e_off:e_off + e] if edge_feat is not None
                          else np.zeros((e, 1), np.int32)),
            "y": labels[len(graphs)],
        }
        graphs.append(g)
        n_off += n
        e_off += e

    split_dir = os.path.join(root, "split", split_name)
    out: Dict[str, List[dict]] = {}
    for part in ("train", "valid", "test"):
        idx = _read_csv_gz(os.path.join(split_dir, f"{part}.csv.gz"),
                           np.int64).ravel()
        out[part] = [graphs[int(i)] for i in idx]
    return out


def load_npz_dataset(root: str, name: str) -> Dict[str, List[dict]]:
    """Load the npz per-split schema written by scripts/convert_pyg_dataset.py:

    <root>/<name>_{train,valid,test}.npz with arrays:
      x           [total_nodes, Fx]      node features
      edge_index  [2, total_edges]      graph-local after offset subtraction
      edge_attr   [total_edges, Fe]
      y           [num_graphs, T]
      node_ptr    [num_graphs + 1]
      edge_ptr    [num_graphs + 1]
      pos         [total_nodes, 2]      (optional, superpixels)
    """
    out: Dict[str, List[dict]] = {}
    for part in ("train", "valid", "test"):
        path = os.path.join(root, f"{name}_{part}.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing; create it with scripts/convert_pyg_dataset.py")
        z = np.load(path, allow_pickle=False)
        node_ptr, edge_ptr = z["node_ptr"], z["edge_ptr"]
        graphs = []
        for gi in range(len(node_ptr) - 1):
            nlo, nhi = int(node_ptr[gi]), int(node_ptr[gi + 1])
            elo, ehi = int(edge_ptr[gi]), int(edge_ptr[gi + 1])
            g = {
                "x": z["x"][nlo:nhi],
                "edge_index": z["edge_index"][:, elo:ehi] - nlo,
                "edge_attr": z["edge_attr"][elo:ehi],
                "y": z["y"][gi],
            }
            if "pos" in z:
                g["pos"] = z["pos"][nlo:nhi]
            graphs.append(g)
        out[part] = graphs
    return out


def dataset_stats(graphs: List[dict]) -> dict:
    n = np.asarray([g["x"].shape[0] for g in graphs])
    e = np.asarray([g["edge_index"].shape[1] for g in graphs])
    return {"num_graphs": len(graphs), "nodes_mean": float(n.mean()),
            "nodes_max": int(n.max()), "edges_mean": float(e.mean()),
            "edges_max": int(e.max())}


def degree_histogram(graphs: List[dict], max_degree: int = 64) -> np.ndarray:
    """In-degree histogram for PNA avg_deg statistics
    (reference: train scripts' deg computation for pna)."""
    hist = np.zeros(max_degree + 1, np.int64)
    for g in graphs:
        deg = np.bincount(g["edge_index"][1],
                          minlength=g["x"].shape[0])
        deg = np.clip(deg, 0, max_degree)
        hist += np.bincount(deg, minlength=max_degree + 1)
    return hist


def avg_deg_from_histogram(hist: np.ndarray) -> dict:
    """PNA degree statistics {lin, log, exp}
    (reference: messagepassing.py:376-381)."""
    deg = np.arange(len(hist), dtype=np.float64)
    weights = hist / max(hist.sum(), 1)
    return {
        "lin": float((deg * weights).sum()),
        "log": float((np.log(deg + 1) * weights).sum()),
        "exp": float((np.exp(np.minimum(deg, 30)) * weights).sum()),
    }
