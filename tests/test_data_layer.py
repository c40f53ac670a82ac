"""Data-layer tests: transforms, bucketed loader, OGB raw parser, npz reader."""

import gzip
import os

import numpy as np
import pytest

from phc_gnn_tpu.data import (
    BucketSpec,
    PaddedLoader,
    add_zeros,
    compute_bucket_spec,
    concat_x_pos,
    dataset_stats,
    degree_histogram,
    avg_deg_from_histogram,
    extract_node_feature,
    load_npz_dataset,
    load_ogb_graphproppred,
    random_graph,
    remove_isolated_nodes,
)


# ---------------- transforms ----------------

def test_remove_isolated_nodes():
    g = {"x": np.arange(5)[:, None].astype(np.int32),
         "edge_index": np.asarray([[0, 2], [2, 0]], np.int32),
         "edge_attr": np.zeros((2, 1), np.int32), "y": None}
    out = remove_isolated_nodes(g)
    assert out["x"].shape[0] == 2
    np.testing.assert_array_equal(out["x"].ravel(), [0, 2])
    np.testing.assert_array_equal(out["edge_index"], [[0, 1], [1, 0]])


def test_concat_x_pos():
    g = {"x": np.ones((3,), np.float32),
         "pos": np.full((3, 2), 2.0, np.float32),
         "edge_attr": np.ones((2,), np.float32),
         "edge_index": np.zeros((2, 2), np.int32), "y": None}
    out = concat_x_pos(g)
    assert out["x"].shape == (3, 3)
    assert out["edge_attr"].shape == (2, 1)


def test_add_zeros_and_extract_node_feature():
    g = {"x": None, "num_nodes": 4,
         "edge_index": np.asarray([[0, 0, 2], [1, 2, 3]], np.int32),
         "edge_attr": np.asarray([[1.0], [2.0], [3.0]], np.float32), "y": None}
    gz = add_zeros(g)
    assert gz["x"].shape == (4, 1) and gz["x"].sum() == 0
    ge = extract_node_feature(g, "add")
    # receivers = edge_index[0] per reference
    np.testing.assert_allclose(ge["x"].ravel(), [3.0, 0.0, 3.0, 0.0])


# ---------------- loader ----------------

def _graphs(n=20, seed=0):
    rng = np.random.default_rng(seed)
    return [random_graph(rng, target_dim=1) for _ in range(n)]


def test_bucket_spec_and_loader_covers_all_graphs():
    graphs = _graphs(30)
    spec = compute_bucket_spec(graphs, batch_size=8, target_dim=1)
    loader = PaddedLoader(graphs, spec, shuffle=True, seed=1)
    batches = list(loader)
    total = sum(int(b.count_graphs()) for b in batches)
    assert total == 30
    for b in batches:
        assert b.num_nodes == spec.num_nodes
        assert b.num_edges == spec.num_edges
        assert b.num_graphs == spec.num_graphs
        # all edges sorted by receiver
        rec = np.asarray(b.receivers)
        assert np.all(np.diff(rec) >= 0)


def test_loader_native_and_python_agree():
    from phc_gnn_tpu.data import native
    if not native.native_available():
        pytest.skip("no native lib")
    graphs = _graphs(10, seed=3)
    spec = compute_bucket_spec(graphs, batch_size=10, target_dim=1)
    batches = list(PaddedLoader(graphs, spec))
    assert len(batches) >= 1
    b = batches[0]
    # python path oracle
    from phc_gnn_tpu.graph.batch import batch_graphs
    k = int(b.count_graphs())
    want = batch_graphs(graphs[:k], spec.num_nodes, spec.num_edges,
                        spec.num_graphs, y_shape=(1,))
    np.testing.assert_array_equal(np.asarray(b.nodes), np.asarray(want.nodes))
    np.testing.assert_array_equal(np.asarray(b.senders), np.asarray(want.senders))
    np.testing.assert_allclose(np.asarray(b.y)[:k], np.asarray(want.y)[:k])


# ---------------- OGB raw parser ----------------

def _write_csv_gz(path, rows):
    with gzip.open(path, "wt", newline="") as f:
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")


@pytest.fixture
def fake_ogb_root(tmp_path):
    """Two tiny molecules in OGB raw format."""
    raw = tmp_path / "raw"
    raw.mkdir()
    # graph 1: 3 nodes, 4 edges; graph 2: 2 nodes, 2 edges
    _write_csv_gz(raw / "edge.csv.gz",
                  [[0, 1], [1, 0], [1, 2], [2, 1], [0, 1], [1, 0]])
    _write_csv_gz(raw / "num-node-list.csv.gz", [[3], [2]])
    _write_csv_gz(raw / "num-edge-list.csv.gz", [[4], [2]])
    _write_csv_gz(raw / "node-feat.csv.gz",
                  [[5, 0], [6, 1], [7, 0], [8, 1], [9, 0]])
    _write_csv_gz(raw / "edge-feat.csv.gz",
                  [[1], [1], [2], [2], [3], [3]])
    _write_csv_gz(raw / "graph-label.csv.gz", [[1], [0]])
    split = tmp_path / "split" / "scaffold"
    split.mkdir(parents=True)
    _write_csv_gz(split / "train.csv.gz", [[0]])
    _write_csv_gz(split / "valid.csv.gz", [[1]])
    _write_csv_gz(split / "test.csv.gz", [[1]])
    return str(tmp_path)


def test_ogb_parser(fake_ogb_root):
    splits = load_ogb_graphproppred(fake_ogb_root)
    assert len(splits["train"]) == 1 and len(splits["valid"]) == 1
    g0 = splits["train"][0]
    assert g0["x"].shape == (3, 2)
    assert g0["edge_index"].shape == (2, 4)
    np.testing.assert_array_equal(g0["edge_index"][:, 2], [1, 2])
    assert g0["y"][0] == 1
    g1 = splits["valid"][0]
    assert g1["x"].shape == (2, 2)
    np.testing.assert_array_equal(g1["x"][:, 0], [8, 9])


def test_ogb_parser_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_ogb_graphproppred(str(tmp_path / "nope"))


# ---------------- npz reader ----------------

def test_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    graphs = _graphs(5, seed=4)
    node_ptr, edge_ptr = [0], [0]
    xs, eis, eas, ys = [], [], [], []
    for g in graphs:
        xs.append(g["x"])
        eis.append(g["edge_index"] + node_ptr[-1])
        eas.append(g["edge_attr"])
        ys.append(np.asarray(g["y"]).reshape(-1))
        node_ptr.append(node_ptr[-1] + g["x"].shape[0])
        edge_ptr.append(edge_ptr[-1] + g["edge_index"].shape[1])
    data = dict(x=np.concatenate(xs), edge_index=np.concatenate(eis, axis=1),
                edge_attr=np.concatenate(eas), y=np.stack(ys),
                node_ptr=np.asarray(node_ptr), edge_ptr=np.asarray(edge_ptr))
    for part in ("train", "valid", "test"):
        np.savez(tmp_path / f"zinc_{part}.npz", **data)
    splits = load_npz_dataset(str(tmp_path), "zinc")
    assert len(splits["train"]) == 5
    np.testing.assert_array_equal(splits["train"][2]["x"], graphs[2]["x"])
    np.testing.assert_array_equal(splits["train"][2]["edge_index"],
                                  graphs[2]["edge_index"])


# ---------------- stats ----------------

def test_stats_and_degree_histogram():
    graphs = _graphs(10, seed=5)
    s = dataset_stats(graphs)
    assert s["num_graphs"] == 10 and s["nodes_mean"] > 0
    hist = degree_histogram(graphs)
    assert hist.sum() == sum(g["x"].shape[0] for g in graphs)
    avg = avg_deg_from_histogram(hist)
    assert 0 < avg["lin"] < 10 and avg["log"] > 0


def test_sub_bucket_ladder():
    graphs = _graphs(40, seed=9)
    spec = compute_bucket_spec(graphs, batch_size=16, target_dim=1)
    loader = PaddedLoader(graphs, spec, sub_buckets=3)
    shapes = {(b.num_nodes, b.num_edges) for b in loader}
    total = sum(int(b.count_graphs()) for b in PaddedLoader(graphs, spec,
                                                            sub_buckets=3))
    assert total == 40
    assert len(loader.ladder) >= 2
    # the final (small remainder) batch should use a smaller rung when it fits
    batches = list(PaddedLoader(graphs, spec, sub_buckets=3))
    assert batches[-1].num_nodes <= spec.num_nodes


def test_add_virtual_node():
    from phc_gnn_tpu.data.transforms import add_virtual_node, grow_vocab_for_virtual_node
    g = {"x": np.asarray([[0], [1], [2]], np.int32),
         "edge_index": np.asarray([[0, 1], [1, 0]], np.int32),
         "edge_attr": np.asarray([[0], [1]], np.int32), "y": None}
    out = add_virtual_node(g, atom_vocab_sizes=[5], bond_vocab_sizes=[3])
    assert out["x"].shape == (4, 1)
    assert out["x"][3, 0] == 5  # sentinel index
    assert out["edge_index"].shape == (2, 2 + 6)
    # edges to/from vnode
    ei = out["edge_index"]
    assert (ei[1, 2:5] == 3).all() and (ei[0, 5:] == 3).all()
    assert (out["edge_attr"][2:, 0] == 3).all()
    assert grow_vocab_for_virtual_node([5, 7]) == [6, 8]


def test_prefetch_iterator():
    from phc_gnn_tpu.data.prefetch import prefetch

    graphs = _graphs(20, seed=11)
    spec = compute_bucket_spec(graphs, batch_size=8, target_dim=1)
    plain = [int(b.count_graphs()) for b in PaddedLoader(graphs, spec)]
    pre = [int(b.count_graphs()) for b in prefetch(PaddedLoader(graphs, spec),
                                                   depth=3)]
    assert pre == plain

    def boom():
        yield 1
        raise RuntimeError("source failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_batch_graphs_preserves_float_features():
    """Continuous features must not be floored to int (mnist/cifar/ppa)."""
    from phc_gnn_tpu.graph.batch import batch_graphs
    g = {"x": np.asarray([[0.909, 0.818], [0.2, 0.4]], np.float32),
         "edge_index": np.asarray([[0, 1], [1, 0]], np.int32),
         "edge_attr": np.asarray([[0.839], [0.5]], np.float32), "y": None}
    b = batch_graphs([g], num_nodes=8, num_edges=8, num_graphs=2)
    np.testing.assert_allclose(np.asarray(b.nodes)[0], [0.909, 0.818],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b.edges)[:2, 0],
                               sorted([0.839, 0.5]), rtol=1e-6)
    assert np.asarray(b.nodes).dtype == np.float32
