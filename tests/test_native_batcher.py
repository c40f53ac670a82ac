"""C++ native batcher tests: equivalence against the numpy reference paths."""

import numpy as np
import pytest

from phc_gnn_tpu.data import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native lib not built")


def test_sort_edges_matches_numpy():
    rng = np.random.default_rng(0)
    recv = rng.integers(0, 100, size=1000).astype(np.int32)
    got = native.sort_edges_by_receiver(recv, 100)
    want = np.argsort(recv, kind="stable")
    np.testing.assert_array_equal(got, want)


def test_csr_rowptr():
    recv = np.asarray([0, 0, 2, 2, 2, 5], np.int32)
    rowptr = native.build_csr_rowptr(recv, 6)
    np.testing.assert_array_equal(rowptr, [0, 2, 2, 5, 5, 5, 6])



def test_pack_batch_matches_python_batcher():
    from phc_gnn_tpu.graph.batch import batch_graphs

    rng = np.random.default_rng(2)
    graphs = []
    for _ in range(5):
        n = int(rng.integers(2, 10))
        e = int(rng.integers(1, 20))
        graphs.append({
            "x": rng.integers(0, 10, size=(n, 2)).astype(np.int32),
            "edge_index": rng.integers(0, n, size=(2, e)).astype(np.int32),
            "edge_attr": rng.integers(0, 4, size=(e, 1)).astype(np.int32),
            "y": None,
        })
    want = batch_graphs(graphs, num_nodes=64, num_edges=128, num_graphs=8)

    node_feats = np.concatenate([g["x"] for g in graphs])
    edge_feats = np.concatenate([g["edge_attr"] for g in graphs])
    senders = np.concatenate([g["edge_index"][0] for g in graphs])
    receivers = np.concatenate([g["edge_index"][1] for g in graphs])
    node_off = np.concatenate([[0], np.cumsum([g["x"].shape[0] for g in graphs])])
    edge_off = np.concatenate(
        [[0], np.cumsum([g["edge_index"].shape[1] for g in graphs])])
    out = native.pack_batch_native(node_feats, edge_feats, senders, receivers,
                                   node_off, edge_off, 64, 128, 8)
    np.testing.assert_array_equal(out["graph_ids"], np.asarray(want.graph_ids))
    np.testing.assert_array_equal(out["node_mask"].astype(bool),
                                  np.asarray(want.node_mask))
    np.testing.assert_array_equal(out["edge_mask"].astype(bool),
                                  np.asarray(want.edge_mask))
    np.testing.assert_array_equal(out["graph_mask"].astype(bool),
                                  np.asarray(want.graph_mask))
    np.testing.assert_array_equal(out["nodes"], np.asarray(want.nodes))
    # both sort by receiver; same stable order -> identical edge arrays
    np.testing.assert_array_equal(out["receivers"], np.asarray(want.receivers))
    np.testing.assert_array_equal(out["senders"], np.asarray(want.senders))
    np.testing.assert_array_equal(out["edges"], np.asarray(want.edges))


def test_pack_batch_overflow():
    node_feats = np.zeros((10, 1), np.int32)
    edge_feats = np.zeros((0, 1), np.int32)
    with pytest.raises(ValueError):
        native.pack_batch_native(node_feats, edge_feats,
                                 np.zeros(0, np.int32), np.zeros(0, np.int32),
                                 np.asarray([0, 10], np.int64),
                                 np.asarray([0, 0], np.int64), 8, 8, 4)


def test_pack_batch_fuzz_matches_python():
    """Randomized stress: many batch shapes/degree distributions, native packer
    must match the python batcher exactly."""
    from phc_gnn_tpu.graph.batch import batch_graphs

    rng = np.random.default_rng(123)
    for trial in range(25):
        n_graphs = int(rng.integers(1, 12))
        graphs = []
        for _ in range(n_graphs):
            n = int(rng.integers(1, 30))
            e = int(rng.integers(0, 80))
            graphs.append({
                "x": rng.integers(0, 9, size=(n, int(rng.integers(1, 4)))).astype(np.int32),
                "edge_index": rng.integers(0, n, size=(2, e)).astype(np.int32),
                "edge_attr": rng.integers(0, 5, size=(e, 2)).astype(np.int32),
                "y": None,
            })
        # uniform feature widths within a batch
        fx = graphs[0]["x"].shape[1]
        for g in graphs:
            g["x"] = g["x"][:, :1].repeat(fx, axis=1)
        total_n = sum(g["x"].shape[0] for g in graphs)
        total_e = sum(g["edge_index"].shape[1] for g in graphs)
        nn = total_n + int(rng.integers(1, 20))
        ne = total_e + int(rng.integers(0, 20))
        ng = n_graphs + int(rng.integers(1, 4))
        want = batch_graphs(graphs, nn, ne, ng)

        node_feats = np.concatenate([g["x"] for g in graphs])
        edge_feats = np.concatenate([g["edge_attr"] for g in graphs])
        senders = np.concatenate([g["edge_index"][0] for g in graphs])
        receivers = np.concatenate([g["edge_index"][1] for g in graphs])
        node_off = np.concatenate([[0], np.cumsum([g["x"].shape[0] for g in graphs])])
        edge_off = np.concatenate([[0], np.cumsum([g["edge_index"].shape[1] for g in graphs])])
        out = native.pack_batch_native(node_feats, edge_feats, senders,
                                       receivers, node_off, edge_off, nn, ne, ng)
        np.testing.assert_array_equal(out["nodes"], np.asarray(want.nodes), err_msg=f"trial {trial}")
        np.testing.assert_array_equal(out["senders"], np.asarray(want.senders), err_msg=f"trial {trial}")
        np.testing.assert_array_equal(out["receivers"], np.asarray(want.receivers), err_msg=f"trial {trial}")
        np.testing.assert_array_equal(out["edges"], np.asarray(want.edges), err_msg=f"trial {trial}")
        np.testing.assert_array_equal(out["graph_ids"], np.asarray(want.graph_ids), err_msg=f"trial {trial}")
        np.testing.assert_array_equal(out["edge_mask"].astype(bool),
                                      np.asarray(want.edge_mask), err_msg=f"trial {trial}")


