"""The convergence-parity dataset generator (data/parity.py): determinism,
schema compatibility with both loaders, and learnable-signal sanity."""

import numpy as np

from phc_gnn_tpu.data.parity import (
    generate_parity_dataset,
    make_parity_graphs,
)

SMALL = {"train": 60, "valid": 20, "test": 20}


def test_deterministic_and_schema_zinc(tmp_path):
    a = make_parity_graphs("zinc", seed=7, splits=SMALL)
    b = make_parity_graphs("zinc", seed=7, splits=SMALL)
    for part in a:
        for ga, gb in zip(a[part], b[part]):
            np.testing.assert_array_equal(ga["x"], gb["x"])
            np.testing.assert_array_equal(ga["edge_index"], gb["edge_index"])
            np.testing.assert_array_equal(ga["y"], gb["y"])
    g = a["train"][0]
    assert g["x"].shape[1] == 1 and g["x"].max() < 28
    assert g["edge_attr"].shape[1] == 1 and g["edge_attr"].max() < 4
    # undirected: every edge has its reverse
    ei = g["edge_index"]
    fwd = {(int(u), int(v)) for u, v in ei.T}
    assert all((v, u) in fwd for u, v in fwd)
    # standardized targets: ~zero mean, unit std on train
    ys = np.array([gg["y"][0] for gg in a["train"]])
    assert abs(ys.mean()) < 1e-5 and abs(ys.std() - 1) < 1e-5


def test_roundtrip_through_our_loaders(tmp_path):
    from phc_gnn_tpu.data import load_npz_dataset, load_ogb_graphproppred

    root = generate_parity_dataset("zinc", str(tmp_path / "z"), seed=3,
                                   splits=SMALL)
    data = make_parity_graphs("zinc", seed=3, splits=SMALL)
    loaded = load_npz_dataset(root, "zinc")
    for part in data:
        assert len(loaded[part]) == len(data[part])
        for ga, gb in zip(data[part], loaded[part]):
            np.testing.assert_array_equal(ga["x"], gb["x"])
            np.testing.assert_array_equal(ga["edge_index"], gb["edge_index"])
            np.testing.assert_allclose(ga["y"], np.asarray(gb["y"]).ravel(),
                                       rtol=1e-6)

    root = generate_parity_dataset("hiv", str(tmp_path / "h"), seed=3,
                                   splits=SMALL)
    data = make_parity_graphs("hiv", seed=3, splits=SMALL)
    loaded = load_ogb_graphproppred(str(tmp_path / "h" / "ogbg_molhiv"),
                                    "scaffold")
    for part in data:
        for ga, gb in zip(data[part], loaded[part]):
            np.testing.assert_array_equal(ga["x"], gb["x"])
            np.testing.assert_array_equal(ga["edge_index"], gb["edge_index"])
            np.testing.assert_array_equal(ga["y"],
                                          np.asarray(gb["y"]).ravel())


def test_hiv_labels_balanced_and_featureful():
    data = make_parity_graphs("hiv", seed=7, splits=SMALL)
    ys = np.array([g["y"][0] for g in data["train"]])
    assert set(np.unique(ys)) == {0.0, 1.0}
    assert 0.3 < ys.mean() < 0.7
    g = data["train"][0]
    assert g["x"].shape[1] == 9 and g["edge_attr"].shape[1] == 3
