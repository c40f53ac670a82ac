"""Data layer: padded batching, loaders, datasets, transforms, features."""

from phc_gnn_tpu.data.features import (
    ATOM_FEATURE_DIMS,
    BOND_FEATURE_DIMS,
    ZINC_ATOM_DIMS,
    ZINC_BOND_DIMS,
)
from phc_gnn_tpu.data.synthetic import random_graph, synthetic_batch
from phc_gnn_tpu.data.loader import BucketSpec, PaddedLoader, compute_bucket_spec
from phc_gnn_tpu.data.transforms import (
    add_zeros,
    concat_x_pos,
    extract_node_feature,
    remove_isolated_nodes,
)
from phc_gnn_tpu.data.datasets import (
    avg_deg_from_histogram,
    dataset_stats,
    degree_histogram,
    load_npz_dataset,
    load_ogb_graphproppred,
)
from phc_gnn_tpu.data.prefetch import PrefetchIterator, prefetch
