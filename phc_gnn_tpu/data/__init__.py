"""Data layer: padded batching, feature tables, datasets, synthetic generators."""

from phc_gnn_tpu.data.features import (
    ATOM_FEATURE_DIMS,
    BOND_FEATURE_DIMS,
    ZINC_ATOM_DIMS,
    ZINC_BOND_DIMS,
)
from phc_gnn_tpu.data.synthetic import random_graph, synthetic_batch
