"""OGB molecular feature-vocabulary sizes (ogb.utils.features) — sourced from
our data layer so both frameworks agree on encoder dims."""

from phc_gnn_tpu.data.features import ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS


def get_atom_feature_dims():
    return list(ATOM_FEATURE_DIMS)


def get_bond_feature_dims():
    return list(BOND_FEATURE_DIMS)
