"""OGB molecular feature vocabulary sizes (hard-coded tables).

The reference pulls these from ``ogb.utils.features.get_atom_feature_dims()`` /
``get_bond_feature_dims()`` (reference: phc/hypercomplex/undirectional/
models.py:18-21); the ogb package is not importable here, so the canonical OGB
values (ogb.utils.features allowable_features lengths) are inlined.  ZINC and
superpixel dims follow the reference train scripts
(train_zinc.py:512-514, train_mnist.py:519-520, train_cifar10.py:525-531).
"""

from __future__ import annotations

# len(allowable_features[...]) from ogb.utils.features (ogb >= 1.2)
ATOM_FEATURE_DIMS = [119, 5, 12, 12, 10, 6, 6, 2, 2]
BOND_FEATURE_DIMS = [5, 6, 2]

# ZINC-subset: atom types 28 (categorical), bond types 4 (categorical)
ZINC_ATOM_DIMS = [28]
ZINC_BOND_DIMS = [4]

# MNIST superpixels: x = intensity(1) + pos(2) continuous; edge feature 1 (dist)
MNIST_ATOM_DIM = 3
MNIST_BOND_DIM = 1

# CIFAR10 superpixels: RGB(3) + pos(2) continuous; edge feature 1
CIFAR10_ATOM_DIM = 5
CIFAR10_BOND_DIM = 1

# ogbg-ppa: no node features (encoded as single all-zero categorical), 7-dim
# continuous edge features, 37 classes
PPA_EDGE_DIM = 7
PPA_NUM_CLASSES = 37
