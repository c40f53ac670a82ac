"""Minimal torch_geometric shim: just enough PyG 1.6-era surface to import and
run the reference's model classes (/root/reference/phc/*/undirectional/) as
parity oracles on CPU.  Not a PyG reimplementation."""

from . import data, datasets, nn, transforms, typing, utils  # noqa: F401
