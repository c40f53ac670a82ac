"""Device mesh construction for multi-chip scaling.

The reference has no distributed support (SURVEY.md section 2.5); this layer is
new TPU-first design: axes ``dp`` (data parallel over graph batches) and ``ep``
(edge partition — the graph analogue of sequence parallelism), laid out so
collectives ride ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "replicated", "sharded"]


def make_mesh(dp: Optional[int] = None, ep: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (dp, ep) mesh.  dp defaults to n_devices // ep."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // ep
    assert dp * ep <= len(devices), f"mesh {dp}x{ep} > {len(devices)} devices"
    arr = np.asarray(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(arr, axis_names=("dp", "ep"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def sharded(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*axes))
