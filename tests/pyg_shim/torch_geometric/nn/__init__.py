from torch_scatter import scatter_sum

from . import conv, inits  # noqa: F401


def global_add_pool(x, batch, size=None):
    """Segment-sum node features over graph ids (PyG global_add_pool)."""
    n = size if size is not None else int(batch.max().item()) + 1
    return scatter_sum(x, batch, dim=0, dim_size=n)
