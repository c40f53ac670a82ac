import torch


def degree(index, num_nodes=None, dtype=None):
    """In-degree count per node id, as torch_geometric.utils.degree."""
    n = num_nodes if num_nodes is not None else (
        int(index.max().item()) + 1 if index.numel() else 0)
    out = torch.zeros(n, dtype=dtype or torch.float32, device=index.device)
    ones = torch.ones(index.shape, dtype=out.dtype, device=index.device)
    return out.scatter_add_(0, index, ones)
