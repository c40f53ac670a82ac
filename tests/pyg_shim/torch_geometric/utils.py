import torch


def degree(index, num_nodes=None, dtype=None):
    """In-degree count per node id, as torch_geometric.utils.degree."""
    n = num_nodes if num_nodes is not None else (
        int(index.max().item()) + 1 if index.numel() else 0)
    out = torch.zeros(n, dtype=dtype or torch.float32, device=index.device)
    ones = torch.ones(index.shape, dtype=out.dtype, device=index.device)
    return out.scatter_add_(0, index, ones)


def remove_isolated_nodes(edge_index, edge_attr=None, num_nodes=None):
    """PyG 1.6 semantics: drop nodes that touch no edge, relabel edge_index to
    the kept nodes, return (edge_index, edge_attr, keep_mask).  Consumed by
    the reference's CustomRemoveIsolatedNodes (benchmarks/utils.py:37-47)."""
    n = num_nodes if num_nodes is not None else (
        int(edge_index.max().item()) + 1 if edge_index.numel() else 0)
    mask = torch.zeros(n, dtype=torch.bool, device=edge_index.device)
    mask[edge_index.reshape(-1)] = True
    assoc = torch.full((n,), -1, dtype=torch.long, device=edge_index.device)
    assoc[mask] = torch.arange(int(mask.sum()), device=edge_index.device)
    return assoc[edge_index], edge_attr, mask
