"""scatter_softmax: numerically-stable segment softmax, the exact composite
torch_scatter implements (max-shift, exp, normalize)."""

import torch


def scatter_softmax(src, index, dim=0):
    if dim < 0:
        dim += src.dim()
    n = int(index.max().item()) + 1 if index.numel() else 0
    shape = [1] * src.dim()
    shape[dim] = src.size(dim)
    idx = index.view(shape).expand_as(src)
    seg_shape = list(src.shape)
    seg_shape[dim] = n
    seg_max = torch.full(seg_shape, float("-inf"), dtype=src.dtype,
                         device=src.device)
    seg_max.scatter_reduce_(dim, idx, src, "amax", include_self=True)
    shifted = src - seg_max.gather(dim, idx)
    expd = shifted.exp()
    denom = torch.zeros(seg_shape, dtype=src.dtype,
                        device=src.device).scatter_add_(dim, idx, expd)
    return expd / denom.gather(dim, idx)
