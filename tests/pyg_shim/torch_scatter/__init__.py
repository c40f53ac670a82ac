"""Minimal torch_scatter shim (plain-torch) for running the reference's model
classes as parity oracles on CPU.

Implements exactly the surface the reference uses
(/root/reference/phc/*/aggregator.py, */undirectional/messagepassing.py):
``scatter(src, index, dim, out, dim_size, reduce)`` for
sum/mean/min/max, ``scatter_sum``, and ``composite.scatter_softmax``.
Semantics mirror torch_scatter 2.x: zero-initialized output, empty segments
stay 0 (min/max reduce with include_self=False so the zero init does not clamp
real values).
"""

import torch

from . import composite  # noqa: F401

__all__ = ["scatter", "scatter_sum", "scatter_add", "scatter_mean",
           "composite"]


def _norm_dim(dim, ndim):
    return dim + ndim if dim < 0 else dim


def _expand_index(index, src, dim):
    """Broadcast a 1-D segment index to src's shape for dim-wise scatter."""
    shape = [1] * src.dim()
    shape[dim] = src.size(dim)
    return index.view(shape).expand_as(src)


def _dim_size(index, dim_size):
    if dim_size is not None:
        return dim_size
    return int(index.max().item()) + 1 if index.numel() else 0


def scatter_sum(src, index, dim=0, out=None, dim_size=None):
    dim = _norm_dim(dim, src.dim())
    n = _dim_size(index, dim_size)
    shape = list(src.shape)
    shape[dim] = n
    if out is None:
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    return out.scatter_add_(dim, _expand_index(index, src, dim), src)


scatter_add = scatter_sum


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    dim = _norm_dim(dim, src.dim())
    summed = scatter_sum(src, index, dim, None, dim_size)
    ones = torch.ones(index.shape, dtype=src.dtype, device=src.device)
    count = torch.zeros(summed.size(dim), dtype=src.dtype,
                        device=src.device).scatter_add_(0, index, ones)
    count = count.clamp(min=1)
    shape = [1] * src.dim()
    shape[dim] = summed.size(dim)
    res = summed / count.view(shape)
    if out is not None:
        out.copy_(res)
        return out
    return res


def _scatter_minmax(src, index, dim, dim_size, op):
    dim = _norm_dim(dim, src.dim())
    n = _dim_size(index, dim_size)
    shape = list(src.shape)
    shape[dim] = n
    out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    out.scatter_reduce_(dim, _expand_index(index, src, dim), src, op,
                        include_self=False)
    return out


def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    if reduce in ("sum", "add"):
        return scatter_sum(src, index, dim, out, dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim, out, dim_size)
    if reduce == "min":
        assert out is None
        return _scatter_minmax(src, index, dim, dim_size, "amin")
    if reduce == "max":
        assert out is None
        return _scatter_minmax(src, index, dim, dim_size, "amax")
    raise ValueError(f"unsupported reduce: {reduce}")
