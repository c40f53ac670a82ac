"""MessagePassing: the gather -> message -> aggregate protocol exactly as the
reference's conv classes use it (PyG 1.6 semantics, flow source_to_target):

    out = propagate(edge_index, x=x, edge_attr=e, size=None)
        x_j   = x[edge_index[0]]          (suffix _j: gather at source)
        msgs  = self.message(x_j=..., edge_attr=...)
        out   = self.aggregate(msgs, edge_index[1], dim_size=N)

Custom ``aggregate(inputs, index, dim_size=None)`` overrides (the reference's
softmax/PNA convs) are dispatched naturally via method resolution.
"""

import inspect

import torch

from torch_scatter import scatter


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr="add", flow="source_to_target", node_dim=-2,
                 **kwargs):
        super().__init__()
        assert flow == "source_to_target"
        self.aggr = aggr
        self.flow = flow
        self.node_dim = node_dim

    def propagate(self, edge_index, size=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]
        x = kwargs.get("x")
        if size is not None and size[1] is not None:
            dim_size = size[1]
        elif x is not None:
            dim_size = x.size(self.node_dim)
        else:
            dim_size = int(dst.max().item()) + 1
        msg_kwargs = {}
        for name, p in inspect.signature(self.message).parameters.items():
            if name.endswith("_j") and name[:-2] in kwargs:
                msg_kwargs[name] = kwargs[name[:-2]].index_select(
                    self.node_dim, src)
            elif name.endswith("_i") and name[:-2] in kwargs:
                msg_kwargs[name] = kwargs[name[:-2]].index_select(
                    self.node_dim, dst)
            elif name in kwargs:
                msg_kwargs[name] = kwargs[name]
            elif p.default is inspect.Parameter.empty:
                msg_kwargs[name] = None
        msgs = self.message(**msg_kwargs)
        return self.aggregate(msgs, dst, dim_size=dim_size)

    def message(self, x_j):
        return x_j

    def aggregate(self, inputs, index, dim_size=None):
        reduce = "sum" if self.aggr == "add" else self.aggr
        return scatter(inputs, index, dim=self.node_dim, dim_size=dim_size,
                       reduce=reduce)
