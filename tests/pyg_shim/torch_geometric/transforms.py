"""RemoveIsolatedNodes transform (imported by the reference train_hiv.py:13;
the script actually applies its own CustomRemoveIsolatedNodes per batch)."""

import torch

from .utils import remove_isolated_nodes


class RemoveIsolatedNodes:
    def __call__(self, data):
        num_nodes = data.num_nodes
        out = remove_isolated_nodes(data.edge_index, data.edge_attr, num_nodes)
        data.edge_index, data.edge_attr, mask = out
        for key, item in data:
            if torch.is_tensor(item) and item.size(0) == num_nodes \
                    and "edge" not in key:
                data[key] = item[mask]
        return data

    def __repr__(self):
        return f"{self.__class__.__name__}()"
