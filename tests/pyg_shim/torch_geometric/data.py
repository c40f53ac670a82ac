"""Data/Batch/DataLoader: the PyG 1.6-era surface the reference's models and
train scripts touch.  Data is a plain attribute container (the models read
.x/.edge_index/.edge_attr/.batch — models.py forward); DataLoader collates a
list of Data into one disjoint-union Batch exactly as PyG's collater does
(offset edge_index, concatenate features, build the graph-id vector), which is
what the reference training loops iterate (train_hiv.py:481-493,170)."""

import torch


class Data:
    def __init__(self, x=None, edge_index=None, edge_attr=None, y=None,
                 **kwargs):
        self.x = x
        self.edge_index = edge_index
        self.edge_attr = edge_attr
        self.y = y
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def num_nodes(self):
        return int(self.x.size(0))

    def __iter__(self):
        """(key, value) pairs of tensor attributes — the iteration surface
        CustomRemoveIsolatedNodes uses (reference benchmarks/utils.py:43-45)."""
        for k, v in sorted(self.__dict__.items()):
            if torch.is_tensor(v):
                yield k, v

    def __getitem__(self, key):
        return getattr(self, key)

    def __setitem__(self, key, value):
        setattr(self, key, value)

    def to(self, device):
        for k, v in list(self.__dict__.items()):
            if torch.is_tensor(v):
                setattr(self, k, v.to(device))
        return self


class Batch(Data):
    def __init__(self, x=None, edge_index=None, edge_attr=None, batch=None,
                 y=None, **kwargs):
        super().__init__(x=x, edge_index=edge_index, edge_attr=edge_attr, y=y,
                         **kwargs)
        self.batch = batch

    @property
    def num_graphs(self):
        return int(self.batch.max().item()) + 1 if self.batch.numel() else 0

    @classmethod
    def from_data_list(cls, data_list):
        xs, eis, eas, ys, gids = [], [], [], [], []
        off = 0
        for gi, d in enumerate(data_list):
            n = d.num_nodes
            xs.append(d.x)
            eis.append(d.edge_index + off)
            eas.append(d.edge_attr)
            ys.append(d.y)
            gids.append(torch.full((n,), gi, dtype=torch.long))
            off += n
        return cls(x=torch.cat(xs), edge_index=torch.cat(eis, dim=1),
                   edge_attr=torch.cat(eas), y=torch.cat(ys),
                   batch=torch.cat(gids))


class DataLoader:
    """Shuffling mini-batch collater over a list of Data.  Shuffle order comes
    from torch's default generator (randperm), so the reference's
    set_seed_all(seed) pins epoch order exactly as real PyG's
    torch.utils.data.DataLoader sampler does."""

    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 **_ignored):
        self.dataset = list(dataset)
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = (torch.randperm(len(self.dataset)).tolist() if self.shuffle
                 else range(len(self.dataset)))
        chunk = []
        for i in order:
            chunk.append(self.dataset[i])
            if len(chunk) == self.batch_size:
                yield Batch.from_data_list(chunk)
                chunk = []
        if chunk and not self.drop_last:
            yield Batch.from_data_list(chunk)
