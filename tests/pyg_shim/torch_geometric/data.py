"""Batch: a plain attribute container — the reference models only read
.x/.edge_index/.edge_attr/.batch from it (models.py forward)."""


class Data:
    def __init__(self, x=None, edge_index=None, edge_attr=None, y=None,
                 **kwargs):
        self.x = x
        self.edge_index = edge_index
        self.edge_attr = edge_attr
        self.y = y
        for k, v in kwargs.items():
            setattr(self, k, v)


class Batch(Data):
    def __init__(self, x=None, edge_index=None, edge_attr=None, batch=None,
                 y=None, **kwargs):
        super().__init__(x=x, edge_index=edge_index, edge_attr=edge_attr, y=y,
                         **kwargs)
        self.batch = batch
