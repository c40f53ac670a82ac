"""Import-only dataset stubs: the reference train scripts import ZINC /
GNNBenchmarkDataset at module load (train_zinc.py:16, train_mnist.py), but the
convergence-parity runner builds its own Data lists from the committed
synthetic generator and never instantiates these."""


class _Unavailable:
    def __init__(self, *a, **k):
        raise RuntimeError(
            f"{type(self).__name__} is an import-only shim: real PyG "
            "datasets are not available in this environment")


class ZINC(_Unavailable):
    pass


class GNNBenchmarkDataset(_Unavailable):
    pass
