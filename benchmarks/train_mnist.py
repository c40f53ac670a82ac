"""Train PHC-GNN-TPU on mnist (reference: benchmarks/train_mnist.py).

Usage: python benchmarks/train_mnist.py --data_root <dir> [flags]
Run with --help for the full flag surface.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import run_benchmark

if __name__ == "__main__":
    run_benchmark("mnist")
