"""Train PHC-GNN-TPU on the built-in synthetic ZINC-like dataset.

Runs end-to-end with zero external data — the graph-size regression task is
learnable, so this doubles as a convergence + throughput demonstration.

Usage: python benchmarks/train_synthetic.py [flags]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import run_benchmark

if __name__ == "__main__":
    run_benchmark("synthetic")
