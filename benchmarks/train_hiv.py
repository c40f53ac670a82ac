"""Train PHC-GNN-TPU on hiv (reference: benchmarks/train_hiv.py).

Usage: python benchmarks/train_hiv.py --data_root <dir> [flags]
Run with --help for the full flag surface.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import run_benchmark

if __name__ == "__main__":
    run_benchmark("hiv")
