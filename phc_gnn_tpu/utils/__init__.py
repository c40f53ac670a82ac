"""Utilities: logging, seeding, profiling, oversmoothing diagnostics."""

from phc_gnn_tpu.utils.logging import set_logging
from phc_gnn_tpu.utils.seed import set_seed_all
from phc_gnn_tpu.utils.profiling import StepMeter, trace_context
from phc_gnn_tpu.utils.oversmoothing import col_diff, row_diff


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x (shared padding/alignment helper)."""
    return ((x + m - 1) // m) * m
