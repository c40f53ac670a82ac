"""Pallas TPU kernels for the hot ops."""

from phc_gnn_tpu.ops.fused_segment import (
    SegmentPlan,
    build_segment_plan,
    segment_sum_sorted,
)
