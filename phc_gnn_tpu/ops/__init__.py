"""Pallas TPU kernels for the hot ops.

- stream_scan: streaming segmented-scan aggregation family (sum/mean/min/max/
  var/std and two-pass softmax) with scatter-free analytic VJPs.  The default
  aggregation kernel on TPU (KERNELS.md).
- fused_bn: single-pass masked batch-norm.

The round-1 one-hot-tile kernels (fused_segment / fused_softmax, plan-layout
batching) were strictly dominated by the scan kernels and removed in round 3;
their measured record survives in KERNELS.md.
"""
