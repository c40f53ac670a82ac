"""End-to-end models (L4)."""

from phc_gnn_tpu.models.phc_gnn import PHCGNN
from phc_gnn_tpu.models.presets import (
    PHMSkipConnectAdd,
    PHMSkipConnectConcat,
    QuaternionSkipConnectAdd,
    QuaternionSkipConnectConcat,
)
