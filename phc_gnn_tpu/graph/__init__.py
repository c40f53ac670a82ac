"""Graph engine (L3): padded batches, segment ops, aggregators, convs, pooling.

TPU-native re-design of reference phc/hypercomplex/{aggregator,pooling}.py and
undirectional/messagepassing.py on static-shape edge lists.
"""

from phc_gnn_tpu.graph.batch import GraphsTuple, batch_graphs, pad_graph_batch
from phc_gnn_tpu.graph.segment import (
    segment_sum,
    segment_mean,
    segment_min,
    segment_max,
    segment_var,
    segment_std,
    segment_softmax_weights,
    segment_count,
)
from phc_gnn_tpu.graph.aggregators import (
    AGGREGATORS,
    SCALERS,
    softmax_aggregate,
    phm_cat,
    node_degrees,
)
from phc_gnn_tpu.graph.conv import (
    PHMConv,
    PHMGINEConv,
    PHMConvSoftmax,
    PHMGINEConvSoftmax,
    PHMPNAConvSimple,
    PHMMessagePassing,
)
from phc_gnn_tpu.graph.pooling import PHMGlobalSumPooling, PHMSoftAttentionPooling
