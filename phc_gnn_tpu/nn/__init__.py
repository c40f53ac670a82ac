"""Hypercomplex NN modules (L2): linear layers, norm, encoders, dropout, head.

TPU-native re-design of reference phc/hypercomplex/{layers,norm,encoder,
downstream,regularization}.py on flax.linen with functional state.
"""

from phc_gnn_tpu.nn.activations import ACTIVATIONS, get_activation
from phc_gnn_tpu.nn.dropout import phm_dropout
from phc_gnn_tpu.nn.phm_linear import PHMLinear, PHMMLP, RealTransformer
from phc_gnn_tpu.nn.norm import PHMNorm, QuaternionWhiteningNorm
from phc_gnn_tpu.nn.encoder import IntegerEncoder, PHMEncoder, NaivePHMEncoder
from phc_gnn_tpu.nn.downstream import PHMDownstreamNet
from phc_gnn_tpu.nn.regularization import (
    phm_weight_regularization,
    multiplication_rule_regularization,
)
