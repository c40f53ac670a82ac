"""Algebra & numerics core (L1): multiplication rules, Kronecker/PHM products, inits, QR.

TPU-native re-design of the reference's L1 layer
(reference: phc/hypercomplex/{kronecker,utils,inits}.py, phc/quaternion/{algebra,inits,qr}.py).
"""

from phc_gnn_tpu.hypercomplex.rules import (
    quaternion_rule,
    complex_rule,
    standard_rule,
    random_rule,
    get_multiplication_rule,
)
from phc_gnn_tpu.hypercomplex.kron import (
    kron,
    batched_kron,
    phm_weight_matrix,
    phm_matmul,
)
from phc_gnn_tpu.hypercomplex.inits import (
    phm_init,
    unitary_init,
    glorot_uniform,
    glorot_normal,
    quaternion_init,
    orthogonal_init,
)
from phc_gnn_tpu.hypercomplex.quaternion import (
    hamilton_product,
    real_matrix_representation,
    complex_matrix_representation,
    quaternion_matmul,
    conjugate,
    qnorm,
    inverse,
    normalize,
    quaternion_dot,
)
from phc_gnn_tpu.hypercomplex.layout import to_flat, to_stacked
