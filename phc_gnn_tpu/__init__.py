"""phc-gnn-tpu: a TPU-native framework for parameterized hypercomplex graph neural networks.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
`bayer-science-for-a-better-life/phc-gnn` (PyTorch-Geometric), re-designed TPU-first:

- single generic-n PHM core (quaternion = n=4 configuration), plain arrays instead of a
  QTensor class (component axis is an explicit array axis),
- statically padded edge-list graph batches so every step jits once per bucket,
- XLA segment ops + Pallas fused kernels for the gather/message/segment-reduce hot loop,
- functional state (params / batch stats / rng as pytrees), and
- multi-chip scaling via jax.sharding Mesh + shard_map (DP and edge partitioning).

Layout convention: a PHM tensor of hypercomplex dimension ``n`` with ``d`` features per
component is stored either *stacked* ``[..., n, d]`` or *flat* ``[..., n*d]`` in
component-block order (block ``m`` holds component ``m``'s features). The bijection is
``flat.reshape(..., n, d)`` — identical to the reference's layout
(reference: phc/hypercomplex/undirectional/models.py:225).
"""

__version__ = "0.1.0"
