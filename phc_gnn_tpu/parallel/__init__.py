"""Multi-chip parallelism: mesh, data parallel, edge partitioning."""

from phc_gnn_tpu.parallel.mesh import make_mesh, replicated, sharded
from phc_gnn_tpu.parallel.dp import (
    loss_weight,
    make_dp_eval_step,
    make_dp_train_step,
    make_dummy_batch,
    make_scan_dp_train_steps,
    shard_batch,
    stack_batches,
    weighted_mean,
)
from phc_gnn_tpu.parallel.edge_partition import (
    edge_partition_specs,
    make_dp_ep_batch_specs,
    make_dp_ep_eval_step,
    make_dp_ep_train_step,
    make_ep_eval_step,
    make_ep_train_step,
    partition_edges,
)
from phc_gnn_tpu.parallel.halo import (
    halo_exchange,
    make_dp_np_batch_specs,
    make_dp_np_eval_step,
    make_dp_np_train_step,
    make_np_eval_step,
    make_np_train_step,
    make_scan_dp_np_train_steps,
    make_scan_np_train_steps,
    node_partition_specs,
    partition_nodes,
)
from phc_gnn_tpu.parallel.multihost import (
    initialize,
    is_primary,
    make_multihost_mesh,
    sync_hosts,
)
