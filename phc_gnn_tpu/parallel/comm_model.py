"""Analytic communication-volume model for the halo node-sharding scheme.

The ≥80 % multi-chip scaling target (BASELINE.md) cannot be measured in this
environment (one physical chip), so this module makes it FALSIFIABLE instead:
closed-form wire volumes for every collective the node-parallel train step
issues, pinned against the actual jaxpr in tests/test_comm_model.py (the test
walks the compiled step and checks that the all_to_all operand shapes sum to
exactly these bytes).  When hardware shows up, the predicted efficiency is the
number the measurement either confirms or refutes.

Collectives per train step of a PHC-GNN with L message-passing layers under
(dp, ep) with the halo scheme (parallel/halo.py):

- L halo all_to_alls (forward), one per conv layer, of [S*H, d_i] where d_i is
  that layer's input width — plus their transposes in the backward pass (the
  transpose of a tiled all_to_all is an all_to_all of equal shape).
- 3 psums per batch-norm (count, mean [d], Sum x^2 [d]) + transposes.
- 1 psum of the pooled [G, d_pool] partial graph sums + transpose.
- 1 grad pmean over ep and (dp>1) 1 weighted grad mean over dp — parameter-
  sized, amortized over the whole step, identical to plain DP.

The reference has no distributed mode at all (SURVEY.md §2.5); this model is
new design, quantifying the north-star scheme's comm proportionality: halo
bytes scale with the boundary CUT (graph property), never with N.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from phc_gnn_tpu.graph.batch import GraphsTuple
from phc_gnn_tpu.utils import round_up

__all__ = [
    "boundary_cuts",
    "halo_volume",
    "step_comm_volume",
    "predict_scaling_efficiency",
]


def boundary_cuts(batch: GraphsTuple, num_shards: int) -> np.ndarray:
    """cut[t, s] = number of distinct t-owned sender nodes referenced by the
    real edges owned by shard s (s != t).  Mirrors partition_nodes' ownership
    rule exactly: contiguous node ranges of NS = round_up(ceil(N/S), 8) rows,
    edges owned by their receiver's owner."""
    S = num_shards
    N = batch.num_nodes
    NS = round_up((N + S - 1) // S, 8)
    recv = np.asarray(batch.receivers).astype(np.int64)
    send = np.asarray(batch.senders).astype(np.int64)
    emask = np.asarray(batch.edge_mask)
    recv, send = recv[emask], send[emask]
    owner_e = np.minimum(recv // NS, S - 1)
    owner_s = np.minimum(send // NS, S - 1)
    cut = np.zeros((S, S), np.int64)
    for s in range(S):
        es_send = send[owner_e == s]
        es_owner = owner_s[owner_e == s]
        for t in range(S):
            if t != s:
                cut[t, s] = len(np.unique(es_send[es_owner == t]))
    return cut


def halo_volume(batch: GraphsTuple, num_shards: int,
                layer_dims: Sequence[int], dtype_bytes: int = 4,
                halo_align: int = 8) -> dict:
    """Wire volume of the per-layer halo all_to_alls for ONE train step
    (forward + backward), per shard.

    Returns dict with:
      H                  static halo width round_up(max cut, halo_align)
      useful_bytes       sum over layers of (actual cut rows) x d_i x bytes x 2
      padded_bytes       sum over layers of S x H x d_i x bytes x 2 — what the
                         wire actually carries (the static-slot padding)
      padding_overhead   padded / max(useful, 1)
    """
    S = num_shards
    cut = boundary_cuts(batch, num_shards)
    H = round_up(max(int(cut.max()), 1), halo_align)
    # shard s sends cut[s, t] rows to each t and receives cut[t, s]; the
    # all_to_all buffer is padded to S*H rows regardless
    max_rows_useful = int(cut.sum(axis=0).max())  # worst shard's recv rows
    useful = sum(int(cut.sum(axis=0).max()) * d for d in layer_dims)
    padded = sum(S * H * d for d in layer_dims)
    return {
        "H": H,
        "max_cut": int(cut.max()),
        "useful_rows_per_layer": max_rows_useful,
        "useful_bytes": 2 * useful * dtype_bytes,
        "padded_bytes": 2 * padded * dtype_bytes,
        "padding_overhead": (padded / max(useful, 1)),
    }


def step_comm_volume(batch: GraphsTuple, num_shards: int,
                     layer_dims: Sequence[int], pooled_dim: int,
                     bn_dims: Sequence[int] = (),
                     dtype_bytes: int = 4, halo_align: int = 8) -> dict:
    """Total modeled per-shard wire bytes of one halo train step: halo
    exchanges + BN stat psums + the pooling psum (fwd + bwd each)."""
    halo = halo_volume(batch, num_shards, layer_dims, dtype_bytes, halo_align)
    bn = sum(2 * (2 * d + 1) * dtype_bytes for d in bn_dims)
    pool = 2 * batch.num_graphs * pooled_dim * dtype_bytes
    return {
        **halo,
        "bn_psum_bytes": bn,
        "pooling_psum_bytes": pool,
        "total_bytes": halo["padded_bytes"] + bn + pool,
    }


def predict_scaling_efficiency(step_time_1chip_s: float,
                               comm_bytes_per_shard: float,
                               num_shards: int,
                               ici_bytes_per_s: float = 4.5e10,
                               overlap: float = 0.0) -> dict:
    """Falsifiable efficiency model for node-sharded scaling over ICI.

    Compute splits 1/S (per-node GEMMs, BN, encoders dominate the step —
    KERNELS.md ablation); comm is the modeled wire volume at ICI bandwidth
    (default 45 GB/s per direction per link, TPU v5e ICI; the halo all_to_all
    rides one link per peer in a ring placement).

    ``overlap`` is the fraction of comm hidden behind independent compute.
    Evidence history: round 4's AOT v5e 2x4 schedule showed the 8 halo
    all-to-alls SYNCHRONOUS (overlap=0 was the honest default).  Round 5
    changed the facts on the ground (VERDICT r4 next #1): every halo-path
    jit now compiles with xla_tpu_enable_async_all_to_all
    (halo.py HALO_TPU_COMPILER_OPTIONS) and the sender gather is split
    local/remote (ops/stream_scan.py split_take) so the local gather — the
    largest op-class floor — carries no dependency on the exchange.  The
    re-run AOT schedule (scripts/aot_overlap_check.py, AOT_SCHEDULE.json)
    shows all 8 exchanges as async start/done pairs with compute scheduled
    between the halves.  The conservative default here stays overlap=0 —
    the schedule proves the *structure* exists, not how many microseconds
    it hides at a given shape — and the returned dict still carries both
    bounds; use the AOT pair detail (instructions/fusions between halves)
    to justify a task-specific overlap argument.

    efficiency = T1 / (S * T_S) where T_S = T1/S + exposed_comm.
    """
    t_comp = step_time_1chip_s / num_shards
    t_comm = comm_bytes_per_shard / ici_bytes_per_s
    exposed = (1.0 - overlap) * t_comm
    t_s = t_comp + exposed
    return {
        "t_comp_s": t_comp,
        "t_comm_s": t_comm,
        "t_comm_exposed_s": exposed,
        "step_time_s": t_s,
        "efficiency": t_comp / t_s,
        # evidence-based bounds (AOT schedule shows sync collectives ->
        # the no-overlap bound is the expectation, full-overlap the ceiling)
        "efficiency_no_overlap": t_comp / (t_comp + t_comm),
        "efficiency_full_overlap": 1.0,
    }
