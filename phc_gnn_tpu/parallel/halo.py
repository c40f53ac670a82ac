"""Node-sharded graph parallelism with boundary (halo) exchange — the
BASELINE.json north star (SURVEY.md sections 2.5, 5.7).

The padded batch's NODES are partitioned into contiguous ranges across the
``ep`` mesh axis (owner of global node g = ``g // NS``); every edge lives with
the shard that owns its RECEIVER.  Consequences, by design:

- Every segment reduction (sum/mean/min/max, PNA, and the two-pass softmax)
  is purely LOCAL: a node's complete in-edge set sits on its owner.  No
  full-node psum per conv — the replicated-EP scheme's O(N*d) all-reduce
  (parallel/edge_partition.py) disappears.
- Per-node compute — encoders, PHM transform GEMMs, BN, activations, dropout
  — runs on [NS = N/S] rows per shard: 1/S of the FLOPs.
- The only per-layer communication is the HALO: features of boundary *sender*
  nodes referenced by another shard's edges.  The host partitioner emits, per
  ordered shard pair (s, t), the list of s-owned rows t needs (padded to the
  static width H = roundup(max cut)); the exchange is one tiled
  ``lax.all_to_all`` of [S*H, d] — comm bytes proportional to the boundary
  size, not to N.  The exchange is OVERLAPPED with local compute (round 5):
  every halo-path jit compiles with xla_tpu_enable_async_all_to_all
  (HALO_TPU_COMPILER_OPTIONS below) and the sender gather splits local from
  remote rows (ops/stream_scan.py split_take) so the local gather carries no
  dependency on the in-flight exchange.  Schedule-level evidence: the AOT
  v5e 2x4 compile (scripts/aot_overlap_check.py, AOT_SCHEDULE.json) shows
  all 8 per-step exchanges as async start/done pairs with compute — conv
  transform weight-prep fusions, local stream work — scheduled between the
  halves (round 4's default compile had them synchronous; that baseline is
  re-recorded in the same JSON for comparison).

Replaces the reference's single-GPU assumption (no counterpart); the graph
analogue of sequence-parallel boundary exchange.  Cross-shard-exact BN uses
the axis_name plumbing in nn/norm.py; graph pooling psums its [G, d] partial
sums (G is small, so this collective is negligible).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.utils import round_up
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from phc_gnn_tpu.graph.batch import GraphsTuple
from phc_gnn_tpu.parallel.dp import loss_weight, weighted_mean
from phc_gnn_tpu.train.state import TrainState, apply_optimizer, make_loss_and_aux

__all__ = [
    "SlotOverflow",
    "partition_nodes",
    "halo_exchange",
    "HALO_TPU_COMPILER_OPTIONS",
    "halo_compiler_options",
    "node_partition_specs",
    "make_np_train_step",
    "make_np_eval_step",
    "make_dp_np_train_step",
    "make_dp_np_eval_step",
    "make_dp_np_batch_specs",
    "make_scan_np_train_steps",
    "make_scan_dp_np_train_steps",
]


# TPU compile options for every halo-path jit: convert the per-layer halo
# all_to_alls into async start/done pairs so the latency-hiding scheduler can
# place independent compute (bond encoders, local message/stream work) between
# the halves — the BASELINE north star's "overlapped with local aggregation".
# Round-4's AOT v5e 2x4 schedule proved the default compiles them SYNC (8
# sync, 0 async pairs); with this option the same step compiles to async
# pairs with compute scheduled inside (AOT_SCHEDULE.json, round 5, via
# scripts/aot_overlap_check.py).  TPU-only: the CPU backend (virtual-mesh
# tests, driver dryrun) rejects unknown TPU options, so jits pass it only
# when the default backend is TPU (halo_compiler_options()).
HALO_TPU_COMPILER_OPTIONS = {"xla_tpu_enable_async_all_to_all": "true"}


def halo_compiler_options():
    import jax as _jax
    return (dict(HALO_TPU_COMPILER_OPTIONS)
            if _jax.default_backend() == "tpu" else None)


class SlotOverflow(ValueError):
    """A fixed edge_slots/halo_slots capacity is too small for this batch.

    Raised (instead of a bare assert) so the trainer's rung-growth path can
    catch exactly this condition and re-partition at larger slot sizes,
    without swallowing unrelated assertion failures (ADVICE r2)."""

    def __init__(self, needed_edge_slots: int, needed_halo_slots: int,
                 msg: str):
        super().__init__(msg)
        self.needed_edge_slots = needed_edge_slots
        self.needed_halo_slots = needed_halo_slots



def partition_nodes(batch: GraphsTuple, num_shards: int,
                    halo_align: int = 8, edge_align: int = 128,
                    edge_slots: Optional[int] = None,
                    halo_slots: Optional[int] = None,
                    scan_plan: bool = False,
                    scan_block: Optional[int] = None,
                    scan_min_passes: int = 0) -> GraphsTuple:
    """Host-side partitioner: stacked per-shard arrays with leading axis S.

    Returns a GraphsTuple whose node/edge arrays carry a leading shard axis
    (to be sharded over ``ep`` via shard_map) and whose ``senders`` index the
    per-shard AUGMENTED feature array [NS + S*H]: rows < NS are local nodes,
    row NS + t*H + i is the i-th halo row received from shard t (see
    halo_exchange).  ``receivers`` are shard-local.  y/graph_mask stay global
    (replicated).  Requires receiver-sorted edges (batch_graphs guarantees).

    With ``scan_plan=True`` also emits stacked per-shard streaming-scan plans
    (ops/stream_scan.py): each shard's edge slice stays receiver-sorted
    (contiguous slice of the sorted global list, shifted by the shard's node
    offset; padding rows point at the last local row), so the single-chip
    streamed aggregation kernel runs unchanged inside each shard."""
    S = num_shards
    N = batch.num_nodes
    NS = round_up((N + S - 1) // S, 8)
    nodes = np.asarray(batch.nodes)
    recv = np.asarray(batch.receivers).astype(np.int64)
    send = np.asarray(batch.senders).astype(np.int64)
    edges = np.asarray(batch.edges)
    edge_mask = np.asarray(batch.edge_mask)
    node_mask = np.asarray(batch.node_mask)
    graph_ids = np.asarray(batch.graph_ids)
    G = batch.num_graphs

    assert np.all(recv[1:] >= recv[:-1]), "partition_nodes needs sorted edges"

    # partition REAL edges only: the batch's global padding edges all point
    # at the last node row, so owner-by-receiver would dump every padding
    # slot on the last shard, inflating ES for all shards (each shard gets
    # its own padding tail below instead — balanced and much smaller)
    recv = recv[edge_mask]
    send = send[edge_mask]
    edges = edges[edge_mask]
    owner_e = np.minimum(recv // NS, S - 1)

    # per-shard edge slices (contiguous because edges are receiver-sorted)
    counts = np.bincount(owner_e, minlength=S)
    ES = round_up(max(int(counts.max()), 1), edge_align)
    e_starts = np.concatenate([[0], np.cumsum(counts)])

    # halo send lists: for each (src_owner t, edge_owner s) pair the unique
    # t-owned sender nodes referenced by s's edges
    send_lists = [[None] * S for _ in range(S)]
    max_cut = 0
    for s in range(S):
        lo, hi = e_starts[s], e_starts[s + 1]
        es_send = send[lo:hi]
        es_owner = np.minimum(es_send // NS, S - 1)
        for t in range(S):
            if t == s:
                continue
            uniq = np.unique(es_send[es_owner == t])
            send_lists[t][s] = uniq
            max_cut = max(max_cut, len(uniq))
    H = round_up(max(max_cut, 1), halo_align)
    # both capacity checks deferred to here so one SlotOverflow carries both
    # needed sizes (the trainer's rung growth re-partitions exactly once)
    if ((edge_slots is not None and ES > edge_slots)
            or (halo_slots is not None and H > halo_slots)):
        raise SlotOverflow(ES, H, (
            f"shard needs edge_slots={ES} (fixed {edge_slots}), "
            f"halo_slots={H} (fixed {halo_slots})"))
    if edge_slots is not None:
        ES = edge_slots
    if halo_slots is not None:
        H = halo_slots

    F_node = nodes.shape[1:]
    F_edge = edges.shape[1:]
    out_nodes = np.zeros((S, NS) + F_node, nodes.dtype)
    out_nmask = np.zeros((S, NS), bool)
    out_gids = np.full((S, NS), G - 1, np.int32)
    out_edges = np.zeros((S, ES) + F_edge, edges.dtype)
    out_emask = np.zeros((S, ES), bool)
    out_send = np.zeros((S, ES), np.int32)
    out_recv = np.full((S, ES), NS - 1, np.int32)
    halo_send = np.zeros((S, S, H), np.int32)

    for t in range(S):
        for s in range(S):
            if t == s or send_lists[t][s] is None or len(send_lists[t][s]) == 0:
                continue
            uniq = send_lists[t][s]
            halo_send[t, s, :len(uniq)] = uniq - t * NS

    for s in range(S):
        lo_n = s * NS
        n_here = max(0, min(N - lo_n, NS))
        if n_here > 0:
            out_nodes[s, :n_here] = nodes[lo_n:lo_n + n_here]
            out_nmask[s, :n_here] = node_mask[lo_n:lo_n + n_here]
            out_gids[s, :n_here] = graph_ids[lo_n:lo_n + n_here]
        lo, hi = e_starts[s], e_starts[s + 1]
        ne = hi - lo
        if ne == 0:
            continue
        out_edges[s, :ne] = edges[lo:hi]
        out_emask[s, :ne] = True  # real edges only; padding tail stays False
        out_recv[s, :ne] = (recv[lo:hi] - lo_n).astype(np.int32)
        # senders -> augmented index space
        es_send = send[lo:hi]
        es_owner = np.minimum(es_send // NS, S - 1)
        aug = np.zeros(ne, np.int32)
        local = es_owner == s
        aug[local] = (es_send[local] - lo_n).astype(np.int32)
        for t in range(S):
            if t == s:
                continue
            sel = es_owner == t
            if not sel.any():
                continue
            # slot of each remote sender within t's (sorted-unique) send list
            uniq = send_lists[t][s]
            aug[sel] = (NS + t * H
                        + np.searchsorted(uniq, es_send[sel])).astype(np.int32)
        out_send[s, :ne] = aug
        # padding receiver rows already NS-1 via init

    scan_fields = {}
    if scan_plan:
        from phc_gnn_tpu.ops.stream_scan import (DEFAULT_SCAN_BLOCK,
                                                 build_scan_plan,
                                                 build_sender_plan)
        blk = scan_block or DEFAULT_SCAN_BLOCK
        def unify(build, gate_idx, args_per_shard):
            """Per-shard plans stack on a leading S axis, so every shard
            must emit the same adaptive gate-lane count: rebuild narrow
            shards at the widest shard's depth.  ``scan_min_passes`` lets
            callers that stack multiple PARTITIONS (dp groups, stress
            scripts) force a common floor across batches too."""
            ps = [build(*a, min_passes=scan_min_passes)
                  for a in args_per_shard]
            widths = {p[gate_idx].shape[-1] for p in ps}
            if len(widths) > 1:
                np_max = (max(widths) - 2) // 2
                ps = [build(*a, min_passes=np_max) for a in args_per_shard]
            return ps

        plans = unify(build_scan_plan, 0,
                      [(out_recv[s], NS, blk, out_emask[s])
                       for s in range(S)])
        # sender-sorted plan over the AUGMENTED [NS + S*H] index space, so
        # the message gather's streamed backward works inside each shard too
        splans = unify(build_sender_plan, 1,
                       [(out_send[s], NS + S * H, blk, out_emask[s])
                        for s in range(S)])
        scan_fields = dict(
            scan_flags=jnp.asarray(np.stack([p[0] for p in plans])),
            scan_cont=jnp.asarray(np.stack([p[1] for p in plans])),
            last_edge=jnp.asarray(np.stack([p[2] for p in plans])),
            snd_perm=jnp.asarray(np.stack([p[0] for p in splans])),
            snd_flags=jnp.asarray(np.stack([p[1] for p in splans])),
            snd_cont=jnp.asarray(np.stack([p[2] for p in splans])),
            snd_last=jnp.asarray(np.stack([p[3] for p in splans])))

    return GraphsTuple(
        nodes=jnp.asarray(out_nodes), edges=jnp.asarray(out_edges),
        senders=jnp.asarray(out_send), receivers=jnp.asarray(out_recv),
        graph_ids=jnp.asarray(out_gids),
        node_mask=jnp.asarray(out_nmask), edge_mask=jnp.asarray(out_emask),
        graph_mask=batch.graph_mask, y=batch.y,
        halo_send=jnp.asarray(halo_send), **scan_fields)


def halo_exchange(x: jax.Array, halo_send: jax.Array, axis_name: str):
    """Inside shard_map: ship this shard's boundary rows to every peer and
    receive theirs.  ``halo_send`` [S, H] lists local rows to send to each
    shard; returns [S*H, d] where rows [t*H:(t+1)*H] are shard t's block for
    us — matching the aug index NS + t*H + i used by partition_nodes."""
    s, h = halo_send.shape
    buf = jnp.take(x, halo_send.reshape(s * h), axis=0)  # [S*H, d]
    return jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)


def node_partition_specs(has_y: bool = True,
                         has_scan: bool = False) -> GraphsTuple:
    """PartitionSpecs: per-shard stacks over ep, labels/graph masks replicated."""
    scan = dict(scan_flags=P("ep"), scan_cont=P("ep"), last_edge=P("ep"),
                snd_perm=P("ep"), snd_flags=P("ep"), snd_cont=P("ep"),
                snd_last=P("ep")) if has_scan else {}
    return GraphsTuple(
        nodes=P("ep"), edges=P("ep"), senders=P("ep"), receivers=P("ep"),
        graph_ids=P("ep"), node_mask=P("ep"), edge_mask=P("ep"),
        graph_mask=P(), y=P() if has_y else None, halo_send=P("ep"), **scan)


def _strip_shard_axis(batch: GraphsTuple) -> GraphsTuple:
    """Drop the leading per-device axis of the stacked shard arrays (inside
    shard_map each device holds [1, ...]); replicated fields pass through."""
    stacked = {"nodes", "edges", "senders", "receivers", "graph_ids",
               "node_mask", "edge_mask", "halo_send", "scan_flags",
               "scan_cont", "last_edge", "snd_perm", "snd_flags", "snd_cont",
               "snd_last"}
    updates = {f: getattr(batch, f)[0] for f in stacked
               if getattr(batch, f) is not None}
    return batch.replace(**updates)


def _jit_y_dispatch(device_step, mesh, specs_fn, donate: bool, out_spec=P()):
    variants = {
        (has_y, has_scan): shard_map(
            device_step, mesh=mesh,
            in_specs=(P(), specs_fn(has_y, has_scan), P()),
            out_specs=(P(), P(), out_spec), check_vma=False)
        for has_y in (True, False) for has_scan in (True, False)}

    def dispatch(state, batch, lr):
        step = variants[(batch.y is not None, batch.scan_flags is not None)]
        return step(state, batch, lr)

    return jax.jit(dispatch, donate_argnums=(0,) if donate else (),
                   compiler_options=halo_compiler_options())


def _np_device_step(model, tx, loss_fn: Callable, weight_decay: float,
                    weight_decay2: float, reg_p: int):
    """The per-device body shared by the plain and scanned np train steps."""

    def device_step(state: TrainState, batch: GraphsTuple, lr: jax.Array):
        batch = _strip_shard_axis(batch)
        # identical rng across ep shards: the model folds the shard index into
        # its per-layer node-dropout rngs itself and keeps the downstream rng
        # shared (replicated [G] compute must agree across shards)
        rng = jax.random.fold_in(state.rng, state.step)
        loss_and_aux = make_loss_and_aux(
            model, loss_fn, weight_decay, weight_decay2, reg_p,
            state.batch_stats, batch, rng, lr)
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "ep")
        new_params, new_opt_state = apply_optimizer(tx, grads, state, lr)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state, step=state.step + 1)
        return new_state, loss, out

    return device_step


def make_np_train_step(model, tx, loss_fn: Callable, mesh: Mesh,
                       weight_decay: float = 0.0, weight_decay2: float = 0.0,
                       reg_p: int = 2, donate: bool = True):
    """Node-parallel train step over the ``ep`` axis: params replicated, nodes
    and edges sharded (see partition_nodes), halo exchanged per layer.

    The model must be built with ``node_axis='ep'``.  The loss is identical on
    every shard (pooling psums the graph sums), so each shard's raw grad is
    S x (its own nodes' contribution) — the forward psum transposes to a psum
    under check_vma=False — and the pmean recovers the exact total gradient,
    mirroring make_ep_train_step.  BN batch stats are already cross-shard
    exact (axis_name inside the norm), so new_stats are replicated as-is.
    """
    device_step = _np_device_step(model, tx, loss_fn, weight_decay,
                                  weight_decay2, reg_p)
    return _jit_y_dispatch(device_step, mesh, node_partition_specs, donate)


def _scan_stack_specs(specs):
    """Prepend a replicated scan axis to every PartitionSpec leaf (the stacked
    [T, ...] batch chunk scanned inside one shard_map call)."""
    return jax.tree_util.tree_map(
        lambda s: P(*((None,) + tuple(s))), specs,
        is_leaf=lambda x: isinstance(x, P))


def _scan_device_steps(device_step):
    """lax.scan the per-device step body over a stacked chunk of batches —
    inside the SAME shard_map call, so one dispatch drives T collective train
    steps (the dp/ep twin of train/state.py make_scan_train_steps; removes the
    per-step host round-trip that dominates on tunneled TPUs, VERDICT r2 weak
    #6)."""

    def device_steps(state: TrainState, batches: GraphsTuple, lr: jax.Array):
        def body(s, batch):
            s, loss, out = device_step(s, batch, lr)
            return s, (loss, out)

        state, (losses, outs) = jax.lax.scan(body, state, batches)
        return state, losses, outs

    return device_steps


def make_scan_np_train_steps(model, tx, loss_fn: Callable, mesh: Mesh,
                             weight_decay: float = 0.0,
                             weight_decay2: float = 0.0, reg_p: int = 2):
    """Scanned node-parallel train steps: batches is a stacked chunk with
    leading scan axis [T, S, ...]; returns (state, losses [T], outs [T, G, D]).
    """
    device_step = _np_device_step(model, tx, loss_fn, weight_decay,
                                  weight_decay2, reg_p)
    steps = _scan_device_steps(device_step)
    variants = {
        (has_y, has_scan): shard_map(
            steps, mesh=mesh,
            in_specs=(P(), _scan_stack_specs(
                node_partition_specs(has_y, has_scan)), P()),
            out_specs=(P(), P(), P()), check_vma=False)
        for has_y in (True, False) for has_scan in (True, False)}

    def dispatch(state, batches, lr):
        step = variants[(batches.y is not None,
                         batches.scan_flags is not None)]
        return step(state, batches, lr)

    return jax.jit(dispatch, donate_argnums=(0,),
                   compiler_options=halo_compiler_options())


def _jit_eval_y_dispatch(device_step, mesh, specs_fn, out_spec=P()):
    """Eval twin of _jit_y_dispatch: no lr arg, no state update, no donation."""
    variants = {
        (has_y, has_scan): shard_map(
            device_step, mesh=mesh,
            in_specs=(P(), specs_fn(has_y, has_scan)),
            out_specs=out_spec, check_vma=False)
        for has_y in (True, False) for has_scan in (True, False)}

    def dispatch(state, batch):
        step = variants[(batch.y is not None, batch.scan_flags is not None)]
        return step(state, batch)

    return jax.jit(dispatch, compiler_options=halo_compiler_options())


def make_np_eval_step(model, mesh: Mesh):
    """Node-parallel eval over ``ep``: params replicated, the partitioned
    batch sharded as in make_np_train_step, forward in inference mode.  The
    output is replicated (pooling psums the per-shard graph partials), so all
    shards participate instead of idling through eval (VERDICT r2 weak #5).
    The model must be built with ``node_axis='ep'``."""

    def device_step(state: TrainState, batch: GraphsTuple):
        batch = _strip_shard_axis(batch)
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, training=False)

    return _jit_eval_y_dispatch(device_step, mesh, node_partition_specs)


def make_dp_np_eval_step(model, mesh: Mesh):
    """Combined data + node-parallel eval over a (dp, ep) mesh: device-stacked
    dp groups of node-partitioned batches; returns outs [dp, G, T]."""

    def device_step(state: TrainState, batch: GraphsTuple):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # strip dp
        batch = _strip_shard_axis(batch)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, training=False)
        return out[None]

    return _jit_eval_y_dispatch(device_step, mesh, make_dp_np_batch_specs,
                                out_spec=P("dp"))


def make_dp_np_batch_specs(has_y: bool = True,
                           has_scan: bool = False) -> GraphsTuple:
    """dp x np: leading device-stack axis over dp, shard stack over ep."""
    scan = dict(scan_flags=P("dp", "ep"), scan_cont=P("dp", "ep"),
                last_edge=P("dp", "ep"), snd_perm=P("dp", "ep"),
                snd_flags=P("dp", "ep"), snd_cont=P("dp", "ep"),
                snd_last=P("dp", "ep")) if has_scan else {}
    return GraphsTuple(
        nodes=P("dp", "ep"), edges=P("dp", "ep"), senders=P("dp", "ep"),
        receivers=P("dp", "ep"), graph_ids=P("dp", "ep"),
        node_mask=P("dp", "ep"), edge_mask=P("dp", "ep"),
        graph_mask=P("dp"), y=P("dp") if has_y else None,
        halo_send=P("dp", "ep"), **scan)


def _dp_np_device_step(model, tx, loss_fn: Callable, weight_decay: float,
                       weight_decay2: float, reg_p: int, loss_name: str):
    def device_step(state: TrainState, batch: GraphsTuple, lr: jax.Array):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # strip dp
        batch = _strip_shard_axis(batch)
        # distinct rng per dp shard (independent batches), shared across ep
        rng = jax.random.fold_in(state.rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        loss_and_aux = make_loss_and_aux(
            model, loss_fn, weight_decay, weight_decay2, reg_p,
            state.batch_stats, batch, rng, lr)
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "ep")
        w = loss_weight(batch, loss_name)
        grads = weighted_mean(grads, w, "dp")
        loss = weighted_mean(loss, w, "dp")
        # BN stats: new_stats are already identical across ep (the norm psums
        # its batch statistics over the node shards), but the dp weight must
        # be the GLOBAL node count of this dp-batch — node_mask is sharded
        # over ep, so an un-psum'd sum would weight each ep device by its
        # local shard and silently decohere batch_stats across ep
        w_bn = jax.lax.psum(jnp.sum(batch.node_mask).astype(jnp.float32),
                            "ep")
        new_stats = weighted_mean(new_stats, w_bn, "dp")
        new_params, new_opt_state = apply_optimizer(tx, grads, state, lr)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state, step=state.step + 1)
        return new_state, loss, out[None]

    return device_step


def make_dp_np_train_step(model, tx, loss_fn: Callable, mesh: Mesh,
                          weight_decay: float = 0.0, weight_decay2: float = 0.0,
                          reg_p: int = 2, donate: bool = True,
                          loss_name: str = "l1"):
    """Combined data + node parallelism over a (dp, ep) mesh: batches stacked
    over dp, each batch node-sharded over ep with halo exchange.  Grads: pmean
    over ep reconstructs each batch's exact grad (see make_np_train_step),
    then a load-weighted mean over dp combines data shards exactly."""
    device_step = _dp_np_device_step(model, tx, loss_fn, weight_decay,
                                     weight_decay2, reg_p, loss_name)
    return _jit_y_dispatch(device_step, mesh, make_dp_np_batch_specs, donate,
                           out_spec=P("dp"))


def make_scan_dp_np_train_steps(model, tx, loss_fn: Callable, mesh: Mesh,
                                weight_decay: float = 0.0,
                                weight_decay2: float = 0.0, reg_p: int = 2,
                                loss_name: str = "l1"):
    """Scanned dp x np train steps: batches is a stacked chunk of dp groups
    with leading scan axis [T, dp, S, ...]; returns (state, losses [T],
    outs [T, dp, G, D])."""
    device_step = _dp_np_device_step(model, tx, loss_fn, weight_decay,
                                     weight_decay2, reg_p, loss_name)
    steps = _scan_device_steps(device_step)
    variants = {
        (has_y, has_scan): shard_map(
            steps, mesh=mesh,
            in_specs=(P(), _scan_stack_specs(
                make_dp_np_batch_specs(has_y, has_scan)), P()),
            out_specs=(P(), P(), P(None, "dp")), check_vma=False)
        for has_y in (True, False) for has_scan in (True, False)}

    def dispatch(state, batches, lr):
        step = variants[(batches.y is not None,
                         batches.scan_flags is not None)]
        return step(state, batches, lr)

    return jax.jit(dispatch, donate_argnums=(0,),
                   compiler_options=halo_compiler_options())
