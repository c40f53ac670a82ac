"""Streaming segmented-scan segment reduction (round-2 kernel, KERNELS.md).

Replaces torch_scatter's CUDA segment kernels (reference:
phc/hypercomplex/aggregator.py:70-103, scatter_softmax at
undirectional/messagepassing.py:212-214) with a TPU-native design that touches
each message O(1) times with O(1) FLOPs — unlike the round-1 one-hot-matmul
tiles (removed in round 3; record in KERNELS.md) whose S-matmul cost could only tie XLA.

Design
------
Edges arrive sorted by receiver (the batcher guarantees it).  A single
sequential-grid Pallas kernel computes the *segmented inclusive prefix sum*
of the message stream along the edge axis:

  - per block of BE rows: the classic flag/value segmented scan —
    log2(BE) shifted adds (`pltpu.roll` down the sublane axis), each gated
    by a HOST-PRECOMPUTED per-pass gate lane (round 4: the whole flag
    evolution is baked into the plan, see _pack_scan_gates);
  - a VMEM carry (running sum of the block's trailing segment) propagates
    across grid steps; a host-precomputed `cont[b]` bit says whether block
    b's first row continues the previous block's last segment.

Each segment's total then sits at its LAST edge row, so the per-node result
is a dense gather `scan[last_edge[n]]` (host-built CSR end pointers, -1 for
isolated nodes) — a bandwidth-speed XLA gather, with no dynamic scatter, no
one-hot matmul, and no plan inflation.  The backward pass of segment-sum is
the transpose gather `g[recv]`, also scatter-free.

The fused softmax variant runs ONE pass over the messages computing
w = exp(beta*m - segmax[recv]) and jointly scanning [w*m, w]; the epilogue
divides the two end-gathers.  Compare: the XLA composite touches the edge
stream ~4x (max, exp, two segment-sums).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from phc_gnn_tpu.utils import round_up
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "attach_scan_plan",
    "build_scan_plan",
    "build_sender_plan",
    "gather_nodes_streamed",
    "segment_max_agg_streamed",
    "segment_max_streamed",
    "segment_mean_streamed",
    "segment_min_agg_streamed",
    "segment_std_streamed",
    "segment_sum_streamed",
    "segment_var_streamed",
    "softmax_aggregate_streamed",
    "STREAMED_AGGREGATORS",
    "DEFAULT_SCAN_BLOCK",
]

DEFAULT_SCAN_BLOCK = 256  # BE: edge rows per grid step.  Swept on-chip
# (KERNELS.md): 256 is the clear optimum — segment-sum hits the HBM
# bandwidth floor (15 us at 8192x200, 4x faster than 512); 128 and 1024
# are both slower (non-monotonic: pipelining vs log2(BE) roll passes).



def _pack_scan_gates(flags: np.ndarray, block_edges: int,
                     min_passes: int = 0) -> np.ndarray:
    """Precompute the per-pass combine gates of the segmented scan ON HOST.

    Round 4: the in-kernel flag evolution (log2(BE) roll/max passes over a
    [BE, 1] column, run per kernel invocation) is a pure function of the
    static plan, so the host bakes it into the plan once per bucket shape.
    Kernels then read one gate lane per pass — each data pass becomes a
    single roll+combine — cutting ~40 % of the scan kernels' VPU work
    (flag columns are half the vreg count of the 200-lane data).

    Returns [EB, 2*NP+2] f32, NP = log2(BE):
      lanes [0, NP)        forward-scan gates (gate_s = (1-ff)*valid, the
                           exact per-pass combine mask of `_scan_gates`)
      lane  NP             s0 — rows of the block's leading run (the
                           cross-block carry mask)
      lanes [NP+1, 2NP+1)  suffix-scan gates over the segment-END flags
                           (eflags[i] = flags[i+1] globally)
      lane  2NP+1          t0 — rows of the block's trailing run (the
                           reverse cross-block carry mask)
    """
    eb = flags.shape[0]
    nb = eb // block_edges
    be = block_edges
    np_full = be.bit_length() - 1
    assert be == 1 << np_full, "scan block must be a power of two"
    r = np.arange(be)
    fb = flags.reshape(nb, be).astype(np.float32)

    # ---- adaptive pass depth (round 5).  A pass with shift s only does work
    # where some in-block run is longer than s; the kernels derive their pass
    # count from the gate LANE COUNT (_num_passes), so emitting only the
    # needed lanes skips the deep passes with zero kernel changes.  Measured
    # (scripts/bench_pass_depth.py, 8192x200 block 256): the "tile-granular"
    # deep rolls are NOT free — passes s=8..128 cost 29 of the sum-scan's
    # 53 us (s=128 alone 15 us) — so molecular streams (degree <= 16 incl.
    # self loop) drop from 8 to 4 passes.  Depth = longest in-block run in
    # EITHER orientation (fwd: block row 0 acts as a run start; suffix: last
    # row acts as a run end), quantized to {4, np_full} so bucket shapes
    # stay stable across batches (at most two compile shapes per bucket).
    fb_fwd = fb.copy()
    fb_fwd[:, 0] = 1.0
    idx = np.nonzero(fb_fwd.reshape(-1))[0]
    max_run = int(np.diff(np.append(idx, nb * be)).max())
    ef_full = np.concatenate([flags[1:], [1.0]]).astype(np.float32)
    eb_rev = ef_full.reshape(nb, be)[:, ::-1].copy()
    eb_rev[:, 0] = 1.0
    idx_s = np.nonzero(eb_rev.reshape(-1))[0]
    max_run = max(max_run, int(np.diff(np.append(idx_s, nb * be)).max()))
    needed = max(1, int(np.ceil(np.log2(max(max_run, 1))))) if max_run > 1 \
        else 1
    needed = max(needed, min_passes)  # caller-forced floor (stacked shards)
    # quantize {4, 6, np_full}: measured (bench_pass_depth) NP=4..6 all cost
    # ~31 us vs 38/53 at NP=7/8 — s=64 and especially s=128 are the
    # expensive deep rolls — so runs <= 64 stay on the cheap tier while
    # shapes remain stable (<= 3 compile variants per bucket)
    for q in (4, 6):
        if needed <= q < np_full:
            np_passes = q
            break
    else:
        np_passes = np_full

    out = np.zeros((nb, be, 2 * np_passes + 2), np.float32)

    # forward gates + s0 (mirrors _scan_core's former in-kernel evolution)
    ff = fb.copy()
    ff[:, 0] = 1.0
    s = 1
    for p in range(np_passes):
        valid = (r >= s).astype(np.float32)
        fs = np.roll(ff, s, axis=1)
        fs = np.maximum(fs * valid, 1.0 - valid)
        out[:, :, p] = (1.0 - ff) * valid
        ff = np.maximum(ff, fs)
        s *= 2
    fl = fb.copy()
    fl[:, 0] = 0.0
    s = 1
    for p in range(np_passes):
        fl = np.maximum(fl, np.roll(fl, s, axis=1) * (r >= s))
        s *= 2
    out[:, :, np_passes] = (fl == 0.0)

    # suffix gates + t0 over global eflags (last global row ends its segment)
    ef = np.concatenate([flags[1:], [1.0]]).astype(np.float32)
    eb_ = ef.reshape(nb, be)
    gg = eb_.copy()
    gg[:, be - 1] = 1.0
    s = 1
    for p in range(np_passes):
        valid = (r < be - s).astype(np.float32)
        gs = np.roll(gg, -s, axis=1)
        gs = np.maximum(gs * valid, 1.0 - valid)
        out[:, :, np_passes + 1 + p] = (1.0 - gg) * valid
        gg = np.maximum(gg, gs)
        s *= 2
    gl = eb_.copy()
    gl[:, be - 1] = 0.0
    s = 1
    for p in range(np_passes):
        gl = np.maximum(gl, np.roll(gl, -s, axis=1) * (r < be - s))
        s *= 2
    out[:, :, 2 * np_passes + 1] = (gl == 0.0)
    return out.reshape(eb, 2 * np_passes + 2)


def build_scan_plan(receivers: np.ndarray, num_nodes: int,
                    block_edges: int = DEFAULT_SCAN_BLOCK,
                    edge_mask: Optional[np.ndarray] = None,
                    min_passes: int = 0):
    """Host-side static plan for a receiver array sorted ascending.

    Returns (gates [E, 2*NP+2] f32 packed per-pass scan gates — see
    _pack_scan_gates; NP adapts to the data's longest in-block run —
    cont [NB] i32 continuation bits, last_edge [N] i32 index of each node's
    last edge or -1).  Padding edges must already point at the last node row
    with mask False — they extend its segment and are zeroed by the caller.

    With ``edge_mask`` (round 5): the TRAILING all-masked run (the batcher's
    padding tail — often ~20 % of the edge array, all pointing at one node)
    is isolated into one-row segments and ``last_edge`` points at the last
    REAL edge instead, so the tail cannot force full scan depth.  Exact:
    padding rows contribute zeros and are never gathered.  Masked edges
    interleaved among real ones (not part of the trailing run) keep the old
    in-segment treatment.

    ``block_edges`` must be a power of two (the packed gate lanes encode one
    roll+combine pass per bit; _pack_scan_gates asserts this).
    """
    receivers = np.asarray(receivers, np.int64)
    e = receivers.shape[0]
    split = e  # rows >= split: isolated one-row segments, never gathered
    if edge_mask is not None and e > 0:
        m = np.asarray(edge_mask, bool)
        nz = np.nonzero(m)[0]
        split = int(nz[-1]) + 1 if nz.size else 0
    eb = round_up(max(e, 1), block_edges)
    flags = np.ones(eb, np.float32)
    if split > 0:
        flags[1:split] = (receivers[1:split]
                          != receivers[:split - 1]).astype(np.float32)
        # rows in [split, eb) keep flag=1 (zero-padded one-row segments)
    nb = eb // block_edges
    cont = np.zeros(nb, np.int32)
    starts = np.arange(1, nb) * block_edges
    valid = starts < split
    cont[1:][valid] = (receivers[starts[valid]]
                       == receivers[starts[valid] - 1]).astype(np.int32)
    last = np.full(num_nodes, -1, np.int64)
    if split > 0:
        # ascending -> final write is the max; tail rows excluded so the
        # last padded node's gather lands on its last REAL edge
        last[receivers[:split]] = np.arange(split)
    gates = _pack_scan_gates(flags, block_edges, min_passes=min_passes)
    return gates, cont, last.astype(np.int32)


def build_sender_plan(senders: np.ndarray, num_src_rows: int,
                      block_edges: int = DEFAULT_SCAN_BLOCK,
                      edge_mask: Optional[np.ndarray] = None,
                      min_passes: int = 0):
    """Host-side plan that turns the message gather's backward scatter
    ``dx[senders] += g`` into a streamed segment-sum (VERDICT r2 #4: the
    >=16k gather-locality cliff is the XLA scatter lowering, and senders —
    unlike receivers — are free to reorder).

    Returns (perm [E] i32 stable sort-by-sender permutation, flags, cont,
    last) where the scan plan is built over senders[perm].  With
    ``edge_mask``, masked (padding) edges sort to the END regardless of
    their sender value, so the tail-isolation of build_scan_plan applies
    (their cotangents are zero by construction — every aggregation kernel
    masks before reducing)."""
    senders = np.asarray(senders, np.int64)
    if edge_mask is not None:
        m = np.asarray(edge_mask, bool)
        key = np.where(m, senders, np.int64(num_src_rows))
        perm = np.argsort(key, kind="stable")
        flags, cont, last = build_scan_plan(senders[perm], num_src_rows,
                                            block_edges, edge_mask=m[perm],
                                            min_passes=min_passes)
    else:
        perm = np.argsort(senders, kind="stable")
        flags, cont, last = build_scan_plan(senders[perm], num_src_rows,
                                            block_edges,
                                            min_passes=min_passes)
    return perm.astype(np.int32), flags, cont, last


def attach_scan_plan(batch, block_edges: int = DEFAULT_SCAN_BLOCK,
                     sender_plan: bool = True):
    """Host-side: build the streaming-scan plan for a padded GraphsTuple and
    return a copy carrying it (scan_flags / scan_cont / last_edge — see
    graph/batch.py), plus the sender-sorted plan for the message-gather
    backward (snd_*).  Requires receiver-sorted edges (batch_graphs and the
    native packer both guarantee it; asserted here).  ``block_edges`` must
    be a power of two (see build_scan_plan)."""
    recv = np.asarray(batch.receivers)
    assert recv.ndim == 1 and np.all(recv[1:] >= recv[:-1]), \
        "scan plan needs receiver-sorted edges"
    emask = (np.asarray(batch.edge_mask) if batch.edge_mask is not None
             else None)
    flags, cont, last = build_scan_plan(recv, batch.num_nodes, block_edges,
                                        edge_mask=emask)
    snd = {}
    if sender_plan:
        sp, sf, sc, sl = build_sender_plan(batch.senders, batch.num_nodes,
                                           block_edges, edge_mask=emask)
        snd = dict(snd_perm=jnp.asarray(sp), snd_flags=jnp.asarray(sf),
                   snd_cont=jnp.asarray(sc), snd_last=jnp.asarray(sl))
    return batch.replace(scan_flags=jnp.asarray(flags),
                         scan_cont=jnp.asarray(cont),
                         last_edge=jnp.asarray(last), **snd)


_NEG = -(2.0 ** 100)  # max-scan identity: a POWER OF TWO so the bf16
# rounding of the suffix stream is exact on the identity (rnd(-1e30) !=
# -1e30 would make all-masked segments compute exp(logit-segmax) = inf)


def _num_passes(gref):
    """Passes NP from a packed-gates ref/array of L = 2*NP+2 lanes."""
    return (gref.shape[1] - 2) // 2


def _fwd_gates(g):
    """(shift, gate) pairs + s0 from the packed host-built gate lanes.

    Round 4: gates are precomputed on host (`_pack_scan_gates`) — each data
    pass is one roll+combine, with NO in-kernel flag evolution.  (The
    earlier depth-reduction attempt — a two-phase scan over 8-row sublane
    groups — is a measured non-win recorded in KERNELS.md round 4: rolls by
    multiples of 8 are tile-granular vreg moves, so the deep passes it
    would eliminate are the cheap ones, and the compaction relayouts or
    selection matmuls cost more than they save.)"""
    np_ = _num_passes(g)
    gates = [(1 << p, g[:, p:p + 1]) for p in range(np_)]
    s0 = g[:, np_:np_ + 1]
    return gates, s0


def _scan_with_gates(v, gates, op: str):
    """Segmented inclusive prefix scan of one [BE, D] stream given the
    precomputed flag gates (log2(BE) shifted roll-combine passes)."""
    for s, gate in gates:
        vs = pltpu.roll(v, s, axis=0)
        if op == "add":
            v = v + gate * vs
        else:
            v = jnp.maximum(v, jnp.where(gate > 0, vs, _NEG))
    return v


def _apply_carry(v, s0gate, carry, op: str):
    if op == "add":
        return v + s0gate * carry[0:1, :]
    return jnp.maximum(v, jnp.where(s0gate > 0, carry[0:1, :], _NEG))


def _scan_core(cont_ref, flags_ref, v1_in, v2_in, out_ref, out2_ref, carry,
               carry2, op: str = "add"):
    """Segmented inclusive scan of one grid step's [BE, D] VALUES with carry.

    When v2_in/out2 are present, the identical flag structure scans a second
    stream in the same pass (the softmax numerator/denominator pair).
    ``op`` picks the combine: 'add' (segment sum) or 'max' (segment max,
    identity -1e30 — used for the streamed softmax max pass).
    """
    b = pl.program_id(0)
    be = v1_in.shape[0]

    # scratch persists across grid steps but starts uninitialized: set it to
    # the combine's identity on the first step (gate*garbage would still be
    # NaN for garbage=NaN)
    @pl.when(b == 0)
    def _():
        ident = 0.0 if op == "add" else _NEG
        carry[...] = jnp.full_like(carry, ident)
        if carry2 is not None:
            carry2[...] = jnp.full_like(carry2, ident)

    gates, s0 = _fwd_gates(flags_ref[...])  # packed host-built lanes
    v1 = _scan_with_gates(v1_in, gates, op)
    if v2_in is not None:
        v2 = _scan_with_gates(v2_in, gates, op)

    # continuation: fold the carried trailing-segment partial into every row
    # of this block's FIRST run
    use_carry = (b > 0) & (cont_ref[b] == 1)
    s0gate = s0 * jnp.where(use_carry, 1.0, 0.0).astype(v1.dtype)
    v1 = _apply_carry(v1, s0gate, carry, op)
    if v2_in is not None:
        v2 = _apply_carry(v2, s0gate, carry2, op)

    carry[0:1, :] = v1[be - 1:be, :]
    out_ref[...] = v1
    if v2_in is not None:
        carry2[0:1, :] = v2[be - 1:be, :]
        out2_ref[...] = v2


def _scan_kernel(cont_ref, flags_ref, vals_ref, out_ref, carry, carry2=None,
                 vals2_ref=None, out2_ref=None, op: str = "add"):
    # convert at VMEM load: bf16 input streams halve HBM traffic while the
    # scan accumulates in f32
    _scan_core(cont_ref, flags_ref, vals_ref[...].astype(jnp.float32),
               vals2_ref[...].astype(jnp.float32)
               if vals2_ref is not None else None,
               out_ref, out2_ref, carry, carry2, op)


def _scan_kernel_pair(cont_ref, flags_ref, vals_ref, vals2_ref, out_ref,
                      out2_ref, carry, carry2):
    _scan_kernel(cont_ref, flags_ref, vals_ref, out_ref, carry, carry2,
                 vals2_ref, out2_ref)


def _suffix_max_core(carry_gate, g, v, out_ref, carry):
    """Segmented inclusive SUFFIX max of one block, processed on a REVERSED
    grid (later blocks first).  ``g`` is the packed host-built gate array
    (suffix lanes over the segment-END flags — _pack_scan_gates);
    ``carry_gate`` is 1.0 when the previously processed (later) block's
    leading segment continues this block's trailing run.  (A bf16 variant of
    this stream — monotone rounding commutes with max, so segmax stays
    segment-constant — was tried in round 4 and reverted: no measurable
    op-level win, and the rounding noise, amplified on cancellation-heavy
    segments, pushed the on-chip exactness scripts past their strict
    pure-relative bars.  KERNELS.md round 4.)"""
    be = v.shape[0]
    np_ = _num_passes(g)
    s = 1
    for p in range(np_):
        vs = pltpu.roll(v, be - s, axis=0)       # vs[i] = v[i + s]
        gate = g[:, np_ + 1 + p:np_ + 2 + p]
        v = jnp.maximum(v, jnp.where(gate > 0, vs, _NEG))
        s *= 2
    # carry applies to the trailing run (t0 lane)
    t0 = g[:, 2 * np_ + 1:2 * np_ + 2]
    v = jnp.maximum(v, jnp.where(t0 * carry_gate > 0, carry[0:1, :], _NEG))
    carry[0:1, :] = v[0:1, :]
    out_ref[...] = v.astype(out_ref.dtype)


def _softmax_suffix_max_kernel(cont_ref, beta_ref, gates_ref, msgs_ref,
                               mask_ref, out_ref, carry):
    """Reverse-grid suffix-max pass of the masked logits (round-3 softmax
    redesign, VERDICT r2 #3): emits, per edge, the max of its segment FROM
    that edge onward.  The forward fused kernel combines this with an
    in-VMEM prefix max to recover the full segment max at every edge —
    killing the scan_max readback + seg_max gather + smax_e broadcast of the
    two-kernel round-2 structure."""
    t = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.full_like(carry, _NEG)

    rb = nb - 1 - t  # the block this step processes
    # does block rb+1's first row continue block rb's last segment?
    cont_next = cont_ref[jnp.minimum(rb + 1, nb - 1)]
    gate = jnp.where((t > 0) & (cont_next == 1), 1.0, 0.0)
    v = jnp.where(mask_ref[...] > 0,
                  beta_ref[0] * msgs_ref[...].astype(jnp.float32), _NEG)
    _suffix_max_core(gate, gates_ref[...], v, out_ref, carry)


def _softmax_fused_kernel(cont_ref, beta_ref, flags_ref, msgs_ref,
                          suffmax_ref, mask_ref, out_num, out_den,
                          out_w=None, carry_max=None, carry_num=None,
                          carry_den=None):
    """Single forward pass of the round-3 fused softmax: recomputes the
    masked logits, runs the segmented prefix-max scan in VMEM (scratch), takes
    segmax = max(prefix, suffix) — constant across each segment since both
    scans are inclusive — and jointly scans [w*m, w] with
    w = mask * exp(logit - segmax).  The mask factor (not just the -1e30
    logit) makes all-masked segments yield 0/0 -> clamped 0 without any
    validity side-channel.  ``w`` is emitted as a residual stream so the
    backward never rebuilds the softmax weights (no exp, no smax gather);
    the eval/inference path drops the ``out_w`` output entirely — an [E, D]
    HBM write that only the backward reads (round 4, VERDICT r3 weak #6).

    Round 4: the gates and the s0 mask are read once from the host-packed
    plan and shared across the kernel's three scans (max + w*m + w)."""
    b = pl.program_id(0)
    be = msgs_ref.shape[0]

    @pl.when(b == 0)
    def _():
        carry_max[...] = jnp.full_like(carry_max, _NEG)
        carry_num[...] = jnp.zeros_like(carry_num)
        carry_den[...] = jnp.zeros_like(carry_den)

    m = msgs_ref[...].astype(jnp.float32)
    mask = mask_ref[...]
    logit = jnp.where(mask > 0, beta_ref[0] * m, _NEG)

    gates, s0 = _fwd_gates(flags_ref[...])
    use_carry = (b > 0) & (cont_ref[b] == 1)
    s0gate = s0 * jnp.where(use_carry, 1.0, 0.0).astype(jnp.float32)

    pm = _apply_carry(_scan_with_gates(logit, gates, "max"), s0gate,
                      carry_max, "max")
    carry_max[0:1, :] = pm[be - 1:be, :]
    segmax = jnp.maximum(pm, suffmax_ref[...])
    w = mask * jnp.exp(logit - segmax)
    if out_w is not None:
        out_w[...] = w

    num = _apply_carry(_scan_with_gates(w * m, gates, "add"), s0gate,
                       carry_num, "add")
    den = _apply_carry(_scan_with_gates(w, gates, "add"), s0gate,
                       carry_den, "add")
    carry_num[0:1, :] = num[be - 1:be, :]
    carry_den[0:1, :] = den[be - 1:be, :]
    out_num[...] = num
    out_den[...] = den


@functools.partial(jax.jit, static_argnames=("block_edges", "interpret"))
def _segmented_suffix_max(msgs, mask, beta, gates, cont,
                          block_edges: int = DEFAULT_SCAN_BLOCK,
                          interpret: bool = False):
    """Segmented suffix max-scan of where(mask, beta*msgs, _NEG), reverse
    grid (see _softmax_suffix_max_kernel); ``gates`` is the packed plan
    array (suffix lanes)."""
    eb, d = msgs.shape
    assert eb % block_edges == 0
    nb = eb // block_edges
    rev = lambda b, c, bt: (nb - 1 - b, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # cont, beta
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_edges, gates.shape[1]), rev),
            pl.BlockSpec((block_edges, d), rev),
            pl.BlockSpec((block_edges, 1), rev),
        ],
        out_specs=pl.BlockSpec((block_edges, d), rev),
        scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
    )
    return pl.pallas_call(
        _softmax_suffix_max_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((eb, d), jnp.float32),
        interpret=interpret,
    )(cont, beta.reshape(1), gates, msgs, mask)


def _softmax_fused_kernel_nw(cont_ref, beta_ref, flags_ref, msgs_ref,
                             suffmax_ref, mask_ref, out_num, out_den,
                             carry_max, carry_num, carry_den):
    """Eval-path variant: identical math, no ``w`` residual output."""
    _softmax_fused_kernel(cont_ref, beta_ref, flags_ref, msgs_ref,
                          suffmax_ref, mask_ref, out_num, out_den, None,
                          carry_max, carry_num, carry_den)


@functools.partial(jax.jit,
                   static_argnames=("block_edges", "interpret", "emit_w"))
def _segmented_scan_softmax_fused(msgs, suffmax, mask, beta, flags, cont,
                                  block_edges: int = DEFAULT_SCAN_BLOCK,
                                  interpret: bool = False,
                                  emit_w: bool = True):
    """Round-3 fused softmax forward: in-VMEM prefix max + suffix-max input
    -> segment max -> joint [w*m, w] scans, one pass over the messages.
    Returns (numer scan, denom scan, w residual stream or None) —
    ``emit_w=False`` (eval/inference, nothing will run the backward) skips
    the [E, D] residual write."""
    eb, d = msgs.shape
    assert eb % block_edges == 0
    nb = eb // block_edges
    fwd = lambda b, c, bt: (b, 0)  # noqa: E731
    n_out = 3 if emit_w else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # cont, beta
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_edges, flags.shape[1]), fwd),
            pl.BlockSpec((block_edges, d), fwd),
            pl.BlockSpec((block_edges, d), fwd),
            pl.BlockSpec((block_edges, 1), fwd),
        ],
        out_specs=[pl.BlockSpec((block_edges, d), fwd)] * n_out,
        scratch_shapes=[pltpu.VMEM((8, d), jnp.float32),
                        pltpu.VMEM((8, d), jnp.float32),
                        pltpu.VMEM((8, d), jnp.float32)],
    )
    out = pl.pallas_call(
        _softmax_fused_kernel if emit_w else _softmax_fused_kernel_nw,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((eb, d), jnp.float32)] * n_out,
        interpret=interpret,
    )(cont, beta.reshape(1), flags, msgs, suffmax, mask)
    if emit_w:
        return out
    return out[0], out[1], None


@functools.partial(jax.jit, static_argnames=("block_edges", "interpret"))
def _segmented_scan(vals, flags, cont, block_edges: int = DEFAULT_SCAN_BLOCK,
                    interpret: bool = False):
    """Segmented inclusive prefix sum of ``vals`` [EB, D] along axis 0."""
    eb, d = vals.shape
    assert eb % block_edges == 0
    d_pad = d  # Mosaic masks unaligned minor dims in-block; an explicit pad
    # would cost a full extra pass over the stream (measured, KERNELS.md)
    nb = eb // block_edges
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cont
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_edges, flags.shape[1]), lambda b, c: (b, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
        ],
        out_specs=pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
        scratch_shapes=[pltpu.VMEM((8, d_pad), jnp.float32)],
    )
    out = pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((eb, d_pad), jnp.float32),
        interpret=interpret,
    )(cont, flags, vals)
    return out[:, :d]


@functools.partial(jax.jit, static_argnames=("block_edges", "interpret"))
def _segmented_scan_max(vals, flags, cont, block_edges: int = DEFAULT_SCAN_BLOCK,
                        interpret: bool = False):
    """Segmented inclusive prefix MAX of ``vals`` [EB, D] along axis 0.
    Rows that must not win (padding) should carry -1e30."""
    eb, d = vals.shape
    assert eb % block_edges == 0
    d_pad = d  # unaligned minor dim handled by Mosaic masking (see above)
    nb = eb // block_edges
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_edges, flags.shape[1]), lambda b, c: (b, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
        ],
        out_specs=pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
        scratch_shapes=[pltpu.VMEM((8, d_pad), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_scan_kernel, op="max"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((eb, d_pad), jnp.float32),
        interpret=interpret,
    )(cont, flags, vals)
    return out[:, :d]


def segment_max_streamed(vals, flags, cont, last_edge, num_nodes: int,
                         block_edges: Optional[int] = None,
                         interpret: bool = False, valid=None):
    """Segment max of receiver-sorted ``vals`` [E, D] into [num_nodes, D]
    via the streaming max-scan (replaces XLA's scatter-max lowering of
    jax.ops.segment_max).  Masked rows must already carry _NEG; empty
    segments return 0.  ``valid`` [num_nodes] bool marks segments with at
    least one unmasked edge; when omitted, segments whose max sits at the
    _NEG identity are treated as all-masked (a value threshold — exact for
    any realistic activation magnitude, callers with a mask in hand pass
    ``valid`` to avoid the conflation at |x| >= 5e29).  Not differentiable
    (softmax uses it under stop_gradient only)."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = block_edges or flags.shape[0] // cont.shape[0]
    eb = flags.shape[0]
    e = vals.shape[0]
    if e != eb:
        vals = jnp.pad(vals, ((0, eb - e), (0, 0)), constant_values=_NEG)
    scan = _segmented_scan_max(vals, flags, cont, block_edges=block_edges,
                               interpret=interpret)
    out = jnp.take(scan, jnp.clip(last_edge, 0, eb - 1), axis=0)
    has_edges = (last_edge >= 0)[:, None]
    if valid is not None:
        has_edges = has_edges & valid[:, None]
        return jnp.where(has_edges, out, 0.0)
    return jnp.where(has_edges & (out > _NEG / 2), out, 0.0)


@functools.partial(jax.jit, static_argnames=("block_edges", "interpret"))
def _segmented_scan_pair(vals, vals2, flags, cont,
                         block_edges: int = DEFAULT_SCAN_BLOCK,
                         interpret: bool = False):
    """Joint segmented scans of two equally-flagged streams in one pass."""
    eb, d = vals.shape
    assert eb % block_edges == 0
    d_pad = d  # unaligned minor dim handled by Mosaic masking (see above)
    nb = eb // block_edges
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_edges, flags.shape[1]), lambda b, c: (b, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
            pl.BlockSpec((block_edges, d_pad), lambda b, c: (b, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((8, d_pad), jnp.float32),
                        pltpu.VMEM((8, d_pad), jnp.float32)],
    )
    out1, out2 = pl.pallas_call(
        _scan_kernel_pair,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((eb, d_pad), jnp.float32),
                   jax.ShapeDtypeStruct((eb, d_pad), jnp.float32)],
        interpret=interpret,
    )(cont, flags, vals, vals2)
    return out1[:, :d], out2[:, :d]


def _pad_rows(x, eb):
    e = x.shape[0]
    if e == eb:
        return x
    return jnp.pad(x, ((0, eb - e),) + ((0, 0),) * (x.ndim - 1))


# ------------------------------------------------------------- segment sum

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _seg_sum_streamed(num_nodes, block_edges, interpret,
                      msgs, flags, cont, last_edge, receivers):
    eb = flags.shape[0]
    scan = _segmented_scan(_pad_rows(msgs, eb), flags, cont,
                           block_edges=block_edges, interpret=interpret)
    out = jnp.take(scan, jnp.clip(last_edge, 0, eb - 1), axis=0)
    return jnp.where((last_edge >= 0)[:, None], out, 0.0)


def _seg_sum_streamed_fwd(num_nodes, block_edges, interpret,
                          msgs, flags, cont, last_edge, receivers):
    out = _seg_sum_streamed(num_nodes, block_edges, interpret, msgs, flags,
                            cont, last_edge, receivers)
    return out, (receivers, msgs.shape[0], jnp.zeros((0,), msgs.dtype))


def _seg_sum_streamed_bwd(num_nodes, block_edges, interpret, res, g):
    receivers, num_edges, dtype_probe = res
    # d(segment_sum)/d msgs = gather of g at each edge's receiver; the
    # cotangent must match the primal dtype (bf16 streams supported)
    grad = jnp.take(g, receivers[:num_edges], axis=0)
    return (grad.astype(dtype_probe.dtype), None, None, None, None)


_seg_sum_streamed.defvjp(_seg_sum_streamed_fwd, _seg_sum_streamed_bwd)


def segment_sum_streamed(msgs, receivers, flags, cont, last_edge,
                         num_nodes: int, edge_mask=None,
                         block_edges: Optional[int] = None,
                         interpret: bool = False):
    """Masked segment-sum of ``msgs`` [E, D] (sorted by receiver) into
    [num_nodes, D] via the streaming scan kernel.  Differentiable (VJP =
    gather).  Interpret mode is forced automatically off-TPU.  The block size
    is recovered from the plan itself (flags rows / cont blocks) so callers
    never have to thread the build-time ``scan_block`` through."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = block_edges or flags.shape[0] // cont.shape[0]
    if not jnp.issubdtype(msgs.dtype, jnp.floating):
        msgs = msgs.astype(jnp.float32)
    # bf16 message streams pass straight into the kernel (halved HBM input
    # traffic); the scan converts to f32 at VMEM load and emits f32
    if edge_mask is not None:
        msgs = jnp.where(edge_mask[:, None], msgs, 0)
    return _seg_sum_streamed(num_nodes, block_edges, interpret,
                             msgs, flags, cont, last_edge, receivers)


# -------------------------------------------------------- softmax aggregate

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _softmax_agg_streamed(num_nodes, block_edges, interpret,
                          msgs, beta, flags, cont, last_edge, receivers,
                          edge_mask_f):
    # primal (eval/inference — no VJP will consume residuals): skip the
    # [E, D] w-stream write (round 4, VERDICT r3 weak #6)
    out, _, _ = _softmax_fused_parts(num_nodes, block_edges, interpret, msgs,
                                     beta, flags, cont, last_edge, receivers,
                                     edge_mask_f, need_w=False)
    return out


def _softmax_fused_parts(num_nodes, block_edges, interpret, msgs, beta, flags,
                         cont, last_edge, receivers, edge_mask_f,
                         need_w: bool = True):
    """Round-3 softmax forward: 2 kernel passes, 2 end-gathers, zero node->
    edge broadcasts (VERDICT r2 #3).  Returns (out, w edge stream, den_end)."""
    eb = flags.shape[0]
    e = msgs.shape[0]
    beta = jnp.asarray(beta, jnp.float32)
    mask_col = _pad_rows(edge_mask_f[:, None], eb)
    msgs_p = _pad_rows(msgs, eb)
    # the packed plan carries the suffix gates (host-built, round 4)
    suff = _segmented_suffix_max(jax.lax.stop_gradient(msgs_p), mask_col,
                                 beta, flags, cont, block_edges=block_edges,
                                 interpret=interpret)
    numer, denom, w = _segmented_scan_softmax_fused(
        msgs_p, suff, mask_col, beta, flags, cont, block_edges=block_edges,
        interpret=interpret, emit_w=need_w)
    last = jnp.clip(last_edge, 0, eb - 1)
    num_end = jnp.take(numer, last, axis=0)
    den_end = jnp.maximum(jnp.take(denom, last, axis=0), 1e-16)
    out = jnp.where((last_edge >= 0)[:, None], num_end / den_end, 0.0)
    return out, (w[:e] if need_w else None), den_end


def _softmax_agg_streamed_fwd(num_nodes, block_edges, interpret,
                              msgs, beta, flags, cont, last_edge, receivers,
                              edge_mask_f):
    out, w, den_end = _softmax_fused_parts(
        num_nodes, block_edges, interpret, msgs, beta, flags, cont, last_edge,
        receivers, edge_mask_f)
    return out, (msgs, beta, w, den_end, out, receivers)


def _softmax_agg_streamed_bwd(num_nodes, block_edges, interpret, res, g):
    """out_n = sum_e wt_e * m_e with wt = softmax_n(beta*m) per lane, so

    dm_e  = wt_e * ( g_n + beta * ( m_e*g_n - s_n ) ),
    dbeta = sum_e wt_e * m_e * (m_e*g_n - s_n),  s_n = sum_j wt_j (m_j*g_n).

    Since g_n is constant within a segment, s_n = g_n * sum_j wt_j m_j
    = g_n * out_n — the inner segment reduction collapses to an elementwise
    product of residuals, so the whole backward is ONE packed node->edge
    gather plus fused elementwise math: no exp (the weights' numerator ``w``
    is saved by the forward kernel), no segment reduction, no scatter."""
    msgs, beta, w, den_end, out, receivers = res
    d = msgs.shape[1]
    packed = jnp.concatenate([den_end, g, out * g], axis=1)
    pe = jnp.take(packed, receivers, axis=0)
    den_e, g_e, s_e = pe[:, :d], pe[:, d:2 * d], pe[:, 2 * d:]
    wt = w / den_e
    m = msgs.astype(jnp.float32)
    mg = m * g_e
    dm = (wt * (g_e + beta * (mg - s_e))).astype(msgs.dtype)
    dbeta = jnp.sum(wt * m * (mg - s_e))
    return (dm, dbeta, None, None, None, None, None)


_softmax_agg_streamed.defvjp(_softmax_agg_streamed_fwd,
                             _softmax_agg_streamed_bwd)


def softmax_aggregate_streamed(msgs, receivers, flags, cont, last_edge,
                               num_nodes: int, beta, edge_mask=None,
                               block_edges: Optional[int] = None,
                               interpret: bool = False):
    """Softmax aggregation (scatter_softmax weights then weighted segment-sum,
    reference messagepassing.py:211-214) with the fused numerator/denominator
    streaming scan.  Differentiable in msgs and beta.  Block size recovered
    from the plan (see segment_sum_streamed)."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = block_edges or flags.shape[0] // cont.shape[0]
    e = msgs.shape[0]
    msgs, mask_f = _prep(msgs, edge_mask)
    return _softmax_agg_streamed(num_nodes, block_edges, interpret, msgs,
                                 jnp.asarray(beta, jnp.float32), flags, cont,
                                 last_edge, receivers, mask_f)


# --------------------------------------------- message gather, streamed bwd

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_streamed_bwd_op(block_edges, interpret, x, senders, snd_perm,
                            snd_flags, snd_cont, snd_last):
    return jnp.take(x, senders, axis=0)


def _gather_sb_fwd(block_edges, interpret, x, senders, snd_perm, snd_flags,
                   snd_cont, snd_last):
    y = jnp.take(x, senders, axis=0)
    return y, (senders, snd_perm, snd_flags, snd_cont, snd_last, x.shape[0],
               jnp.zeros((0,), x.dtype))


def _gather_sb_bwd(block_edges, interpret, res, g):
    """dx[senders] += g as a streamed segment-sum over sender-sorted edges:
    permute g into sender order (a gather over the [E]-row cotangent — edges
    of one sender are scattered but the table is edge-sized, not node-sized),
    scan, end-gather into the [N_src]-row result.  Replaces XLA's scatter-add
    lowering, whose locality collapse is the >=16k cliff (STATUS r2 §8)."""
    senders, perm, flags, cont, last, n_src, dtype_probe = res
    g_sorted = jnp.take(g.astype(jnp.float32), perm, axis=0)
    eb = flags.shape[0]
    scan = _segmented_scan(_pad_rows(g_sorted, eb), flags, cont,
                           block_edges=block_edges, interpret=interpret)
    dx = jnp.take(scan, jnp.clip(last, 0, eb - 1), axis=0)
    dx = jnp.where((last >= 0)[:, None], dx, 0.0)
    return (dx.astype(dtype_probe.dtype), None, None, None, None, None)


_gather_streamed_bwd_op.defvjp(_gather_sb_fwd, _gather_sb_bwd)


def gather_nodes_streamed(x, senders, snd_perm, snd_flags, snd_cont, snd_last,
                          interpret: bool = False):
    """``x[senders]`` whose backward rides the streaming scan instead of an
    XLA scatter-add (plan from build_sender_plan).  Forward is the plain
    take."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = snd_flags.shape[0] // snd_cont.shape[0]
    return _gather_streamed_bwd_op(block_edges, interpret, x, senders,
                                   snd_perm, snd_flags, snd_cont, snd_last)


def split_take(x, x_remote, senders):
    """take(concat([x, x_remote]), senders) with the LOCAL rows gathered
    directly from ``x``: the local gather has no data dependency on the halo
    all_to_all that produces ``x_remote``, so the latency-hiding scheduler
    can run it (the largest single op-class floor, bench.py) while the
    exchange is in flight — the structural half of the overlap design
    (VERDICT r4 next #1; parallel/halo.py HALO_TPU_COMPILER_OPTIONS is the
    async-collective half)."""
    ns = x.shape[0]
    local = senders < ns
    g_local = jnp.take(x, jnp.where(local, senders, 0), axis=0)
    g_remote = jnp.take(x_remote, jnp.where(local, 0, senders - ns), axis=0)
    return jnp.where(local[:, None], g_local, g_remote)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _halo_gather_split_op(block_edges, interpret, x, x_remote, senders,
                          snd_perm, snd_flags, snd_cont, snd_last):
    return split_take(x, x_remote, senders)


def _halo_gs_fwd(block_edges, interpret, x, x_remote, senders, snd_perm,
                 snd_flags, snd_cont, snd_last):
    y = split_take(x, x_remote, senders)
    return y, (senders, snd_perm, snd_flags, snd_cont, snd_last, x.shape[0],
               jnp.zeros((0,), x.dtype))


def _halo_gs_bwd(block_edges, interpret, res, g):
    """Identical streamed segment-sum backward as _gather_sb_bwd over the
    combined augmented [NS + S*H] index space (the sender plan covers it),
    then split into the local and halo cotangents — the halo part feeds the
    reverse all_to_all."""
    senders, perm, flags, cont, last, ns, dtype_probe = res
    g_sorted = jnp.take(g.astype(jnp.float32), perm, axis=0)
    eb = flags.shape[0]
    scan = _segmented_scan(_pad_rows(g_sorted, eb), flags, cont,
                           block_edges=block_edges, interpret=interpret)
    dsrc = jnp.take(scan, jnp.clip(last, 0, eb - 1), axis=0)
    dsrc = jnp.where((last >= 0)[:, None], dsrc, 0.0)
    dsrc = dsrc.astype(dtype_probe.dtype)
    return (dsrc[:ns], dsrc[ns:], None, None, None, None, None)


_halo_gather_split_op.defvjp(_halo_gs_fwd, _halo_gs_bwd)


def halo_gather_split_streamed(x, x_remote, senders, snd_perm, snd_flags,
                               snd_cont, snd_last, interpret: bool = False):
    """Halo-aware ``concat([x, x_remote])[senders]``: split forward (local
    rows from x, remote rows from x_remote — see split_take) with the
    streamed segment-sum backward over the combined augmented space."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = snd_flags.shape[0] // snd_cont.shape[0]
    return _halo_gather_split_op(block_edges, interpret, x, x_remote,
                                 senders, snd_perm, snd_flags, snd_cont,
                                 snd_last)


# ------------------------------------------------ fixed-aggregator family
# Streamed counterparts of graph/segment.py's mean/min/max/var/std (the PNA
# aggregator set, reference phc/hypercomplex/aggregator.py:70-103), each with
# an analytic VJP of node->edge gathers only over the [E, D] feature streams.
# The ONE remaining scatter is the [E] -> [N] single-lane edge count
# (_counts) in mean/var/std — 1/D-th of the feature traffic.

def _prep(msgs, edge_mask):
    e = msgs.shape[0]
    mask_f = (jnp.ones((e,), jnp.float32) if edge_mask is None
              else edge_mask.astype(jnp.float32))
    # float streams (incl. bf16) pass through — the kernels convert to f32 at
    # VMEM load; only non-float inputs are cast here
    if not jnp.issubdtype(msgs.dtype, jnp.floating):
        msgs = msgs.astype(jnp.float32)
    return msgs, mask_f


def _counts(receivers, mask_f, num_nodes):
    # [E] -> [N] single-lane segment sum; 1/200th of the feature traffic
    return jax.ops.segment_sum(mask_f, receivers, num_segments=num_nodes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _seg_mean_streamed(num_nodes, block_edges, interpret,
                       msgs, flags, cont, last_edge, receivers, mask_f):
    out, _ = _seg_mean_parts(num_nodes, block_edges, interpret, msgs, flags,
                             cont, last_edge, receivers, mask_f)
    return out


def _seg_mean_parts(num_nodes, block_edges, interpret, msgs, flags, cont,
                    last_edge, receivers, mask_f):
    s = _seg_sum_streamed(num_nodes, block_edges, interpret,
                          msgs * mask_f[:, None], flags, cont, last_edge,
                          receivers)
    cnt = jnp.maximum(_counts(receivers, mask_f, num_nodes), 1.0)
    return s / cnt[:, None], cnt


def _seg_mean_fwd(num_nodes, block_edges, interpret, msgs, flags, cont,
                  last_edge, receivers, mask_f):
    out, cnt = _seg_mean_parts(num_nodes, block_edges, interpret, msgs, flags,
                               cont, last_edge, receivers, mask_f)
    return out, (cnt, receivers, mask_f, msgs.shape[0],
                 jnp.zeros((0,), msgs.dtype))


def _seg_mean_bwd(num_nodes, block_edges, interpret, res, g):
    cnt, receivers, mask_f, e, dtype_probe = res
    dm = jnp.take(g / cnt[:, None], receivers[:e], axis=0) * mask_f[:, None]
    return (dm.astype(dtype_probe.dtype), None, None, None, None, None)


_seg_mean_streamed.defvjp(_seg_mean_fwd, _seg_mean_bwd)


def segment_mean_streamed(msgs, receivers, flags, cont, last_edge,
                          num_nodes: int, edge_mask=None,
                          block_edges: Optional[int] = None,
                          interpret: bool = False):
    """Masked segment mean (empty segments -> 0) via the streaming scan."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = block_edges or flags.shape[0] // cont.shape[0]
    msgs, mask_f = _prep(msgs, edge_mask)
    return _seg_mean_streamed(num_nodes, block_edges, interpret, msgs, flags,
                              cont, last_edge, receivers, mask_f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _seg_extreme_streamed(sign, num_nodes, block_edges, interpret,
                          msgs, flags, cont, last_edge, receivers, mask_f):
    # max for sign=+1, min for sign=-1 (min(x) = -max(-x)); empty segments -> 0
    vals = jnp.where(mask_f[:, None] > 0, sign * msgs.astype(jnp.float32),
                     _NEG)
    valid = _counts(receivers, mask_f, num_nodes) > 0
    out = segment_max_streamed(vals, flags, cont, last_edge, num_nodes,
                               block_edges=block_edges, interpret=interpret,
                               valid=valid)
    return sign * out


def _seg_extreme_fwd(sign, num_nodes, block_edges, interpret,
                     msgs, flags, cont, last_edge, receivers, mask_f):
    out = _seg_extreme_streamed(sign, num_nodes, block_edges, interpret, msgs,
                                flags, cont, last_edge, receivers, mask_f)
    return out, (out, msgs, receivers, mask_f)


def _seg_extreme_bwd(sign, num_nodes, block_edges, interpret, res, g):
    # route the cotangent to every edge attaining the extreme (ties share it,
    # matching jax.ops.segment_max's subgradient)
    out, msgs, receivers, mask_f = res
    out_e = jnp.take(out, receivers, axis=0)
    g_e = jnp.take(g, receivers, axis=0)
    dm = jnp.where((msgs.astype(jnp.float32) == out_e)
                   & (mask_f[:, None] > 0), g_e, 0.0)
    return (dm.astype(msgs.dtype), None, None, None, None, None)


_seg_extreme_streamed.defvjp(_seg_extreme_fwd, _seg_extreme_bwd)


def segment_max_agg_streamed(msgs, receivers, flags, cont, last_edge,
                             num_nodes: int, edge_mask=None,
                             block_edges: Optional[int] = None,
                             interpret: bool = False):
    """Differentiable masked segment max (empty -> 0) via the max scan."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = block_edges or flags.shape[0] // cont.shape[0]
    msgs, mask_f = _prep(msgs, edge_mask)
    return _seg_extreme_streamed(1.0, num_nodes, block_edges, interpret, msgs,
                                 flags, cont, last_edge, receivers, mask_f)


def segment_min_agg_streamed(msgs, receivers, flags, cont, last_edge,
                             num_nodes: int, edge_mask=None,
                             block_edges: Optional[int] = None,
                             interpret: bool = False):
    """Differentiable masked segment min (empty -> 0) via the max scan."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = block_edges or flags.shape[0] // cont.shape[0]
    msgs, mask_f = _prep(msgs, edge_mask)
    return _seg_extreme_streamed(-1.0, num_nodes, block_edges, interpret,
                                 msgs, flags, cont, last_edge, receivers,
                                 mask_f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _seg_var_streamed(num_nodes, block_edges, interpret,
                      msgs, flags, cont, last_edge, receivers, mask_f):
    out, _, _ = _seg_var_parts(num_nodes, block_edges, interpret, msgs, flags,
                               cont, last_edge, receivers, mask_f)
    return out


def _seg_var_parts(num_nodes, block_edges, interpret, msgs, flags, cont,
                   last_edge, receivers, mask_f):
    # square in f32: a bf16 square before the scan would lose the precision
    # the f32 accumulation is there to keep
    m = msgs.astype(jnp.float32) * mask_f[:, None]
    eb = flags.shape[0]
    s, s2 = _segmented_scan_pair(_pad_rows(m, eb), _pad_rows(m * m, eb),
                                 flags, cont, block_edges=block_edges,
                                 interpret=interpret)
    last = jnp.clip(last_edge, 0, eb - 1)
    has = (last_edge >= 0)[:, None]
    cnt = jnp.maximum(_counts(receivers, mask_f, num_nodes), 1.0)[:, None]
    mean = jnp.where(has, jnp.take(s, last, axis=0), 0.0) / cnt
    mean_sq = jnp.where(has, jnp.take(s2, last, axis=0), 0.0) / cnt
    return mean_sq - mean * mean, mean, cnt


def _seg_var_fwd(num_nodes, block_edges, interpret, msgs, flags, cont,
                 last_edge, receivers, mask_f):
    out, mean, cnt = _seg_var_parts(num_nodes, block_edges, interpret, msgs,
                                    flags, cont, last_edge, receivers, mask_f)
    return out, (mean, cnt, receivers, mask_f, msgs)


def _seg_var_bwd(num_nodes, block_edges, interpret, res, g):
    # d var_n / d m_e = 2 (m_e - mean_n) / c_n for edges of segment n
    mean, cnt, receivers, mask_f, msgs = res
    packed = jnp.concatenate([g / cnt, mean], axis=1)
    pe = jnp.take(packed, receivers, axis=0)
    d = g.shape[1]
    dm = (2.0 * (msgs.astype(jnp.float32) - pe[:, d:]) * pe[:, :d]
          * mask_f[:, None])
    return (dm.astype(msgs.dtype), None, None, None, None, None)


_seg_var_streamed.defvjp(_seg_var_fwd, _seg_var_bwd)


def segment_var_streamed(msgs, receivers, flags, cont, last_edge,
                         num_nodes: int, edge_mask=None,
                         block_edges: Optional[int] = None,
                         interpret: bool = False):
    """Masked segment variance E[x^2]-E[x]^2 (reference aggregator.py:86-89)
    via one joint pair scan of [m, m^2]."""
    interpret = interpret or jax.default_backend() != "tpu"
    block_edges = block_edges or flags.shape[0] // cont.shape[0]
    msgs, mask_f = _prep(msgs, edge_mask)
    return _seg_var_streamed(num_nodes, block_edges, interpret, msgs, flags,
                             cont, last_edge, receivers, mask_f)


def segment_std_streamed(msgs, receivers, flags, cont, last_edge,
                         num_nodes: int, edge_mask=None,
                         block_edges: Optional[int] = None,
                         interpret: bool = False, eps: float = 1e-5):
    """sqrt(relu(var) + eps) (reference aggregator.py:92-93); the sqrt/relu
    ride normal autodiff on top of the var custom VJP."""
    var = segment_var_streamed(msgs, receivers, flags, cont, last_edge,
                               num_nodes, edge_mask, block_edges, interpret)
    return jnp.sqrt(jax.nn.relu(var) + eps)


# registry mirroring graph/aggregators.py::AGGREGATORS for plan-carrying
# single-shard batches (signature: msgs, receivers, flags, cont, last_edge,
# num_nodes, edge_mask)
STREAMED_AGGREGATORS = {
    "sum": segment_sum_streamed,
    "mean": segment_mean_streamed,
    "min": segment_min_agg_streamed,
    "max": segment_max_agg_streamed,
    "var": segment_var_streamed,
    "std": segment_std_streamed,
}
