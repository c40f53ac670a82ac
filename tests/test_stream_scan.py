"""Streaming segmented-scan kernel (ops/stream_scan.py) vs the XLA composites.

Runs in Pallas interpret mode on CPU; exactness bar mirrors
tests/test_pallas_ops.py for the round-1 kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phc_gnn_tpu.graph.aggregators import softmax_aggregate
from phc_gnn_tpu.graph.segment import segment_sum
from phc_gnn_tpu.ops.stream_scan import (
    build_scan_plan,
    segment_sum_streamed,
    softmax_aggregate_streamed,
)


def _case(seed, E, N, D, frac_masked=0.2, block=128):
    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    mask = rng.random(E) > frac_masked
    # padding edges attach to the last receiver value, mask False (as the
    # batcher emits); keep sortedness
    flags, cont, last = build_scan_plan(recv, N, block_edges=block)
    return (jnp.asarray(msgs), jnp.asarray(recv), jnp.asarray(flags),
            jnp.asarray(cont), jnp.asarray(last), jnp.asarray(mask))


@pytest.mark.parametrize("E,N,D,block", [
    (300, 64, 48, 128),     # unaligned E, multi-block
    (1024, 256, 128, 256),  # aligned
    (90, 640, 20, 128),     # many empty segments, single block
])
def test_segment_sum_streamed_matches_xla(E, N, D, block):
    msgs, recv, flags, cont, last, mask = _case(0, E, N, D, block=block)
    want = segment_sum(msgs, recv, N, mask)
    got = segment_sum_streamed(msgs, recv, flags, cont, last, N,
                               edge_mask=mask, block_edges=block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_segment_sum_streamed_single_segment_spanning_blocks():
    """One giant segment crossing many carry boundaries."""
    E, N, D, block = 700, 4, 16, 128
    rng = np.random.default_rng(1)
    recv = np.full(E, 2, np.int32)
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    flags, cont, last = build_scan_plan(recv, N, block_edges=block)
    got = segment_sum_streamed(jnp.asarray(msgs), jnp.asarray(recv),
                               jnp.asarray(flags), jnp.asarray(cont),
                               jnp.asarray(last), N, block_edges=block)
    want = np.zeros((N, D), np.float32)
    want[2] = msgs.sum(0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_segment_sum_streamed_grad_is_gather():
    E, N, D, block = 260, 32, 24, 128
    msgs, recv, flags, cont, last, mask = _case(2, E, N, D, block=block)

    def f(m):
        return jnp.sum(segment_sum_streamed(
            m, recv, flags, cont, last, N, edge_mask=mask,
            block_edges=block) ** 2)

    def f_ref(m):
        return jnp.sum(segment_sum(m, recv, N, mask) ** 2)

    g = jax.grad(f)(msgs)
    g_ref = jax.grad(f_ref)(msgs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("E,N,D,block", [
    (300, 64, 48, 128),
    (1024, 256, 128, 256),
])
def test_softmax_aggregate_streamed_matches_composite(E, N, D, block):
    msgs, recv, flags, cont, last, mask = _case(3, E, N, D, block=block)
    beta = 1.3
    want = softmax_aggregate(msgs, recv, N, beta, mask)
    got = softmax_aggregate_streamed(msgs, recv, flags, cont, last, N, beta,
                                     edge_mask=mask, block_edges=block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_softmax_aggregate_streamed_grads_match_composite():
    E, N, D, block = 300, 64, 32, 128
    msgs, recv, flags, cont, last, mask = _case(4, E, N, D, block=block)
    beta0 = jnp.float32(0.8)

    def f(m, b):
        out = softmax_aggregate_streamed(m, recv, flags, cont, last, N, b,
                                         edge_mask=mask, block_edges=block)
        return jnp.sum(jnp.sin(out))

    def f_ref(m, b):
        out = softmax_aggregate(m, recv, N, b, mask)
        return jnp.sum(jnp.sin(out))

    gm, gb = jax.grad(f, argnums=(0, 1))(msgs, beta0)
    gm_ref, gb_ref = jax.grad(f_ref, argnums=(0, 1))(msgs, beta0)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(float(gb), float(gb_ref), rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("E,N,D,block", [
    (300, 64, 48, 128),
    (1024, 256, 128, 256),
    (90, 640, 20, 128),
])
def test_segment_max_streamed_matches_oracle(E, N, D, block):
    from phc_gnn_tpu.ops.stream_scan import segment_max_streamed

    msgs, recv, flags, cont, last, mask = _case(5, E, N, D, block=block)
    from phc_gnn_tpu.ops.stream_scan import _NEG
    masked = jnp.where(mask[:, None], msgs, _NEG)
    got = segment_max_streamed(masked, flags, cont, last, N,
                               block_edges=block)
    want = np.zeros((N, D), np.float32)
    m_np, r_np, k_np = map(np.asarray, (msgs, recv, mask))
    for n in range(N):
        sel = (r_np == n) & k_np
        if sel.any():
            want[n] = m_np[sel].max(axis=0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_segment_max_streamed_single_segment_spanning_blocks():
    from phc_gnn_tpu.ops.stream_scan import segment_max_streamed

    E, N, D, block = 700, 4, 16, 128
    rng = np.random.default_rng(6)
    recv = np.zeros(E, np.int32)  # everything in segment 0
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    flags, cont, last = build_scan_plan(recv, N, block_edges=block)
    got = segment_max_streamed(jnp.asarray(msgs), jnp.asarray(flags),
                               jnp.asarray(cont), jnp.asarray(last), N,
                               block_edges=block)
    np.testing.assert_allclose(np.asarray(got)[0], msgs.max(axis=0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got)[1:], 0.0)


def test_softmax_streamed_masked_large_logit_no_nan():
    """A MASKED edge whose logit exceeds the segment's unmasked max by >88
    nats must not poison the output: masking must happen on the logits
    before exp (post-exp masking gives exp->inf, inf*0 = NaN)."""
    E, N, D, block = 128, 4, 8, 128
    recv = np.zeros(E, np.int32)
    msgs = np.full((E, D), 0.5, np.float32)
    msgs[3] = 200.0  # masked edge, would overflow exp if unmasked
    mask = np.ones(E, bool)
    mask[3] = False
    flags, cont, last = build_scan_plan(recv, N, block_edges=block)
    m_j, k_j = jnp.asarray(msgs), jnp.asarray(mask)
    args = (jnp.asarray(flags), jnp.asarray(cont), jnp.asarray(last))

    out = softmax_aggregate_streamed(m_j, jnp.asarray(recv), *args, N, 1.0,
                                     edge_mask=k_j, block_edges=block)
    want = softmax_aggregate(m_j, jnp.asarray(recv), N, 1.0, k_j)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-6)

    # backward too
    g = jax.grad(lambda m: jnp.sum(softmax_aggregate_streamed(
        m, jnp.asarray(recv), *args, N, 1.0, edge_mask=k_j,
        block_edges=block)))(m_j)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("name", ["mean", "min", "max", "var", "std"])
def test_streamed_fixed_aggregators_match_xla(name):
    """The streamed mean/min/max/var/std (PNA family) must match the XLA
    AGGREGATORS — values AND gradients (min/max route the cotangent to the
    extreme elements like jax.ops.segment_max's subgradient)."""
    from phc_gnn_tpu.graph.aggregators import AGGREGATORS
    from phc_gnn_tpu.ops.stream_scan import STREAMED_AGGREGATORS

    E, N, D, block = 300, 64, 24, 128
    msgs, recv, flags, cont, last, mask = _case(7, E, N, D, block=block)

    def f_stream(m):
        out = STREAMED_AGGREGATORS[name](m, recv, flags, cont, last, N, mask)
        return jnp.sum(jnp.sin(out)), out

    def f_xla(m):
        out = AGGREGATORS[name](m, recv, N, mask)
        return jnp.sum(jnp.sin(out)), out

    (_, out_s), g_s = jax.value_and_grad(f_stream, has_aux=True)(msgs)
    (_, out_x), g_x = jax.value_and_grad(f_xla, has_aux=True)(msgs)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    # std grads sit on the relu(var) kink for var==0 segments (single-edge
    # segments compute var = E[x^2]-E[x]^2 ~ +-1e-6 and the two formulations
    # can land on opposite sides, flipping the subgradient, then /sqrt(eps)
    # amplifies it) — both are valid subgradients; allow a looser atol there
    g_atol = 5e-3 if name == "std" else 2e-5
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_x),
                               rtol=2e-4, atol=g_atol)


def test_pna_conv_scan_plan_matches_xla_path():
    """PHMPNAConvSimple with a scan plan equals the XLA aggregation path."""
    from phc_gnn_tpu.graph.conv import PHMPNAConvSimple

    E, N, D, n = 256, 64, 16, 4
    rng = np.random.default_rng(9)
    recv = np.sort(rng.integers(0, N, E)).astype(np.int32)
    send = rng.integers(0, N, E).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    e_attr = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    mask = jnp.asarray(rng.random(E) > 0.15)
    flags, cont, last = build_scan_plan(recv, N, 128)
    plan = (jnp.asarray(flags), jnp.asarray(cont), jnp.asarray(last))
    avg_deg = {"log": 1.3, "lin": 3.5}

    conv = PHMPNAConvSimple(in_features=D, out_features=D, phm_dim=n,
                            avg_deg=avg_deg)
    v = conv.init(jax.random.key(0), x, jnp.asarray(send), jnp.asarray(recv),
                  e_attr, mask)
    out_x = conv.apply(v, x, jnp.asarray(send), jnp.asarray(recv), e_attr,
                       mask)
    out_s = conv.apply(v, x, jnp.asarray(send), jnp.asarray(recv), e_attr,
                       mask, scan_plan=plan)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


def test_streamed_kernels_accept_bf16_streams():
    """bf16 message streams pass into the kernels directly (no XLA f32
    materialization pass); the scan converts at VMEM load and accumulates in
    f32, and the VJPs return bf16 cotangents matching the primal dtype."""
    E, N, D, block = 300, 64, 32, 128
    msgs, recv, flags, cont, last, mask = _case(8, E, N, D, block=block)
    m16 = msgs.astype(jnp.bfloat16)

    out32 = segment_sum_streamed(msgs, recv, flags, cont, last, N,
                                 edge_mask=mask, block_edges=block)
    out16 = segment_sum_streamed(m16, recv, flags, cont, last, N,
                                 edge_mask=mask, block_edges=block)
    assert out16.dtype == jnp.float32  # accumulation stays f32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=2e-2, atol=2e-2)

    g = jax.grad(lambda m: jnp.sum(segment_sum_streamed(
        m, recv, flags, cont, last, N, edge_mask=mask,
        block_edges=block)))(m16)
    assert g.dtype == jnp.bfloat16

    s32 = softmax_aggregate_streamed(msgs, recv, flags, cont, last, N, 1.1,
                                     edge_mask=mask, block_edges=block)
    s16 = softmax_aggregate_streamed(m16, recv, flags, cont, last, N, 1.1,
                                     edge_mask=mask, block_edges=block)
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32),
                               rtol=3e-2, atol=3e-2)
    gs = jax.grad(lambda m: jnp.sum(softmax_aggregate_streamed(
        m, recv, flags, cont, last, N, 1.1, edge_mask=mask,
        block_edges=block)))(m16)
    assert gs.dtype == jnp.bfloat16

    from phc_gnn_tpu.ops.stream_scan import STREAMED_AGGREGATORS
    for name in ("mean", "min", "max", "var", "std"):
        o = STREAMED_AGGREGATORS[name](m16, recv, flags, cont, last, N, mask)
        assert np.isfinite(np.asarray(o, np.float32)).all()
        ga = jax.grad(lambda m: jnp.sum(STREAMED_AGGREGATORS[name](
            m, recv, flags, cont, last, N, mask)))(m16)
        assert ga.dtype == jnp.bfloat16, name


def test_segment_extremes_survive_extreme_magnitudes():
    """ADVICE r2: the all-masked-segment indicator must be a scanned mask
    count, not a value threshold — a legitimate max <= -5e29 (or min >= 5e29)
    must come through, and all-masked segments must still return 0."""
    from phc_gnn_tpu.ops.stream_scan import (segment_max_agg_streamed,
                                             segment_min_agg_streamed)
    N, D, block = 4, 8, 128
    recv = np.array([0, 0, 1, 1, 3], np.int32)
    msgs = np.full((5, D), -8e29, np.float32)
    msgs[2:4] = 8e29
    mask = np.array([True, True, True, True, False])  # node 3: all masked
    flags, cont, last = build_scan_plan(recv, N, block_edges=block)
    args = (jnp.asarray(msgs), jnp.asarray(recv), jnp.asarray(flags),
            jnp.asarray(cont), jnp.asarray(last), N, jnp.asarray(mask))
    got_max = np.asarray(segment_max_agg_streamed(*args, block_edges=block))
    got_min = np.asarray(segment_min_agg_streamed(*args, block_edges=block))
    np.testing.assert_allclose(got_max[0], np.full(D, -8e29, np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(got_min[1], np.full(D, 8e29, np.float32),
                               rtol=1e-6)
    np.testing.assert_array_equal(got_max[2], np.zeros(D))  # no edges
    np.testing.assert_array_equal(got_max[3], np.zeros(D))  # all masked
    np.testing.assert_array_equal(got_min[3], np.zeros(D))


def test_gather_nodes_streamed_matches_take_and_grad():
    """The sender-plan gather (VERDICT r2 #4) must equal x[senders] in value
    and gradient: its backward is a streamed segment-sum over sender-sorted
    edges instead of XLA's scatter-add."""
    from phc_gnn_tpu.ops.stream_scan import (build_sender_plan,
                                             gather_nodes_streamed)
    rng = np.random.default_rng(3)
    N, E, D = 64, 192, 24
    senders = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    g_cot = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    perm, fl, co, la = build_sender_plan(np.asarray(senders), N,
                                         block_edges=64)
    plan = tuple(map(jnp.asarray, (perm, fl, co, la)))

    y = gather_nodes_streamed(x, senders, *plan)
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(jnp.take(x, senders, axis=0)))

    f = lambda x_: jnp.sum(gather_nodes_streamed(x_, senders, *plan) * g_cot)
    f_ref = lambda x_: jnp.sum(jnp.take(x_, senders, axis=0) * g_cot)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(f_ref)(x)),
                               rtol=1e-5, atol=1e-5)


def test_attach_scan_plan_emits_sender_plan():
    from phc_gnn_tpu.data import synthetic_batch
    from phc_gnn_tpu.ops.stream_scan import attach_scan_plan
    b = attach_scan_plan(synthetic_batch(batch_size=4, num_nodes=128,
                                         num_edges=256, seed=0))
    assert b.snd_perm is not None and b.snd_last.shape[0] == b.num_nodes
    snd_sorted = np.asarray(b.senders)[np.asarray(b.snd_perm)]
    assert np.all(snd_sorted[1:] >= snd_sorted[:-1])


@pytest.mark.parametrize("op", ["sum", "softmax", "max"])
def test_segment_boundary_phases_adversarial(op):
    """Exhaustive segment-boundary phases for the single-phase packed-gates
    scan (the round-4 two-phase design was measured as a non-win and
    rejected — KERNELS.md round 4 — but this boundary sweep keeps pinning
    the shipped kernel).

    Builds a receiver stream whose segment lengths sweep 1..17 so starts land
    on every position mod 8, segments span exactly one / several groups, and
    group and block boundaries coincide with and straddle segment boundaries.
    Compared against the XLA composite at block 64 (8 groups/block) so
    cross-block carries also interleave with group carries."""
    from phc_gnn_tpu.graph.segment import segment_max as seg_max_xla
    from phc_gnn_tpu.ops.stream_scan import segment_max_agg_streamed

    lens = [(i % 17) + 1 for i in range(60)]
    recv, n = [], 0
    for ln in lens:
        recv += [n] * ln
        n += 1
    recv = np.asarray(recv, np.int32)
    E, N, D, block = len(recv), n, 20, 64
    rng = np.random.default_rng(7)
    msgs = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    mask = jnp.asarray(rng.random(E) > 0.25)
    flags, cont, last = build_scan_plan(recv, N, block_edges=block)
    plan = (jnp.asarray(recv), jnp.asarray(flags), jnp.asarray(cont),
            jnp.asarray(last))
    if op == "sum":
        got = segment_sum_streamed(msgs, *plan, N, edge_mask=mask,
                                   block_edges=block)
        want = segment_sum(msgs, plan[0], N, mask)
    elif op == "softmax":
        got = softmax_aggregate_streamed(msgs, *plan, N, beta=1.3,
                                         edge_mask=mask, block_edges=block)
        want = softmax_aggregate(msgs, plan[0], N, beta=1.3, edge_mask=mask)
    else:
        got = segment_max_agg_streamed(msgs, *plan, N, edge_mask=mask,
                                       block_edges=block)
        want = seg_max_xla(msgs, plan[0], N, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_gates_match_in_kernel_derivation():
    """The host-packed gate lanes (round 4, _pack_scan_gates) must equal the
    flag evolution the kernels used to compute per invocation (round 2/3
    in-kernel form, re-derived here as an independent numpy reference)."""
    from phc_gnn_tpu.ops.stream_scan import _pack_scan_gates

    rng = np.random.default_rng(3)
    be, nb = 64, 3
    eb = be * nb
    flags = (rng.random(eb) < 0.25).astype(np.float32)
    flags[0] = 1.0
    packed = _pack_scan_gates(flags, be)
    # round 5: the emitted pass depth is ADAPTIVE (lane count = 2*NP+2 with
    # NP in {4, log2(be)} chosen from the longest in-block run — see
    # _pack_scan_gates); the kernels derive NP from the lane count, and the
    # evolution below must match for exactly the emitted passes.  Depth
    # sufficiency: 2^NP must cover the longest in-block run.
    np_passes = (packed.shape[1] - 2) // 2
    assert np_passes in (4, 6)
    runs = []
    for b in range(nb):
        f = flags[b * be:(b + 1) * be].copy()
        f[0] = 1.0
        starts = np.nonzero(f)[0]
        runs.append(int(np.diff(np.append(starts, be)).max()))
    assert (1 << np_passes) >= max(runs)

    for b in range(nb):
        f = flags[b * be:(b + 1) * be]
        r = np.arange(be)
        # forward gates: the exact round-3 in-kernel evolution
        ff = f.copy(); ff[0] = 1.0
        s = 1
        for p in range(np_passes):
            valid = (r >= s).astype(np.float32)
            fs = np.roll(ff, s); fs = np.maximum(fs * valid, 1.0 - valid)
            np.testing.assert_array_equal(
                packed[b * be:(b + 1) * be, p], (1.0 - ff) * valid)
            ff = np.maximum(ff, fs); s *= 2
        # s0: prefix-OR of flags with row 0 zeroed, == 0
        fl = f.copy(); fl[0] = 0.0
        s = 1
        for _ in range(np_passes):
            fl = np.maximum(fl, np.roll(fl, s) * (r >= s)); s *= 2
        np.testing.assert_array_equal(packed[b * be:(b + 1) * be, np_passes],
                                      (fl == 0.0).astype(np.float32))
        # suffix gates over global end flags
        ef_g = np.concatenate([flags[1:], [1.0]]).astype(np.float32)
        ef = ef_g[b * be:(b + 1) * be]
        gg = ef.copy(); gg[be - 1] = 1.0
        s = 1
        for p in range(np_passes):
            valid = (r < be - s).astype(np.float32)
            gs = np.roll(gg, -s); gs = np.maximum(gs * valid, 1.0 - valid)
            np.testing.assert_array_equal(
                packed[b * be:(b + 1) * be, np_passes + 1 + p],
                (1.0 - gg) * valid)
            gg = np.maximum(gg, gs); s *= 2
        gl = ef.copy(); gl[be - 1] = 0.0
        s = 1
        for _ in range(np_passes):
            gl = np.maximum(gl, np.roll(gl, -s) * (r < be - s)); s *= 2
        np.testing.assert_array_equal(
            packed[b * be:(b + 1) * be, 2 * np_passes + 1],
            (gl == 0.0).astype(np.float32))


def test_halo_gather_split_matches_concat_gather():
    """split_take / halo_gather_split_streamed == take(concat([x, xr]), s)
    in forward AND in both cotangents (the structural half of the halo
    overlap design — VERDICT r4 next #1)."""
    import jax
    import jax.numpy as jnp
    from phc_gnn_tpu.ops.stream_scan import (build_sender_plan,
                                             halo_gather_split_streamed,
                                             split_take)

    rng = np.random.default_rng(11)
    ns, hr, e, d = 96, 32, 256, 24
    x = jnp.asarray(rng.normal(size=(ns, d)).astype(np.float32))
    xr = jnp.asarray(rng.normal(size=(hr, d)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, ns + hr, e).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))

    def oracle(x, xr):
        return jnp.take(jnp.concatenate([x, xr], 0), senders, axis=0)

    y_ref, vjp_ref = jax.vjp(oracle, x, xr)
    y1 = split_take(x, xr, senders)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y_ref))
    dx_ref, dxr_ref = vjp_ref(g)

    plan = build_sender_plan(np.asarray(senders), ns + hr, 64)
    plan = tuple(jnp.asarray(p) for p in plan)

    def ours(x, xr):
        return halo_gather_split_streamed(x, xr, senders, *plan)

    y2, vjp2 = jax.vjp(ours, x, xr)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y_ref))
    dx2, dxr2 = vjp2(g)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx_ref),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dxr2), np.asarray(dxr_ref),
                               rtol=1e-6, atol=1e-5)


def test_adaptive_pass_depth_quantization_and_correctness():
    """Round 5: _pack_scan_gates emits only the gate lanes the data needs
    (measured on chip: the deep rolls cost 29 of the sum-scan's 53 us, so
    molecular streams run 4 passes instead of 8).  Short runs -> NP=4,
    any in-block run > 16 -> full depth; the scan stays exact either way."""
    from phc_gnn_tpu.graph.segment import segment_sum
    from phc_gnn_tpu.ops.stream_scan import (_pack_scan_gates,
                                             build_scan_plan,
                                             segment_sum_streamed)

    # degrees <= 6: NP = 4
    short = np.repeat(np.arange(80), 4)[:256].astype(np.int64)
    g4, _, _ = build_scan_plan(np.sort(short), 80, 256)
    assert g4.shape[1] == 2 * 4 + 2
    # one 40-row segment: middle tier NP = 6 (covers runs <= 64)
    mid = np.sort(np.concatenate([np.zeros(40), np.arange(1, 217)]))
    g6, _, _ = build_scan_plan(mid.astype(np.int64), 217, 256)
    assert g6.shape[1] == 2 * 6 + 2
    # a 100-row segment: full depth (log2(256) = 8)
    long = np.sort(np.concatenate([np.zeros(100), np.arange(1, 157)]))
    g8, _, _ = build_scan_plan(long.astype(np.int64), 157, 256)
    assert g8.shape[1] == 2 * 8 + 2

    for recv, n in ((np.sort(short), 80), (mid.astype(np.int64), 217),
                    (long.astype(np.int64), 157)):
        rng = np.random.default_rng(9)
        msgs = jnp.asarray(rng.normal(size=(256, 24)).astype(np.float32))
        flags, cont, last = build_scan_plan(recv, n, 256)
        got = segment_sum_streamed(msgs, jnp.asarray(recv.astype(np.int32)),
                                   jnp.asarray(flags), jnp.asarray(cont),
                                   jnp.asarray(last), n, block_edges=256)
        want = segment_sum(msgs, jnp.asarray(recv.astype(np.int32)), n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
