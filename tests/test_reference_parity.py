"""Golden parity tests against the ACTUAL reference implementation.

The reference's algebra/layer modules that depend only on torch (not
torch_geometric/torch_scatter) are imported straight from /root/reference and
used as oracles: same weights loaded into both frameworks must produce the same
outputs (BASELINE.json: per-layer activation parity).  Skipped wholesale when
the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = os.environ.get("PHC_REFERENCE", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "phc")):
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.append(REF)  # append: must not shadow our 'benchmarks' package

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _to_t(x):
    return torch.from_numpy(np.asarray(x))


def _pin_uninit_bias(*ref_linears):
    """The reference's PHMLinear.reset_parameters sets b[:out/n]=0.0 and
    b[out/n+1:]=0.2, leaving b[out/n] as whatever ``torch.empty`` returned
    (layers.py:276-278).  Pin that element so oracle outputs are deterministic
    (it can be arbitrarily huge — e.g. 3.2e6 — making tests flaky-by-garbage)."""
    for lin in ref_linears:
        if getattr(lin, "b", None) is not None:
            with torch.no_grad():
                lin.b.data[lin.out_features // lin.phm_dim] = 0.2


def test_multiplication_rules_match_reference():
    from phc.hypercomplex.utils import get_multiplication_matrices

    from phc_gnn_tpu.hypercomplex import get_multiplication_rule

    for n in (1, 2, 3, 4, 5, 8):
        ours = get_multiplication_rule(n, "standard")
        theirs = torch.stack(get_multiplication_matrices(n, type="standard"))
        np.testing.assert_array_equal(ours, theirs.numpy())


def test_kronecker_matches_reference():
    from phc.hypercomplex.kronecker import kronecker_product_einsum_batched

    from phc_gnn_tpu.hypercomplex import batched_kron

    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 4, 4)).astype(np.float32)
    b = rng.normal(size=(4, 5, 7)).astype(np.float32)
    ours = batched_kron(jnp.asarray(a), jnp.asarray(b))
    theirs = kronecker_product_einsum_batched(_to_t(a), _to_t(b))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("n,fi,fo", [(2, 8, 6), (4, 8, 12), (5, 10, 5)])
def test_phm_linear_forward_matches_reference(n, fi, fo):
    """Load identical weights into reference PHMLinear and ours; outputs must
    match to float32 tolerance (per-layer allclose, BASELINE north star)."""
    from phc.hypercomplex.layers import PHMLinear as RefPHMLinear

    from phc_gnn_tpu.nn import PHMLinear

    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, n * fi)).astype(np.float32)

    ref = RefPHMLinear(in_features=n * fi, out_features=n * fo, phm_dim=n,
                       w_init="phm", c_init="standard", learn_phm=True)
    _pin_uninit_bias(ref)
    with torch.no_grad():
        y_ref = ref(_to_t(x)).numpy()

    ours = PHMLinear(in_features=n * fi, out_features=n * fo, phm_dim=n)
    params = {"params": {
        "W": jnp.asarray(ref.W.detach().numpy()),
        "phm_rule": jnp.asarray(ref.phm_rule.detach().numpy()),
        "b": jnp.asarray(ref.b.detach().numpy()),
    }}
    y_ours = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=2e-4, atol=2e-4)


def test_phm_mlp_forward_matches_reference():
    from phc.hypercomplex.layers import PHMMLP as RefPHMMLP

    from phc_gnn_tpu.nn import PHMMLP

    n, d = 4, 8
    rng = np.random.default_rng(2)
    x = rng.normal(size=(32, n * d)).astype(np.float32)
    ref = RefPHMMLP(in_features=n * d, out_features=n * d, phm_dim=n,
                    phm_rule=None, activation="relu", norm=None)
    _pin_uninit_bias(ref.linear1, ref.linear2)
    with torch.no_grad():
        y_ref = ref(_to_t(x)).numpy()
    ours = PHMMLP(in_features=n * d, out_features=n * d, phm_dim=n,
                  activation="relu", norm=None)
    params = {"params": {
        "linear1": {"W": jnp.asarray(ref.linear1.W.detach().numpy()),
                    "phm_rule": jnp.asarray(ref.linear1.phm_rule.detach().numpy()),
                    "b": jnp.asarray(ref.linear1.b.detach().numpy())},
        "linear2": {"W": jnp.asarray(ref.linear2.W.detach().numpy()),
                    "phm_rule": jnp.asarray(ref.linear2.phm_rule.detach().numpy()),
                    "b": jnp.asarray(ref.linear2.b.detach().numpy())},
    }}
    y_ours = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=2e-4, atol=2e-4)


def test_real_transformer_linear_matches_reference():
    from phc.hypercomplex.layers import RealTransformer as RefRT

    from phc_gnn_tpu.nn import RealTransformer

    n, d = 4, 8
    rng = np.random.default_rng(3)
    x = rng.normal(size=(16, n * d)).astype(np.float32)
    ref = RefRT(type="linear", in_features=n * d, phm_dim=n, bias=True)
    with torch.no_grad():
        y_ref = ref(_to_t(x)).numpy()
    ours = RealTransformer(trafo_type="linear", in_features=n * d, phm_dim=n)
    params = {"params": {"affine": {
        "kernel": jnp.asarray(ref.affine.weight.detach().numpy().T),
        "bias": jnp.asarray(ref.affine.bias.detach().numpy()),
    }}}
    y_ours = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=1e-5, atol=1e-5)


def test_naive_phm_norm_matches_reference_train_mode():
    from phc.hypercomplex.norm import PHMNorm as RefNorm

    from phc_gnn_tpu.nn import PHMNorm

    n, d, batch = 4, 8, 64
    rng = np.random.default_rng(4)
    x = (rng.normal(size=(batch, n * d)) * 2 + 1).astype(np.float32)
    ref = RefNorm(num_features=n * d, phm_dim=n, type="naive-batch-norm")
    ref.train()
    with torch.no_grad():
        y_ref = ref(_to_t(x)).numpy()
    ours = PHMNorm(num_features=n * d, phm_dim=n, norm_type="naive-batch-norm")
    variables = ours.init(jax.random.key(0), jnp.asarray(x), training=True)
    y_ours, _ = ours.apply(variables, jnp.asarray(x), training=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=1e-3, atol=1e-4)


def test_quaternion_whitening_norm_matches_reference():
    from phc.quaternion.algebra import QTensor
    from phc.quaternion.norm import QuaternionBatchNorm as RefQBN

    from phc_gnn_tpu.nn import QuaternionWhiteningNorm

    d, batch = 6, 128
    rng = np.random.default_rng(5)
    x = rng.normal(size=(batch, 4, d)).astype(np.float32)
    ref = RefQBN(num_features=d)
    ref.train()
    q = QTensor(*[_to_t(x[:, c]) for c in range(4)])
    with torch.no_grad():
        y_ref = ref(q)
    y_ref = np.stack([y_ref.r.numpy(), y_ref.i.numpy(), y_ref.j.numpy(),
                      y_ref.k.numpy()], axis=1)
    ours = QuaternionWhiteningNorm(num_features=d)
    variables = ours.init(jax.random.key(0), jnp.asarray(x), training=True)
    y_ours, _ = ours.apply(variables, jnp.asarray(x), training=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=5e-3, atol=5e-3)


def test_phm_dropout_scaling_matches_reference_semantics():
    from phc.hypercomplex.layers import phm_dropout as ref_dropout

    n, d, batch, p = 4, 16, 512, 0.5
    x = np.ones((batch, n * d), np.float32)
    torch.manual_seed(0)
    y_ref = ref_dropout(_to_t(x.copy()), phm_dim=n, p=p, training=True,
                        same=True).numpy()
    vals_ref = set(np.unique(y_ref.round(6)))
    from phc_gnn_tpu.nn import phm_dropout
    import jax
    y = phm_dropout(jax.random.key(0), jnp.asarray(x), p, n, training=True,
                    same=True)
    vals = set(np.unique(np.asarray(y).round(6)))
    assert vals == vals_ref == {0.0, 2.0}


def test_quaternion_init_statistics_match_reference():
    """Distributional check: same expected second moment per component."""
    from phc.quaternion.inits import quaternion_init as ref_qinit

    from phc_gnn_tpu.hypercomplex import quaternion_init

    fi, fo = 128, 128
    torch.manual_seed(0)
    np.random.seed(0)
    wr, wi, wj, wk = ref_qinit(fi, fo, criterion="glorot", transpose=False)
    ref_m2 = np.mean(wr.numpy() ** 2 + wi.numpy() ** 2 + wj.numpy() ** 2
                     + wk.numpy() ** 2)
    ours = quaternion_init(jax.random.key(0), fi, fo)
    ours_m2 = float(jnp.mean(jnp.sum(ours ** 2, axis=0)))
    assert abs(ours_m2 - ref_m2) / ref_m2 < 0.25


def test_gine_conv_matches_reference_composition():
    """Full conv-layer parity: our PHMGINEConv (sum aggregation) against a
    composition of the REFERENCE's PHMMLP with torch index_add_ message
    passing (the exact semantics PyG's propagate implements for aggr='add')."""
    from phc.hypercomplex.layers import PHMMLP as RefPHMMLP

    from phc_gnn_tpu.graph.conv import PHMGINEConv

    n, d, N, E = 4, 8, 16, 40
    rng = np.random.default_rng(7)
    x = rng.normal(size=(N, n * d)).astype(np.float32)
    senders = rng.integers(0, N, size=E).astype(np.int64)
    receivers = rng.integers(0, N, size=E).astype(np.int64)
    edge_attr = rng.normal(size=(E, n * d)).astype(np.float32)

    # reference-side: message = x[senders] + e; aggregate = index_add;
    # += self; transform = reference PHMMLP
    ref_mlp = RefPHMMLP(in_features=n * d, out_features=n * d, phm_dim=n,
                        phm_rule=None, activation="relu", norm=None)
    _pin_uninit_bias(ref_mlp.linear1, ref_mlp.linear2)
    with torch.no_grad():
        msgs = _to_t(x)[torch.from_numpy(senders)] + _to_t(edge_attr)
        aggr = torch.zeros(N, n * d)
        aggr.index_add_(0, torch.from_numpy(receivers), msgs)
        aggr = aggr + _to_t(x)
        y_ref = ref_mlp(aggr).numpy()

    conv = PHMGINEConv(in_features=n * d, out_features=n * d, phm_dim=n,
                       aggr="sum", norm=None, activation="relu")
    params = {"params": {"transform": {
        "linear1": {"W": jnp.asarray(ref_mlp.linear1.W.detach().numpy()),
                    "phm_rule": jnp.asarray(ref_mlp.linear1.phm_rule.detach().numpy()),
                    "b": jnp.asarray(ref_mlp.linear1.b.detach().numpy())},
        "linear2": {"W": jnp.asarray(ref_mlp.linear2.W.detach().numpy()),
                    "phm_rule": jnp.asarray(ref_mlp.linear2.phm_rule.detach().numpy()),
                    "b": jnp.asarray(ref_mlp.linear2.b.detach().numpy())},
    }}}
    y_ours = conv.apply(params, jnp.asarray(x), jnp.asarray(senders),
                        jnp.asarray(receivers), jnp.asarray(edge_attr))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=2e-4, atol=2e-4)


def test_softmax_aggregation_matches_reference_scatter_softmax():
    """Our softmax aggregation against the reference conv's aggregate():
    scatter_softmax(beta*m) weights then scatter_sum (messagepassing.py:211-214),
    re-expressed with plain torch ops."""
    from phc_gnn_tpu.graph.aggregators import softmax_aggregate

    rng = np.random.default_rng(8)
    E, N, D = 60, 12, 16
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    recv = rng.integers(0, N, size=E).astype(np.int64)
    beta = 1.7

    with torch.no_grad():
        t_msgs = _to_t(msgs)
        t_recv = torch.from_numpy(recv)
        logits = beta * t_msgs
        # scatter_softmax reference semantics
        seg_max = torch.full((N, D), -torch.inf)
        seg_max.scatter_reduce_(0, t_recv[:, None].expand(E, D), logits,
                                "amax", include_self=True)
        expd = torch.exp(logits - seg_max[t_recv])
        denom = torch.zeros(N, D).index_add_(0, t_recv, expd)
        w = expd / denom[t_recv]
        want = torch.zeros(N, D).index_add_(0, t_recv, w * t_msgs).numpy()

    got = softmax_aggregate(jnp.asarray(msgs), jnp.asarray(recv.astype(np.int32)),
                            N, beta)
    # nodes with no incoming edges: reference yields 0 via empty sums
    mask = np.zeros(N, bool)
    mask[recv] = True
    np.testing.assert_allclose(np.asarray(got)[mask], want[mask], rtol=1e-4,
                               atol=1e-5)


def test_phm_encoder_matches_reference():
    """PHMEncoder with the reference's embedding weights produces identical
    stacked encodings."""
    from phc.hypercomplex.encoder import PHMEncoder as RefEnc

    from phc_gnn_tpu.nn import PHMEncoder

    dims, out, n = [7, 5], 6, 4
    x = np.asarray([[0, 1], [3, 4], [6, 0]], np.int64)
    ref = RefEnc(out_dim=out, input_dims=dims, phm_dim=n)
    with torch.no_grad():
        y_ref = ref(_to_t(x)).numpy()  # [N, n, out]

    ours = PHMEncoder(out_dim=out, input_dims=dims, phm_dim=n)
    params = {"params": {}}
    for c in range(n):
        enc = ref.encoders[c]
        params["params"][f"encoder_{c}"] = {"integer": {
            f"embedding_{i}": jnp.asarray(
                enc.embeddings[i].weight.detach().numpy())
            for i in range(len(dims))}}
    y_ours = ours.apply(params, jnp.asarray(x.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=1e-5, atol=1e-6)


def test_two_layer_stack_matches_reference_composition():
    """Per-layer activation parity through a composed stack: encoder ->
    [GINE conv -> naive BN] x2 -> global-sum pooling -> PHM linear head, the
    reference side built from the reference's own modules plus plain torch
    index ops (the exact PyG semantics).  Every intermediate is compared."""
    from phc.hypercomplex.encoder import PHMEncoder as RefEnc
    from phc.hypercomplex.layers import PHMLinear as RefLin, PHMMLP as RefMLP
    from phc.hypercomplex.norm import PHMNorm as RefNorm

    from phc_gnn_tpu.graph.conv import PHMGINEConv
    from phc_gnn_tpu.nn import PHMEncoder, PHMLinear, PHMNorm

    n, d = 4, 8
    flat = n * d
    N, E, G = 12, 30, 3
    rng = np.random.default_rng(21)
    x_cat = rng.integers(0, 5, size=(N, 2)).astype(np.int64)
    senders = rng.integers(0, N, size=E).astype(np.int64)
    receivers = rng.integers(0, N, size=E).astype(np.int64)
    edge_emb = rng.normal(size=(E, flat)).astype(np.float32)
    gids = np.sort(rng.integers(0, G, size=N)).astype(np.int64)

    # ---- reference side
    ref_enc = RefEnc(out_dim=d, input_dims=[5, 5], phm_dim=n)
    ref_mlps = [RefMLP(flat, flat, n, None, activation="relu", norm=None)
                for _ in range(2)]
    ref_norms = [RefNorm(num_features=flat, phm_dim=n,
                         type="naive-batch-norm") for _ in range(2)]
    ref_head = RefLin(in_features=flat, out_features=flat, phm_dim=n)
    _pin_uninit_bias(ref_head, *[lin for mlp in ref_mlps
                                 for lin in (mlp.linear1, mlp.linear2)])
    for m in ref_norms:
        m.train()

    acts_ref = []
    with torch.no_grad():
        h = ref_enc(_to_t(x_cat)).reshape(N, flat)
        acts_ref.append(h.numpy().copy())
        for li in range(2):
            msgs = h[torch.from_numpy(senders)] + _to_t(edge_emb)
            aggr = torch.zeros(N, flat)
            aggr.index_add_(0, torch.from_numpy(receivers), msgs)
            h = ref_mlps[li](aggr + h)
            h = ref_norms[li](h)
            h = torch.relu(h)
            acts_ref.append(h.numpy().copy())
        pooled = torch.zeros(G, flat)
        pooled.index_add_(0, torch.from_numpy(gids), h)
        out_ref = ref_head(pooled).numpy()
        acts_ref.append(out_ref)

    # ---- our side with the same weights
    def lin_params(ref):
        return {"W": jnp.asarray(ref.W.detach().numpy()),
                "phm_rule": jnp.asarray(ref.phm_rule.detach().numpy()),
                "b": jnp.asarray(ref.b.detach().numpy())}

    enc = PHMEncoder(out_dim=d, input_dims=[5, 5], phm_dim=n)
    enc_params = {"params": {}}
    for c in range(n):
        e = ref_enc.encoders[c]
        enc_params["params"][f"encoder_{c}"] = {"integer": {
            f"embedding_{i}": jnp.asarray(e.embeddings[i].weight.detach().numpy())
            for i in range(2)}}
    h = enc.apply(enc_params, jnp.asarray(x_cat.astype(np.int32)))
    h = h.reshape(N, flat)
    np.testing.assert_allclose(np.asarray(h), acts_ref[0], rtol=1e-5, atol=1e-6)

    conv = PHMGINEConv(in_features=flat, out_features=flat, phm_dim=n,
                       aggr="sum", norm=None, activation="relu")
    norm = PHMNorm(num_features=flat, phm_dim=n, norm_type="naive-batch-norm")
    for li in range(2):
        conv_params = {"params": {"transform": {
            "linear1": lin_params(ref_mlps[li].linear1),
            "linear2": lin_params(ref_mlps[li].linear2)}}}
        h = conv.apply(conv_params, h, jnp.asarray(senders),
                       jnp.asarray(receivers), jnp.asarray(edge_emb))
        nv = norm.init(jax.random.key(0), h, training=True)
        h, _ = norm.apply(nv, h, training=True, mutable=["batch_stats"])
        h = jax.nn.relu(h)
        np.testing.assert_allclose(np.asarray(h), acts_ref[1 + li],
                                   rtol=5e-3, atol=5e-4)

    pooled = jax.ops.segment_sum(h, jnp.asarray(gids.astype(np.int32)),
                                 num_segments=G)
    head = PHMLinear(in_features=flat, out_features=flat, phm_dim=n)
    out = head.apply({"params": lin_params(ref_head)}, pooled)
    np.testing.assert_allclose(np.asarray(out), acts_ref[-1], rtol=5e-3,
                               atol=5e-4)
