"""END-TO-END parity against the reference's ACTUAL model classes.

The reference models (/root/reference/phc/hypercomplex/undirectional/models.py
PHMSkipConnectAdd:24, PHMSkipConnectConcat:271) import torch_geometric /
torch_scatter / ogb, none of which exist in this environment — tests/pyg_shim
provides a minimal plain-torch implementation of exactly the surface they use
(MessagePassing.propagate, scatter ops, global_add_pool, Batch, feature dims).
Each test constructs a reference model, transplants its weights into our
PHCGNN, runs both on the same (unpadded) graph batch, and asserts the final
logits match at float32 tolerance — through encoder, every conv variant, norm,
pooling, and the downstream head in one composed forward (VERDICT r1 item 5).
"""

import os
import sys

import numpy as np
import pytest

REF = os.environ.get("PHC_REFERENCE", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "phc")):
    pytest.skip("reference checkout not available", allow_module_level=True)

_SHIM = os.path.join(os.path.dirname(__file__), "pyg_shim")
if _SHIM not in sys.path:
    sys.path.insert(0, _SHIM)
if REF not in sys.path:
    sys.path.append(REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phc_gnn_tpu.graph.batch import GraphsTuple  # noqa: E402
from phc_gnn_tpu.models import PHCGNN  # noqa: E402

ATOL = 2e-4
RTOL = 2e-4


# ---------------------------------------------------------------- fixtures

def make_inputs(seed, N=18, E=48, G=4, atom_dims=(7, 5), bond_dims=(6, 3)):
    """Unpadded batch where every node has >= 1 incoming edge (so min/max/mean
    empty-segment conventions never enter) and every graph >= 1 node."""
    rng = np.random.default_rng(seed)
    x = np.stack([rng.integers(0, d, size=N) for d in atom_dims],
                 axis=1).astype(np.int64)
    e = np.stack([rng.integers(0, d, size=E) for d in bond_dims],
                 axis=1).astype(np.int64)
    senders = rng.integers(0, N, size=E).astype(np.int64)
    receivers = np.concatenate([
        np.arange(N), rng.integers(0, N, size=E - N)]).astype(np.int64)
    rng.shuffle(receivers)
    gids = np.sort(np.concatenate([
        np.arange(G), rng.integers(0, G, size=N - G)])).astype(np.int64)
    return x, e, senders, receivers, gids


def ref_batch(x, e, senders, receivers, gids):
    from torch_geometric.data import Batch

    return Batch(x=torch.from_numpy(x),
                 edge_index=torch.from_numpy(np.stack([senders, receivers])),
                 edge_attr=torch.from_numpy(e),
                 batch=torch.from_numpy(gids))


def our_batch(x, e, senders, receivers, gids, G):
    N, E = x.shape[0], e.shape[0]
    return GraphsTuple(
        nodes=jnp.asarray(x.astype(np.int32)),
        edges=jnp.asarray(e.astype(np.int32)),
        senders=jnp.asarray(senders.astype(np.int32)),
        receivers=jnp.asarray(receivers.astype(np.int32)),
        graph_ids=jnp.asarray(gids.astype(np.int32)),
        node_mask=jnp.ones(N, bool),
        edge_mask=jnp.ones(E, bool),
        graph_mask=jnp.ones(G, bool))


# ------------------------------------------------------- weight transplant

def _pin_uninit_biases(model):
    """Deterministically fill the reference PHMLinear's uninitialized
    b[out/n] element (layers.py:276-278) in every layer of the model."""
    for m in model.modules():
        if m.__class__.__name__ == "PHMLinear" and getattr(m, "b", None) is not None:
            with torch.no_grad():
                m.b.data[m.out_features // m.phm_dim] = 0.2


def lin_p(ref):
    return {"W": jnp.asarray(ref.W.detach().numpy()),
            "phm_rule": jnp.asarray(ref.phm_rule.detach().numpy()),
            "b": jnp.asarray(ref.b.detach().numpy())}


def mlp_p(ref, n):
    out = {"linear1": lin_p(ref.linear1), "linear2": lin_p(ref.linear2)}
    if ref.norm_flag:
        out["norm"] = bn_p(ref.norm, n)
    return out


def enc_p(ref_enc, n, n_feats):
    return {f"encoder_{c}": {"integer": {
        f"embedding_{i}": jnp.asarray(
            ref_enc.encoders[c].embeddings[i].weight.detach().numpy())
        for i in range(n_feats)}} for c in range(n)}


def bn_p(ref_norm, n):
    """Reference PHMNorm(naive) = n independent BatchNorm1d(d); ours = one
    _BatchNorm with feature shape [n, d]."""
    bns = ref_norm.bn.bn
    return {"bn": {
        "scale": jnp.asarray(np.stack([m.weight.detach().numpy() for m in bns])),
        "bias": jnp.asarray(np.stack([m.bias.detach().numpy() for m in bns]))}}


def rt_p(ref_rt):
    return {"affine": {
        "kernel": jnp.asarray(ref_rt.affine.weight.detach().numpy().T),
        "bias": jnp.asarray(ref_rt.affine.bias.detach().numpy())}}


def conv_p(facade, aggr, mlp, n):
    t = facade.transform  # the conv instance inside the reference facade
    if aggr == "pna":
        post = {}
        li = 0
        for m in t.transform:  # nn.Sequential: Linear [Norm? act Linear]*
            cname = m.__class__.__name__
            if cname == "PHMLinear":
                post[f"post_{li}"] = lin_p(m)
                li += 1
            elif cname == "PHMNorm":
                post[f"post_norm_{li}"] = bn_p(m, n)
        return {"conv": post}
    inner = {"transform": mlp_p(t.transform, n) if mlp else lin_p(t.transform)}
    if aggr == "softmax":
        inner["beta"] = jnp.asarray(t.beta.detach().numpy())
    return {"conv": inner}


_FIXED_CONCAT_CACHE = {}


def fixed_concat(base):
    """PHMSkipConnectConcat.forward CRASHES for phm_dim>1: the layer-0
    bond reshape (models.py:486) targets phm_dim*self.input_dim elements
    but the encoder emits phm_dim*(input_dim//phm_dim) — a latent
    reference bug (the intended target, consistent with the layer-0 conv's
    in_features=input_dim, is the flat embed dim).  Oracle = the actual
    class with only that reshape corrected (PARITY.md divergence #8).

    The class is cached and published under this module's globals so
    torch.save(model) — which the reference's do_run calls on whole modules —
    can pickle it by qualified name."""
    cached = _FIXED_CONCAT_CACHE.get(base)
    if cached is not None:
        return cached

    class FixedConcat(base):
        def forward(self, data, size=None):
            xx, edge_index, edge_attr, batch = (data.x, data.edge_index,
                                                data.edge_attr, data.batch)
            if isinstance(self.bond_input_dims, list):
                edge_attr = edge_attr.to(torch.long)
            atom = self.atomencoder(xx)
            atom = atom.reshape(atom.size(0),
                                self.phm_dim * self.atom_encoded_dim)
            h = None
            for i in range(len(self.mp_layers)):
                pair = ([atom.clone(), atom.clone()] if i == 0
                        else [h, atom.clone()])
                ea = self.bondencoders[i](edge_attr)
                ea = ea.reshape(ea.size(0), -1)  # the one-line fix
                h = self.compute_hidden_layer_embedding(
                    conv=self.convs[i], norm=self.norms[i], x=pair,
                    edge_index=edge_index, edge_attr=ea,
                    dropout_mpnn=self.dropout_mpnn[i], size=size)
            out = self.pooling(x=h, batch=batch)
            return self.downstream(out)

    FixedConcat.__qualname__ = f"FixedConcat_{base.__name__}"
    globals()[FixedConcat.__qualname__] = FixedConcat
    _FIXED_CONCAT_CACHE[base] = FixedConcat
    return FixedConcat


def transplant(ref, *, n, atom_dims, bond_dims, aggr, mlp, pooling, norm_mp,
               norm_dn):
    p = {"atomencoder": enc_p(ref.atomencoder, n, len(atom_dims))}
    for i, be in enumerate(ref.bondencoders):
        p[f"bondencoder_{i}"] = enc_p(be, n, len(bond_dims))
    for i, conv in enumerate(ref.convs):
        p[f"conv_{i}"] = conv_p(conv, aggr, mlp, n)
    if norm_mp:
        for i, nm in enumerate(ref.norms):
            p[f"norm_{i}"] = bn_p(nm, n)
    if pooling == "softattention":
        p["pooling"] = {"linear": lin_p(ref.pooling.linear),
                        "real_trafo": rt_p(ref.pooling.real_trafo)}
    ds = {"real_trafo": rt_p(ref.downstream.real_trafo)}
    for i, aff in enumerate(ref.downstream.affine):
        ds[f"affine_{i}"] = lin_p(aff)
    if ref.downstream.norm_flag:
        for i, nm in enumerate(ref.downstream.norm):
            ds[f"norm_{i}"] = bn_p(nm, n)
    p["downstream"] = ds
    return p


# ------------------------------------------------------------- the harness

def run_parity(seed, *, n=4, embed=32, mp_layers=(32, 32), skip="add",
               sc_type="first", aggr="softmax", mlp=False,
               pooling="softattention", norm_mp="naive-batch-norm",
               norm_dn="naive-batch-norm", downstream=(24, 16), target=2,
               activation="relu", pna_kwargs=None, atol=ATOL, rtol=RTOL):
    from phc.hypercomplex.undirectional.models import (
        PHMSkipConnectAdd,
        PHMSkipConnectConcat,
    )

    atom_dims, bond_dims = [7, 5], [6, 3]
    x, e, s, r, g = make_inputs(seed)
    G = int(g.max()) + 1

    L = len(mp_layers)
    common = dict(
        phm_dim=n, learn_phm=True, phm_rule=None,
        atom_input_dims=atom_dims, atom_encoded_dim=embed,
        bond_input_dims=bond_dims, naive_encoder=False,
        w_init="phm", c_init="standard", same_dropout=False,
        mp_layers=list(mp_layers), bias=True, dropout_mpnn=[0.0] * L,
        norm_mp=norm_mp, add_self_loops=True,
        msg_aggr=aggr, node_aggr="sum", mlp=mlp, pooling=pooling,
        activation=activation, real_trafo="linear",
        downstream_layers=list(downstream), target_dim=target,
        dropout_dn=0.0, norm_dn=norm_dn, msg_encoder="identity")
    kwargs = dict(initial_beta=1.0, learn_beta=True)
    if pna_kwargs:
        kwargs.update(pna_kwargs)
    cls = (PHMSkipConnectAdd if skip == "add"
           else fixed_concat(PHMSkipConnectConcat))
    if skip == "add":
        common["sc_type"] = sc_type
    torch.manual_seed(seed)
    ref = cls(**common, **kwargs)
    _pin_uninit_biases(ref)
    ref.train()  # BN uses batch statistics; dropout rates are all 0
    with torch.no_grad():
        y_ref = ref(ref_batch(x, e, s, r, g)).numpy()

    # The reference Concat model passes out_features=phm_dim*target_dim to its
    # downstream net (models.py:411) which multiplies by phm_dim AGAIN — it
    # emits n*target_dim real logits (quirk; the Add model passes target_dim).
    # Compare apples-to-apples by widening our target accordingly.
    ours_target = target if skip == "add" else n * target
    ours = PHCGNN(
        phm_dim=n, atom_input_dims=tuple(atom_dims), atom_encoded_dim=embed,
        bond_input_dims=tuple(bond_dims), mp_layers=tuple(mp_layers),
        dropout_mpnn=(0.0,) * L, norm_mp=norm_mp, msg_aggr=aggr, mlp_mp=mlp,
        pooling=pooling, activation=activation,
        downstream_layers=tuple(downstream), target_dim=ours_target,
        dropout_dn=0.0, norm_dn=norm_dn, sc_type=sc_type, skip_connect=skip,
        initial_beta=1.0, learn_beta=True,
        avg_deg=(pna_kwargs or {}).get("avg_deg_ours"),
        pna_aggregators=tuple((pna_kwargs or {}).get(
            "aggregators", ("mean", "min", "max", "std"))),
        pna_scalers=tuple((pna_kwargs or {}).get(
            "scalers", ("identity", "amplification", "attenuation"))),
        pna_post_layers=(pna_kwargs or {}).get("post_layers", 1))
    batch = our_batch(x, e, s, r, g, G)
    variables = ours.init(jax.random.key(0), batch, training=True)
    params = transplant(ref, n=n, atom_dims=atom_dims, bond_dims=bond_dims,
                        aggr=aggr, mlp=mlp, pooling=pooling, norm_mp=norm_mp,
                        norm_dn=norm_dn)
    variables = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}
    y_ours, _ = ours.apply(variables, batch, training=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=rtol, atol=atol)


# ------------------------------------------------------------------- tests

def test_add_softmax_linear_softattention():
    """The molhiv flagship architecture: add-skip, softmax aggregation,
    linear conv transform, soft-attention pooling (run_script_hiv_phm4.sh)."""
    run_parity(101)


def test_add_softmax_mlp():
    run_parity(102, aggr="softmax", mlp=True)


def test_add_sum_gine_globalsum_sc_last():
    """ZINC-style: sum aggregation, GINE MLP conv, sc_type last."""
    run_parity(103, aggr="add", mlp=True, pooling="globalsum", sc_type="last")


def test_add_sum_linear_no_norms():
    run_parity(104, aggr="add", mlp=False, norm_mp=None, norm_dn=None)


def test_add_mean_linear_n2():
    run_parity(105, n=2, aggr="mean", mlp=False)


def test_add_max_gine():
    run_parity(106, aggr="max", mlp=True)


def test_add_softmax_three_layers_elu():
    run_parity(107, mp_layers=(32, 32, 32), activation="elu")


def test_concat_softmax_linear():
    run_parity(108, skip="concat")


def test_concat_sum_gine_n2():
    run_parity(109, skip="concat", n=2, aggr="add", mlp=True,
               pooling="globalsum")


# ------------------------------------------------- quaternion model parity

def qlin_p(ref):
    """QLinear (Hamilton product via real 4x4-block representation,
    quaternion/algebra.py:573-624) == our PHMLinear(n=4, standard rule) with
    W = [W_r^T, -W_i^T, -W_j^T, -W_k^T]: R(W)^T = A1 (x) W_r^T - sum_i Ai (x)
    W_i^T because the i/j/k rule matrices are skew-symmetric.  Verified exact
    on CPU."""
    from phc_gnn_tpu.hypercomplex import get_multiplication_rule

    W = np.stack([ref.W_r.detach().numpy().T, -ref.W_i.detach().numpy().T,
                  -ref.W_j.detach().numpy().T, -ref.W_k.detach().numpy().T])
    out = {"W": jnp.asarray(W),
           "phm_rule": jnp.asarray(get_multiplication_rule(4, "standard"))}
    if ref.bias:
        out["b"] = jnp.asarray(np.concatenate(
            [ref.b_r.detach().numpy(), ref.b_i.detach().numpy(),
             ref.b_j.detach().numpy(), ref.b_k.detach().numpy()]))
    return out


def qmlp_p(ref):
    out = {"linear1": qlin_p(ref.qlinear1), "linear2": qlin_p(ref.qlinear2)}
    if ref.norm_flag:
        out["norm"] = qnorm_p(ref.norm)
    return out


def qenc_p(ref_enc, n_feats):
    return {f"encoder_{c}": {"integer": {
        f"embedding_{i}": jnp.asarray(
            getattr(ref_enc, comp).embeddings[i].weight.detach().numpy())
        for i in range(n_feats)}}
        for c, comp in enumerate("rijk")}


def qbn_p(ref_norm):
    """QuaternionNorm('naive-batch-norm') = 4 BatchNorm1d in a ModuleDict."""
    bns = [ref_norm.bn.bn[c] for c in "rijk"]
    return {"bn": {
        "scale": jnp.asarray(np.stack([m.weight.detach().numpy() for m in bns])),
        "bias": jnp.asarray(np.stack([m.bias.detach().numpy() for m in bns]))}}


def qwbn_p(ref_norm):
    """QuaternionNorm('q-batch-norm') = full whitening BN
    (quaternion/norm.py:203-276): learnable Gamma [4,4,F] / beta [4,F] map to
    our QuaternionWhiteningNorm's gamma/beta under the 'qbn' submodule."""
    q = ref_norm.bn
    return {"qbn": {"gamma": jnp.asarray(q.weight.detach().numpy()),
                    "beta": jnp.asarray(q.bias.detach().numpy())}}


def qnorm_p(ref_norm):
    """Dispatch on the reference QuaternionNorm wrapper's type."""
    return qwbn_p(ref_norm) if ref_norm.type == "q-batch-norm" \
        else qbn_p(ref_norm)


def qrt_p(ref_rt):
    return {"affine": {
        "kernel": jnp.asarray(ref_rt.affine.weight.detach().numpy().T),
        "bias": jnp.asarray(ref_rt.affine.bias.detach().numpy())}}


def q_transplant(ref, *, atom_dims, bond_dims, aggr, mlp, pooling):
    """Weight transplant for the reference's fixed-n=4 quaternion models
    (quaternion/undirectional/models.py:25) into our PHCGNN(n=4) param tree.
    Norm types (naive vs whitening 'q-batch-norm') are read off each
    QuaternionNorm wrapper."""
    p = {"atomencoder": qenc_p(ref.atomencoder, len(atom_dims))}
    for i, be in enumerate(ref.bondencoders):
        p[f"bondencoder_{i}"] = qenc_p(be, len(bond_dims))
    for i, facade in enumerate(ref.convs):
        t = facade.transform
        inner = {"transform": qmlp_p(t.transform) if mlp
                 else qlin_p(t.transform)}
        if aggr == "softmax":
            inner["beta"] = jnp.asarray(t.beta.detach().numpy())
        p[f"conv_{i}"] = {"conv": inner}
    for i, nm in enumerate(ref.norms):
        p[f"norm_{i}"] = qnorm_p(nm)
    if pooling == "softattention":
        p["pooling"] = {"linear": qlin_p(ref.pooling.linear),
                        "real_trafo": qrt_p(ref.pooling.real_trafo)}
    ds = {"real_trafo": qrt_p(ref.downstream.real_trafo)}
    for i, aff in enumerate(ref.downstream.affine):
        ds[f"affine_{i}"] = qlin_p(aff)
    if ref.downstream.norm_flag:
        for i, nm in enumerate(ref.downstream.norm):
            ds[f"norm_{i}"] = qnorm_p(nm)
    p["downstream"] = ds
    return p


def run_q_parity(seed, *, embed=32, mp_layers=(32, 32), aggr="softmax",
                 mlp=False, pooling="softattention",
                 norm_mp="naive-batch-norm", downstream=(24, 16), target=2,
                 atol=ATOL, rtol=RTOL):
    """QuaternionSkipConnectAdd (the reference's fixed-n=4 package, QTensor +
    Hamilton products throughout) against our generic-n PHCGNN at n=4."""
    from phc.quaternion.undirectional.models import QuaternionSkipConnectAdd

    atom_dims, bond_dims = [7, 5], [6, 3]
    x, e, s, r, g = make_inputs(seed)
    G = int(g.max()) + 1
    L = len(mp_layers)

    torch.manual_seed(seed)
    np.random.seed(seed)  # quaternion_init draws from numpy's global RNG
    ref = QuaternionSkipConnectAdd(
        atom_input_dims=atom_dims, atom_encoded_dim=embed,
        bond_input_dims=bond_dims, naive_encoder=False, init="quaternion",
        same_dropout=False, mp_layers=list(mp_layers),
        dropout_mpnn=[0.0] * L, norm_mp=norm_mp, add_self_loops=True,
        msg_aggr=aggr, node_aggr="sum", mlp=mlp, pooling=pooling,
        activation="relu", real_trafo="linear",
        downstream_layers=list(downstream), target_dim=target,
        dropout_dn=0.0, norm_dn="naive-batch-norm", msg_encoder="identity",
        initial_beta=1.0, learn_beta=True)
    ref.train()
    with torch.no_grad():
        y_q = ref(ref_batch(x, e, s, r, g))
    y_ref = y_q.numpy() if torch.is_tensor(y_q) else np.stack(
        [y_q.r.numpy(), y_q.i.numpy(), y_q.j.numpy(), y_q.k.numpy()], 1)

    ours = PHCGNN(
        phm_dim=4, atom_input_dims=tuple(atom_dims), atom_encoded_dim=embed,
        bond_input_dims=tuple(bond_dims), mp_layers=tuple(mp_layers),
        dropout_mpnn=(0.0,) * L, norm_mp=norm_mp, msg_aggr=aggr, mlp_mp=mlp,
        pooling=pooling, activation="relu", downstream_layers=tuple(downstream),
        target_dim=target, dropout_dn=0.0, norm_dn="naive-batch-norm",
        sc_type="first", skip_connect="add", initial_beta=1.0, learn_beta=True)
    batch = our_batch(x, e, s, r, g, G)
    variables = ours.init(jax.random.key(0), batch, training=True)

    p = q_transplant(ref, atom_dims=atom_dims, bond_dims=bond_dims,
                     aggr=aggr, mlp=mlp, pooling=pooling)

    variables = {"params": p, "batch_stats": variables.get("batch_stats", {})}
    y_ours, _ = ours.apply(variables, batch, training=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=rtol, atol=atol)


def test_quaternion_add_softmax_linear():
    run_q_parity(201)


def test_quaternion_add_whitening_bn():
    """Full quaternion model with the whitening 'q-batch-norm' in the MP
    stack (quaternion/norm.py:104-276) — pins q_transplant's qwbn_p path
    ahead of the trained-convergence record."""
    run_q_parity(203, norm_mp="q-batch-norm")


def test_quaternion_add_sum_gine_globalsum():
    run_q_parity(202, aggr="add", mlp=True, pooling="globalsum")


def test_add_pna():
    deg_hist = torch.tensor([0.0, 3.0, 6.0, 4.0, 2.0, 1.0])
    avg = {"lin": deg_hist.mean().item(),
           "log": (deg_hist + 1).log().mean().item(),
           "exp": deg_hist.exp().mean().item()}
    run_parity(110, aggr="pna", norm_mp="naive-batch-norm",
               pna_kwargs={"deg": deg_hist,
                           "aggregators": ["mean", "min", "max", "std"],
                           "scalers": ["identity", "amplification",
                                       "attenuation"],
                           "post_layers": 2,
                           "avg_deg_ours": avg})
