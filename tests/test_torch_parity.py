"""Numerical parity vs the PyTorch reference via weight transplant.

For each model we: init OUR params, copy them into the reference's torch
module (imported unmodified from /root/reference), run both forwards on the
same batch in eval mode, and require outputs to match to float32 tolerance.
This pins the full computational contract — embedding layout, MLP/BN math,
gating, domain-norm, stop-gradients don't matter for forward, mask-select —
against the actual reference implementation.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature  # noqa: E402
from scenario_wise_rec_tpu import models as M  # noqa: E402

import scenario_wise_rec.basic.features as rf  # noqa: E402
import scenario_wise_rec.models.multi_domain as rm  # noqa: E402

B, D_NUM, VOCAB = 32, 3, 11
N_SPARSE, N_DENSE = 3, 2


# ------------------------------------------------------------- transplant --


def t(x):
    return torch.tensor(np.asarray(x))


def set_linear(mod, lin):
    mod.weight.data = t(lin["w"]).T.contiguous()
    if mod.bias is not None:
        mod.bias.data = t(lin["b"])


def set_bn(mod, bn):
    mod.weight.data = t(bn["gamma"])
    mod.bias.data = t(bn["beta"])


def set_ln(mod, ln):
    mod.weight.data = t(ln["gamma"])
    mod.bias.data = t(ln["beta"])


def set_mlp(ref_mlp, params):
    """Copy our MLP params into a reference MLP (basic/layers.py:231-264)."""
    layers = [m for m in ref_mlp.mlp]
    li = 0  # index into our hidden layers
    for mod in layers:
        if isinstance(mod, torch.nn.Linear):
            if li < len(params["layers"]):
                set_linear(mod, params["layers"][li]["lin"])
            else:
                set_linear(mod, params["out"])
        elif isinstance(mod, torch.nn.BatchNorm1d):
            set_bn(mod, params["layers"][li]["bn"])
            li += 1
        elif isinstance(mod, torch.nn.PReLU):
            mod.weight.data = t(params["layers"][li - 1]["act"]["alpha"])


def set_embeddings(ref_embedding, coll, params):
    """Copy packed/loose tables into reference EmbeddingLayer.embed_dict."""
    for name, feat in coll.owned.items():
        if name in coll.offsets:
            off = coll.offsets[name]
            rows = params["packed"][off: off + feat.vocab_size]
        else:
            rows = params["tables"][name]
        ref_embedding.embed_dict[name].weight.data = t(rows)


def sub(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def set_gatenu(ref_gate, params):
    lin = [m for m in ref_gate.network if isinstance(m, torch.nn.Linear)]
    set_linear(lin[0], params["l1"])
    set_linear(lin[1], params["l2"])


# ------------------------------------------------------------------ batch --


def make_features():
    sparse = [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=8)
              for i in range(N_SPARSE)]
    dense = [DenseFeature(f"d{i}") for i in range(N_DENSE)]
    ref_sparse = [rf.SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=8)
                  for i in range(N_SPARSE)]
    ref_dense = [rf.DenseFeature(f"d{i}") for i in range(N_DENSE)]
    return sparse, dense, ref_sparse, ref_dense


def make_batch(np_rng):
    x = {f"s{i}": np_rng.integers(0, VOCAB, B) for i in range(N_SPARSE)}
    x.update({f"d{i}": np_rng.normal(size=B).astype(np.float32)
              for i in range(N_DENSE)})
    x["domain_indicator"] = np_rng.integers(0, D_NUM, B)
    xj = {k: jnp.asarray(v) for k, v in x.items()}
    xt = {k: torch.tensor(v) for k, v in x.items()}
    return xj, xt


def compare(ours_fn, ref_model, xj, xt, atol=2e-5):
    ref_model.eval()
    with torch.no_grad():
        expected = ref_model(xt).numpy()
    got = np.asarray(ours_fn(xj))
    np.testing.assert_allclose(got, expected, atol=atol, rtol=1e-4)


# ------------------------------------------------------------------ tests --


def test_mmoe_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    ours = M.MMOE(dense + sparse, D_NUM, n_expert=2,
                  expert_params={"dims": [16, 8]}, tower_params={"dims": [4]})
    params, state = jax.jit(ours.init)(rng)

    ref = rm.MMOE(r_dense + r_sparse, D_NUM, n_expert=2,
                  expert_params={"dims": [16, 8]}, tower_params={"dims": [4]})
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    for i in range(2):
        set_mlp(ref.experts[i], sub(params["experts"], i))
    for d in range(D_NUM):
        set_mlp(ref.gates[d], sub(params["gates"], d))
        set_mlp(ref.towers[d], sub(params["towers"], d))

    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_sharedbottom_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    ours = M.SharedBottom(dense + sparse, D_NUM, bottom_params={"dims": [16]},
                          tower_params={"dims": [8, 4]})
    params, state = jax.jit(ours.init)(rng)
    ref = rm.SharedBottom(r_dense + r_sparse, D_NUM,
                          bottom_params={"dims": [16]},
                          tower_params={"dims": [8, 4]})
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    set_mlp(ref.bottom_mlp, params["bottom"])
    for d in range(D_NUM):
        set_mlp(ref.towers[d], sub(params["towers"], d))
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_star_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    ours = M.Star(dense + sparse, D_NUM, fcn_dims=[16, 8], aux_dims=[8])
    params, state = jax.jit(ours.init)(rng)
    ref = rm.Star(r_dense + r_sparse, D_NUM, fcn_dims=[16, 8], aux_dims=[8])
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    ref.dn_share_gamma.data = t(params["dn"]["share_gamma"])
    ref.dn_share_bias.data = t(params["dn"]["share_beta"])
    set_mlp(ref.auxnet, params["aux"])
    fcn = params["fcn"]
    for i in range(ours.layer_num):
        ref.share_parm_w[i].data = t(fcn["share_w"][i])
        ref.share_parm_b[i].data = t(fcn["share_b"][i])
    for d in range(D_NUM):
        ref.domain_specific_dn_gamma[d].data = t(params["dn"]["gamma"][d])
        ref.domain_specific_dn_bias[d].data = t(params["dn"]["beta"][d])
        for i in range(ours.layer_num):
            ref.domain_specific_w[d][i].data = t(fcn["dom_w"][i][d])
            ref.domain_specific_b[d][i].data = t(fcn["dom_b"][i][d])
            set_bn(ref.domain_specific_bn[d][i], sub(fcn["bn"][i], d))
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    # NB: STAR normalizes with batch statistics even in eval (star.py:95-98)
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_epnet_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    sce = [SparseFeature("domain_indicator", vocab_size=D_NUM, embed_dim=8)]
    r_sce = [rf.SparseFeature("domain_indicator", vocab_size=D_NUM, embed_dim=8)]
    ours = M.EPNet(sce_features=sce, agn_features=sparse + dense,
                   fcn_dims=[16, 8])
    params, state = jax.jit(ours.init)(rng)
    ref = rm.EPNet(sce_features=r_sce, agn_features=r_sparse + r_dense,
                   fcn_dims=[16, 8])
    set_embeddings(ref.sce_embedding, ours.sce_embedding,
                   params["sce_embedding"])
    set_embeddings(ref.agn_embedding, ours.agn_embedding,
                   params["agn_embedding"])
    set_gatenu(ref.gatenu, params["gatenu"])
    set_mlp(ref.mlp, params["mlp"])
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_ppnet_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    ids = [SparseFeature("uid", vocab_size=VOCAB, embed_dim=8)]
    r_ids = [rf.SparseFeature("uid", vocab_size=VOCAB, embed_dim=8)]
    ours = M.PPNet(id_features=ids, agn_features=sparse + dense,
                   domain_num=D_NUM, fcn_dims=[16, 8])
    params, state = jax.jit(ours.init)(rng)
    ref = rm.PPNet(id_features=r_ids, agn_features=r_sparse + r_dense,
                   domain_num=D_NUM, fcn_dims=[16, 8])
    set_embeddings(ref.id_embedding, ours.id_embedding, params["id_embedding"])
    set_embeddings(ref.agn_embedding, ours.agn_embedding,
                   params["agn_embedding"])
    for d in range(D_NUM):
        tower = ref.domain_tower[d]
        p_d = sub(params["towers"], d)
        for i in range(len(tower.mlp_layers)):
            set_mlp(tower.mlp_layers[i], {"layers": [p_d["mlps"][i]["layers"][0]],
                                          "out": None})
            set_gatenu(tower.gate_layers[i], p_d["gates"][i])
        set_linear(tower.final_layer, p_d["final"])
    xj, xt = make_batch(np_rng)
    xj["uid"] = jnp.asarray(np_rng.integers(0, VOCAB, B))
    xt["uid"] = torch.tensor(np.asarray(xj["uid"]))
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_adasparse_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    sce = [SparseFeature("domain_indicator", vocab_size=D_NUM, embed_dim=8)]
    r_sce = [rf.SparseFeature("domain_indicator", vocab_size=D_NUM, embed_dim=8)]
    mlp_params = {"dims": [16, 8], "dropout": 0.0, "activation": "relu"}
    ours = M.AdaSparse(sce_features=sce, agn_features=sparse, form="Fusion",
                       mlp_params=mlp_params)
    params, state = jax.jit(ours.init)(rng)
    ref = rm.AdaSparse(sce_features=r_sce, agn_features=r_sparse, form="Fusion",
                       mlp_params=mlp_params)
    set_embeddings(ref.sce_embedding, ours.sce_embedding,
                   params["sce_embedding"])
    set_embeddings(ref.agn_embedding, ours.agn_embedding,
                   params["agn_embedding"])
    for i, pr in enumerate(ref.pruner_layers):
        pr.linear.weight.data = t(params["pruners"][i]["w"]).T.contiguous()
    for i, seq in enumerate(ref.mlp_layers[:-1]):
        set_linear(seq[0], params["layers"][i]["lin"])
        set_bn(seq[1], params["layers"][i]["bn"])
    set_linear(ref.mlp_layers[-1], params["final"])
    xj, xt = make_batch(np_rng)
    # both sides advance alpha identically on first call; compare eval fwd
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_sarnet_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    ours = M.Sarnet(sparse, D_NUM, domain_shared_expert_num=4,
                    domain_specific_expert_num=2)
    params, state = jax.jit(ours.init)(rng)
    ref = rm.Sarnet(r_sparse, D_NUM, domain_shared_expert_num=4,
                    domain_specific_expert_num=2)
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    for d in range(D_NUM):
        ref.domain_weight[d].data = t(params["dom_w"][d]).reshape(1, -1)
        ref.domain_bias[d].data = t(params["dom_b"][d])
        for i in range(2):
            e = sub(sub(params["spec"], d), i)
            es = sub(sub(state["spec"], d), i)
            set_bn(ref.domain_specific_expert[d][i].bn, e["bn"])
            set_linear(ref.domain_specific_expert[d][i].linear, e["lin"])
    for i in range(4):
        e = sub(params["shared"], i)
        set_bn(ref.shared_expert[i].bn, e["bn"])
        set_linear(ref.shared_expert[i].linear, e["lin"])
    set_linear(ref.gate_net, params["gate"])
    set_mlp(ref.final_mlp, params["final"])
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_hamur_small_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    ours = M.HamurSmall(sparse, D_NUM, fcn_dims=[16, 8], hyper_dims=[8], k=4)
    params, state = jax.jit(ours.init)(rng)
    # the reference's all-ones u/v init makes every adapter pre-activation the
    # same large sum — catastrophic-cancellation territory where fp32
    # accumulation order (XLA vs torch) dominates. Randomize the factors so
    # the parity check runs at sane magnitudes.
    a0 = params["adapters"][0]
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    for i, name in enumerate(["u_down", "v_down", "u_up", "v_up"]):
        a0[name] = 0.1 * jax.random.normal(ks[i], a0[name].shape)
    ref = rm.HamurSmall(r_sparse, D_NUM, fcn_dims=[16, 8], hyper_dims=[8], k=4)
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    for d in range(D_NUM):
        mods = ref.layer_list[d]
        set_linear(mods[0], sub(params["blocks"][0]["lin"], d))
        set_bn(mods[1], sub(params["blocks"][0]["bn"], d))
        set_linear(mods[3], sub(params["blocks"][1]["lin"], d))
        set_bn(mods[4], sub(params["blocks"][1]["bn"], d))
        set_linear(mods[6], sub(params["final"], d))
    # hyper-net: Sequential [Linear, BN, ReLU, Dropout] * 2
    lin_mods = [m for m in ref.hyper_net if isinstance(m, torch.nn.Linear)]
    bn_mods = [m for m in ref.hyper_net if isinstance(m, torch.nn.BatchNorm1d)]
    for i in range(len(lin_mods)):
        set_linear(lin_mods[i], params["hyper"][i]["lin"])
        set_bn(bn_mods[i], params["hyper"][i]["bn"])
    a = params["adapters"][0]
    ref.u[0].data = t(a["u_down"])
    ref.v[0].data = t(a["v_down"])
    ref.u[1].data = t(a["u_up"])
    ref.v[1].data = t(a["v_up"])
    ref.b_list[0].data = t(a["b_down"])
    ref.b_list[1].data = t(a["b_up"])
    ref.gamma1.data = t(a["gamma"])
    ref.bias1.data = t(a["beta"])
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt, atol=5e-5)


def test_hamur_large_parity(rng, np_rng):
    """7-block backbone, 2 adapter cells, hypernet-BN D-fold advance
    (reference hamur.py:8-238)."""
    sparse, dense, r_sparse, r_dense = make_features()
    fcn = [32, 32, 16, 16, 16, 16, 8]
    ours = M.HamurLarge(sparse, D_NUM, fcn_dims=fcn, hyper_dims=[8], k=4)
    params, state = jax.jit(ours.init)(rng)
    # all-ones u/v init -> catastrophic cancellation (see small test);
    # randomize BOTH adapters' factors so parity runs at sane magnitudes
    ks = jax.random.split(jax.random.PRNGKey(12), 8)
    for j in range(2):
        a = params["adapters"][j]
        for i, name in enumerate(["u_down", "v_down", "u_up", "v_up"]):
            a[name] = 0.1 * jax.random.normal(ks[4 * j + i], a[name].shape)
    # the reference mutates the hyper_dims list in-place (hamur.py:77) —
    # pass a fresh copy
    ref = rm.HamurLarge(r_sparse, D_NUM, fcn_dims=fcn, hyper_dims=[8], k=4)
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    for d in range(D_NUM):
        mods = ref.layer_list[d]
        for i in range(7):  # [Linear, BN, ReLU] x 7 + final Linear
            set_linear(mods[3 * i], sub(params["blocks"][i]["lin"], d))
            set_bn(mods[3 * i + 1], sub(params["blocks"][i]["bn"], d))
        set_linear(mods[21], sub(params["final"], d))
    lin_mods = [m for m in ref.hyper_net if isinstance(m, torch.nn.Linear)]
    bn_mods = [m for m in ref.hyper_net if isinstance(m, torch.nn.BatchNorm1d)]
    for i in range(len(lin_mods)):
        set_linear(lin_mods[i], params["hyper"][i]["lin"])
        set_bn(bn_mods[i], params["hyper"][i]["bn"])
    for j in range(2):  # adapter j: u/v[2j] down, u/v[2j+1] up
        a = params["adapters"][j]
        ref.u[2 * j].data = t(a["u_down"])
        ref.v[2 * j].data = t(a["v_down"])
        ref.u[2 * j + 1].data = t(a["u_up"])
        ref.v[2 * j + 1].data = t(a["v_up"])
        ref.b_list[2 * j].data = t(a["b_down"])
        ref.b_list[2 * j + 1].data = t(a["b_up"])
    ref.gamma1.data = t(params["adapters"][0]["gamma"])
    ref.bias1.data = t(params["adapters"][0]["beta"])
    ref.gamma2.data = t(params["adapters"][1]["gamma"])
    ref.bias2.data = t(params["adapters"][1]["beta"])
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt, atol=5e-5)


def test_ple_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    kw = dict(n_level=2, n_expert_specific=2, n_expert_shared=1,
              expert_params={"dims": [16, 8]}, tower_params={"dims": [4]})
    ours = M.PLE(dense + sparse, D_NUM, **kw)
    params, state = jax.jit(ours.init)(rng)
    ref = rm.PLE(r_dense + r_sparse, D_NUM, **kw)
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    for lvl in range(2):
        cgc = ref.cgc_layers[lvl]
        lp = params["levels"][lvl]
        for d in range(D_NUM):
            for i in range(2):
                set_mlp(cgc.experts_specific[d * 2 + i],
                        sub(sub(lp["spec"], d), i))
            set_mlp(cgc.gates_specific[d], sub(lp["gates"], d))
        set_mlp(cgc.experts_shared[0], sub(lp["shared"], 0))
        if lvl < 1:
            set_mlp(cgc.gate_shared, lp["gate_shared"])
    for d in range(D_NUM):
        set_mlp(ref.towers[d], sub(params["towers"], d))
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_adaptdhm_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    ours = M.AdaptDHM(features=sparse, fcn_dims=[16, 8], cluster_num=3,
                      beta=0.9)
    params, state = jax.jit(ours.init)(rng)
    ref = rm.AdaptDHM(features=r_sparse, fcn_dims=[16, 8], cluster_num=3,
                      beta=0.9, device="cpu")
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    ref.center = t(state["center"])
    for br in range(4):  # shared + 3 clusters
        for i in range(ours.layer_num):
            ref.domain_w[br][i].data = t(params["w"][br][i])
    xj, xt = make_batch(np_rng)
    # eval mode on both: router computed from frozen centers
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)


def test_m3oe_parity(rng, np_rng):
    sparse, dense, r_sparse, r_dense = make_features()
    kw = dict(domain_num=D_NUM, fcn_dims=[16, 8, 8, 4], expert_num=2,
              exp_d=1, exp_t=1, bal_d=1, bal_t=1)
    ours = M.M3oE(features=sparse, **kw)
    params, state = jax.jit(ours.init)(rng)
    ref = rm.M3oE(features=r_sparse, device="cpu", **kw)
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    ref._weight_exp_d.deep_weights.data = t(params["w_exp_d"])
    ref._weight_bal_d.deep_weights.data = t(params["w_bal_d"])
    ref.shared_weight.data = t(params["shared_w"])
    ref.shared_bias.data = t(params["shared_b"])

    def set_mlp_n(ref_mlp_n, layers):
        lins = [m for m in ref_mlp_n.domain_specific
                if isinstance(m, torch.nn.Linear)]
        lns = [m for m in ref_mlp_n.domain_specific
               if isinstance(m, torch.nn.LayerNorm)]
        for i, layer in enumerate(layers):
            set_linear(lins[i], layer["lin"])
            set_ln(lns[i], layer["ln"])

    set_mlp_n(ref.skip_conn, params["skip"])
    set_mlp_n(ref.star_mlp, params["star_mlp"])
    for d in range(D_NUM):
        ref.slot_weight[d].data = t(params["slot_w"][d])
        ref.slot_bias[d].data = t(params["slot_b"][d])
        set_mlp_n(ref.domain_expert[d], params["domain_experts"][d])
        set_linear(ref.gate[d][0], params["gates"][d])
        tower = ref.tower[d]
        set_linear(tower[0], params["towers"][d]["l1"])
        set_ln(tower[1], params["towers"][d]["ln"])
        set_linear(tower[3], params["towers"][d]["l2"])
    for e in range(2):
        set_mlp_n(ref.expert[e], params["experts"][e])
    xj, xt = make_batch(np_rng)
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    compare(lambda xx: fwd(params, state, xx), ref, xj, xt)
