"""Pallas fused kernels == the parity `apply` path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.models import MMOE
from scenario_wise_rec_tpu.ops.nn import MLP, stacked_mlp_apply, stacked_mlp_init
from scenario_wise_rec_tpu.ops.pallas import fold_stacked_mlp_eval


def test_fold_stacked_mlp_eval_matches_apply(np_rng):
    mlp = MLP(12, dims=[8, 4], output_layer=True)
    params, state = stacked_mlp_init(mlp, jax.random.PRNGKey(0), 3)
    # make running stats non-trivial
    state = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(np_rng.normal(0, 0.1, a.shape).astype(np.float32)) ** 2,
        state)
    x = jnp.asarray(np_rng.normal(size=(16, 12)).astype(np.float32))
    want, _ = stacked_mlp_apply(mlp, params, state, x, train=False)

    stages, out = fold_stacked_mlp_eval(params, state)
    h = x
    for w, b in stages:
        h = jax.nn.relu(jnp.einsum("bi,nio->nbo", h, w) + b[:, None, :]) \
            if h.ndim == 2 else jax.nn.relu(jnp.einsum("nbi,nio->nbo", h, w) + b[:, None, :])
    got = jnp.einsum("nbi,nio->nbo", h, out[0]) + out[1][:, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _mmoe_setup(batch=50, vocab=64, n_sparse=5, n_dense=2, domains=3,
                seed=0):
    r = np.random.default_rng(seed)
    feats = ([SparseFeature(f"s{i}", vocab_size=vocab, embed_dim=8)
              for i in range(n_sparse)]
             + [DenseFeature(f"d{i}") for i in range(n_dense)])
    model = MMOE(feats, domains, n_expert=2,
                 expert_params={"dims": [16, 8]}, tower_params={"dims": [4]})
    x = {f"s{i}": jnp.asarray(r.integers(0, vocab, batch)) for i in range(n_sparse)}
    x.update({f"d{i}": jnp.asarray(r.normal(size=batch).astype(np.float32))
              for i in range(n_dense)})
    x["domain_indicator"] = jnp.asarray(r.integers(0, domains, batch))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(1))
    return model, params, state, x


def test_mmoe_fused_infer_matches_apply():
    model, params, state, x = _mmoe_setup()
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = model.apply_fused_eval(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_mmoe_fused_infer_pads_ragged_batch():
    # batch not a multiple of the tile: exercises the pad+slice path
    model, params, state, x = _mmoe_setup(batch=37, seed=3)
    want, _ = model.apply(params, state, x, train=False, rng=None)
    from scenario_wise_rec_tpu.ops.pallas.folding import fold_stacked_mlp_eval
    from scenario_wise_rec_tpu.ops.pallas.mmoe_infer import mmoe_fused_infer
    from scenario_wise_rec_tpu.models.base import domain_ids

    emb = model.embedding.apply(params["embedding"], x, model.features,
                                squeeze_dim=True)
    e, _ = fold_stacked_mlp_eval(params["experts"], state["experts"])
    g, _ = fold_stacked_mlp_eval(params["gates"], state["gates"])
    t, to = fold_stacked_mlp_eval(params["towers"], state["towers"])
    got = mmoe_fused_infer(emb, domain_ids(x), e, g[0], t, to, block_rows=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sharedbottom_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import SharedBottom

    r = np.random.default_rng(11)
    feats = ([SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
              for i in range(4)] + [DenseFeature("d0")])
    model = SharedBottom(feats, domain_num=3,
                         bottom_params={"dims": [16, 8]},
                         tower_params={"dims": [4]})
    B = 45  # ragged vs block_rows to exercise padding
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, B)) for i in range(4)}
    x["d0"] = jnp.asarray(r.normal(size=B).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(r.integers(0, 3, B))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(4))
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_trainer_fused_inference_flag():
    from scenario_wise_rec_tpu.train import CTRTrainer

    model, _, _, x = _mmoe_setup(batch=32, seed=7)
    tr = CTRTrainer(model, fused_inference=True, seed=2)
    ref, _ = model.apply(tr.params, tr.state, x, train=False, rng=None)
    got = tr._eval_step(tr.params, tr.state, x, jnp.ones((32,), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_mmoe_fused_infer_under_jit():
    model, params, state, x = _mmoe_setup(batch=32, seed=5)
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def _ple_setup(batch=50, n_level=2, seed=0):
    from scenario_wise_rec_tpu.models import PLE

    r = np.random.default_rng(seed)
    feats = ([SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
              for i in range(4)] + [DenseFeature("d0")])
    model = PLE(feats, domain_num=3, n_level=n_level, n_expert_specific=2,
                n_expert_shared=2, expert_params={"dims": [16, 8]},
                tower_params={"dims": [4]})
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, batch)) for i in range(4)}
    x["d0"] = jnp.asarray(r.normal(size=batch).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(r.integers(0, 3, batch))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(6))
    # make BN running stats non-trivial so folding is actually exercised
    def perturb(path, a):
        return a + jnp.abs(jnp.asarray(
            np.random.default_rng(7).normal(0, 0.05, a.shape))).astype(a.dtype)
    state = jax.tree_util.tree_map(lambda a: perturb(None, a), state)
    return model, params, state, x


def test_ple_fused_infer_matches_apply():
    model, params, state, x = _ple_setup()
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = model.apply_fused_eval(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ple_fused_infer_single_level_ragged_batch():
    # 1 level => no shared gate; batch 37 exercises the pad+slice path
    model, params, state, x = _ple_setup(batch=37, n_level=1, seed=9)
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Gated family (EPNet / PPNet / AdaSparse) + SAR-Net fused kernels
# ---------------------------------------------------------------------------


def _gated_features(vocab=32, n_sparse=4, n_dense=2, domains=3):
    sparse = [SparseFeature(f"s{i}", vocab_size=vocab, embed_dim=8)
              for i in range(n_sparse)]
    dense = [DenseFeature(f"d{i}") for i in range(n_dense)]
    sce = [SparseFeature("domain_indicator", vocab_size=domains, embed_dim=8)]
    ids = [SparseFeature("uid", vocab_size=vocab, embed_dim=8)]
    return sparse, dense, sce, ids


def _gated_batch(batch, vocab=32, n_sparse=4, n_dense=2, domains=3, seed=0):
    r = np.random.default_rng(seed)
    x = {f"s{i}": jnp.asarray(r.integers(0, vocab, batch))
         for i in range(n_sparse)}
    x.update({f"d{i}": jnp.asarray(r.normal(size=batch).astype(np.float32))
              for i in range(n_dense)})
    x["uid"] = jnp.asarray(r.integers(0, vocab, batch))
    x["domain_indicator"] = jnp.asarray(r.integers(0, domains, batch))
    return x


def _perturb_state(state, seed=7):
    r = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda a: a + jnp.abs(jnp.asarray(
            r.normal(0, 0.05, a.shape))).astype(a.dtype), state)


def test_epnet_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import EPNet

    sparse, dense, sce, _ = _gated_features()
    model = EPNet(sce_features=sce, agn_features=sparse + dense,
                  fcn_dims=[32, 16])
    x = _gated_batch(45, seed=1)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(2))
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ppnet_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import PPNet

    sparse, dense, sce, ids = _gated_features()
    model = PPNet(id_features=ids, agn_features=sparse + dense + sce,
                  domain_num=3, fcn_dims=[32, 16])
    x = _gated_batch(50, seed=2)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(3))
    state = _perturb_state(state)
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("form", ["Binarization", "Scaling", "Fusion"])
def test_adasparse_fused_infer_matches_apply(form):
    from scenario_wise_rec_tpu.models import AdaSparse

    sparse, _, sce, _ = _gated_features()
    model = AdaSparse(sce_features=sce, agn_features=sparse, form=form,
                      mlp_params={"dims": [32, 16], "dropout": 0.2,
                                  "activation": "relu"})
    x = _gated_batch(37, seed=3)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(4))
    state = {"alpha": state["alpha"] + 0.37,
             "layers": _perturb_state(state["layers"])}
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sarnet_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import Sarnet

    sparse, dense, _, _ = _gated_features()
    model = Sarnet(sparse + dense, domain_num=3,
                   domain_shared_expert_num=4, domain_specific_expert_num=2)
    x = _gated_batch(45, seed=5)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(6))
    state = _perturb_state(state)
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_star_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import Star

    r = np.random.default_rng(17)
    feats = ([SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
              for i in range(4)] + [DenseFeature("d0")])
    model = Star(feats, 3, fcn_dims=[16, 8], aux_dims=[8])
    params, state = jax.jit(model.init)(jax.random.PRNGKey(2))
    batch = 41  # ragged vs the tile
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, batch)) for i in range(4)}
    x["d0"] = jnp.asarray(r.normal(size=batch).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(r.integers(0, 3, batch))
    # advance BN running stats so the fold is non-trivial
    _, state = model.apply(params, state, x, train=True,
                           rng=jax.random.PRNGKey(3))
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = model.apply_fused_eval(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_adaptdhm_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import AdaptDHM

    r = np.random.default_rng(19)
    feats = ([SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
              for i in range(4)] + [DenseFeature("d0")])
    model = AdaptDHM(feats, fcn_dims=[16, 8], cluster_num=3, beta=0.9)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(4))
    batch = 43
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, batch)) for i in range(4)}
    x["d0"] = jnp.asarray(r.normal(size=batch).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(r.integers(0, 3, batch))
    # advance the EMA centers so routing is non-trivial
    _, state = model.apply(params, state, x, train=True,
                           rng=jax.random.PRNGKey(5))
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = model.apply_fused_eval(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_m3oe_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import M3oE

    r = np.random.default_rng(23)
    feats = ([SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
              for i in range(4)] + [DenseFeature("d0")])
    model = M3oE(feats, 3, fcn_dims=[32, 16, 16, 8], expert_num=2,
                 exp_d=0.2, exp_t=0.2, bal_d=0.5, bal_t=0.5)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(6))
    batch = 39
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, batch)) for i in range(4)}
    x["d0"] = jnp.asarray(r.normal(size=batch).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(r.integers(0, 3, batch))
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = model.apply_fused_eval(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # and under jit (the trainer's fused _eval_step path)
    got_jit = jax.jit(model.apply_fused_eval)(params, state, x)
    np.testing.assert_allclose(np.asarray(got_jit), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("variant", ["small", "large"])
def test_hamur_fused_infer_matches_apply(variant):
    from scenario_wise_rec_tpu.models import HamurLarge, HamurSmall

    r = np.random.default_rng(29)
    feats = [SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
             for i in range(4)]
    if variant == "small":
        model = HamurSmall(feats, 3, fcn_dims=[16, 8], hyper_dims=[8], k=4)
    else:
        model = HamurLarge(feats, 3, fcn_dims=[32, 32, 16, 16, 16, 16, 8],
                           hyper_dims=[8], k=4)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(7))
    # all-ones u/v init causes catastrophic cancellation (see torch-parity
    # tests); randomize so the comparison runs at sane magnitudes
    ks = jax.random.split(jax.random.PRNGKey(8), 4 * len(params["adapters"]))
    for j, a in enumerate(params["adapters"]):
        for i, name in enumerate(["u_down", "v_down", "u_up", "v_up"]):
            a[name] = 0.1 * jax.random.normal(ks[4 * j + i], a[name].shape)
    batch = 45
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, batch)) for i in range(4)}
    x["domain_indicator"] = jnp.asarray(r.integers(0, 3, batch))
    # advance BN running stats so folding is non-trivial
    _, state = model.apply(params, state, x, train=True,
                           rng=jax.random.PRNGKey(9))
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = model.apply_fused_eval(params, state, x)
    # adapter contraction is re-associated ((h·U)·H)·V — tolerance covers
    # the float reassociation
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fold_bn_linear_eval_matches_apply(np_rng):
    from scenario_wise_rec_tpu.ops.nn import (batchnorm_apply, batchnorm_init,
                                              linear_apply, linear_init)
    from scenario_wise_rec_tpu.ops.pallas import fold_bn_linear_eval

    bn_p, bn_s = batchnorm_init(12)
    bn_s = {k: v + jnp.asarray(np_rng.normal(0, 0.1, v.shape) ** 2,
                               v.dtype) for k, v in bn_s.items()}
    lin = linear_init(jax.random.PRNGKey(0), 12, 5)
    x = jnp.asarray(np_rng.normal(size=(16, 12)).astype(np.float32))
    h, _ = batchnorm_apply(bn_p, bn_s, x, train=False)
    want = linear_apply(lin, h)
    w, b = fold_bn_linear_eval(bn_p, bn_s, lin)
    got = x @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_m2m_fused_infer_matches_apply():
    from scenario_wise_rec_tpu.models import M2M

    r = np.random.default_rng(31)
    dom = [SparseFeature("domain_indicator", vocab_size=3, embed_dim=8)]
    feats = [SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
             for i in range(4)] + dom
    model = M2M(feats, dom, domain_num=3, num_experts=4,
                expert_output_size=8)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(10))
    batch = 33  # ragged tile; transformer mixes across ALL rows either way
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, batch)) for i in range(4)}
    x["domain_indicator"] = jnp.asarray(r.integers(0, 3, batch))
    want, _ = model.apply(params, state, x, train=False, rng=None)
    got = model.apply_fused_eval(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_inference_auto_gate():
    """fused_inference='auto' consults the measured per-model win table
    (PROFILE.md SS1): gate/mixture families fuse, adapter families don't."""
    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE, HamurSmall
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = [SparseFeature("s0", vocab_size=10, embed_dim=8),
             DenseFeature("d0")]
    mmoe = MMOE(feats, 2, n_expert=2, expert_params={"dims": [8]},
                tower_params={"dims": [4]})
    hamur = HamurSmall(feats, 2, fcn_dims=[8, 4], hyper_dims=[4], k=2)
    assert CTRTrainer(mmoe, fused_inference="auto")._fused_inference is True
    assert CTRTrainer(hamur, fused_inference="auto")._fused_inference is False
    assert CTRTrainer(hamur, fused_inference=True)._fused_inference is True
