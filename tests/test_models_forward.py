"""Every model: init + forward + one gradient step on synthetic data.

Checks the full 12-model surface (SURVEY §2.2): output shape/range, state
threading, and that a BCE gradient step runs (i.e. everything is jittable
and differentiable end-to-end).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.models import (
    M2M,
    MMOE,
    PLE,
    AdaptDHM,
    AdaSparse,
    EPNet,
    HamurLarge,
    HamurSmall,
    M3oE,
    PPNet,
    Sarnet,
    SharedBottom,
    Star,
    get_model,
)
from scenario_wise_rec_tpu.train.loss import bce_loss

B, D_NUM = 24, 3
N_SPARSE, N_DENSE = 4, 2
VOCAB = 12


def _features():
    sparse = [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=16)
              for i in range(N_SPARSE)]
    dense = [DenseFeature(f"d{i}") for i in range(N_DENSE)]
    sce = [SparseFeature("domain_indicator", vocab_size=D_NUM, embed_dim=16)]
    ids = [SparseFeature("uid", vocab_size=VOCAB, embed_dim=16)]
    return sparse, dense, sce, ids


def _batch(np_rng):
    x = {f"s{i}": np_rng.integers(0, VOCAB, B) for i in range(N_SPARSE)}
    x.update({f"d{i}": np_rng.normal(size=B).astype(np.float32)
              for i in range(N_DENSE)})
    x["uid"] = np_rng.integers(0, VOCAB, B)
    x["domain_indicator"] = np_rng.integers(0, D_NUM, B)
    y = np_rng.integers(0, 2, B).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in x.items()}, jnp.asarray(y)


def _all_models():
    sparse, dense, sce, ids = _features()
    feats = sparse + dense
    return {
        "sharedbottom": SharedBottom(feats, D_NUM, bottom_params={"dims": [32]},
                                     tower_params={"dims": [16, 8]}),
        "mmoe": MMOE(feats, D_NUM, n_expert=3, expert_params={"dims": [32, 16]},
                     tower_params={"dims": [8]}),
        "ple": PLE(feats, D_NUM, n_level=2, n_expert_specific=2,
                   n_expert_shared=1, expert_params={"dims": [32, 16]},
                   tower_params={"dims": [8]}),
        "star": Star(feats, D_NUM, fcn_dims=[32, 16], aux_dims=[16]),
        "sarnet": Sarnet(sparse, D_NUM, domain_shared_expert_num=4,
                         domain_specific_expert_num=2),
        "epnet": EPNet(sce_features=sce, agn_features=sparse + dense,
                       fcn_dims=[32, 16]),
        "ppnet": PPNet(id_features=ids, agn_features=sparse + dense + sce,
                       domain_num=D_NUM, fcn_dims=[32, 16]),
        "adasparse": AdaSparse(sce_features=sce, agn_features=sparse,
                               form="Fusion",
                               mlp_params={"dims": [32, 16], "dropout": 0.2,
                                           "activation": "relu"}),
        "m2m": M2M(sparse + sce, sce, D_NUM, num_experts=4,
                   expert_output_size=16),
        "adaptdhm": AdaptDHM(features=sparse + sce, fcn_dims=[32, 16],
                             cluster_num=3, beta=0.9),
        "hamur": HamurLarge(feats, D_NUM, fcn_dims=[32, 16, 16, 16, 16, 16, 8],
                            hyper_dims=[16], k=5),
        "hamur_small": HamurSmall(sparse, D_NUM, fcn_dims=[32, 16],
                                  hyper_dims=[16], k=5),
        "m3oe": M3oE(features=feats, domain_num=D_NUM,
                     fcn_dims=[32, 16, 16, 8], expert_num=4, exp_d=1, exp_t=1,
                     bal_d=1, bal_t=1),
    }


MODELS = _all_models()


@pytest.mark.parametrize("name", sorted(MODELS))
def test_forward_and_grad_step(name, rng, np_rng):
    model = MODELS[name]
    x, y = _batch(np_rng)
    params, state = jax.jit(model.init)(rng)

    # eval forward
    probs, state_out = jax.jit(
        lambda p_, s_, x_: model.apply(p_, s_, x_, train=False, rng=None)
    )(params, state, x)
    assert probs.shape == (B,)
    p = np.asarray(probs)
    assert np.all(p >= 0) and np.all(p <= 1) and np.all(np.isfinite(p))

    # train forward + grad
    def loss_fn(p_):
        out, new_state = model.apply(p_, state, x, train=True,
                                     rng=jax.random.PRNGKey(1))
        return bce_loss(out, y), new_state

    (loss, new_state), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    # state pytree structure is stable (jit requirement)
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(new_state))


def test_stop_gradient_epnet(rng, np_rng):
    """EPNet detaches the agnostic embedding inside the gate input
    (epnet.py:28): gate-path gradients must not reach the agn embedding
    through the gate branch. With the (linear-head) quirk, the agn embedding
    still gets gradients through the main path."""
    sparse, dense, sce, _ = _features()
    model = EPNet(sce_features=sce, agn_features=sparse, fcn_dims=[8])
    x, y = _batch(np_rng)
    params, state = jax.jit(model.init)(rng)

    def loss_fn(p_):
        out, _ = model.apply(p_, state, x, train=True,
                             rng=jax.random.PRNGKey(1))
        return bce_loss(out, y)

    grads = jax.jit(jax.grad(loss_fn))(params)
    g_sce = grads["sce_embedding"]["packed"]
    assert float(jnp.sum(jnp.abs(g_sce))) > 0  # scenario emb learns via gate


def test_registry_aliases():
    assert get_model("Sharedbottom") is SharedBottom
    assert get_model("SharedBottom") is SharedBottom
    assert get_model("hamur") is HamurLarge
    with pytest.raises(KeyError):
        get_model("nope")


def test_adaptdhm_center_updates_train_only(rng, np_rng):
    sparse, _, sce, _ = _features()
    model = AdaptDHM(features=sparse + sce, fcn_dims=[16], cluster_num=3,
                     beta=0.9)
    x, y = _batch(np_rng)
    params, state = jax.jit(model.init)(rng)
    _, s_eval = jax.jit(lambda p, s, xx: model.apply(p, s, xx, train=False))(params, state, x)
    np.testing.assert_array_equal(np.asarray(s_eval["center"]),
                                  np.asarray(state["center"]))
    _, s_train = jax.jit(lambda p, s, xx, k: model.apply(p, s, xx, train=True, rng=k))(
        params, state, x, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(s_train["center"]),
                           np.asarray(state["center"]))
    # centers stay L2-normalized
    norms = np.linalg.norm(np.asarray(s_train["center"]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_adasparse_alpha_anneals(rng, np_rng):
    sparse, _, sce, _ = _features()
    model = AdaSparse(sce_features=sce, agn_features=sparse,
                      mlp_params={"dims": [16], "dropout": 0.0,
                                  "activation": "relu"}, delta_alpha=1e-4)
    x, y = _batch(np_rng)
    params, state = jax.jit(model.init)(rng)
    tr = jax.jit(lambda p, s, xx, k: model.apply(p, s, xx, train=True, rng=k))
    _, s1 = tr(params, state, x, jax.random.PRNGKey(0))
    assert float(s1["alpha"]) == pytest.approx(1.0 + 1e-4)
    _, s2 = jax.jit(lambda p, s, xx: model.apply(p, s, xx, train=False))(params, s1, x)
    assert float(s2["alpha"]) == pytest.approx(float(s1["alpha"]))
