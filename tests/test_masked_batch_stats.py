"""Padding-mask semantics: padded batch + w mask == unpadded batch.

The static-shape loader pads ragged batches with weight-0 rows
(data/dataset.py). The reference never sees those rows, so every cross-row
computation — BatchNorm train statistics, STAR/HAMUR batch-stat domain
norms, AdaptDHM's EMA center refinement, M2M's cross-example attention —
must exclude them (``w`` threaded through ``Model.apply``). These tests pin
that a batch padded from n to N with ``w`` produces, on the real rows,
exactly what the unpadded n-row batch produces (forward probs, updated BN
running stats / EMA centers, and one full optimizer step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.models import (MMOE, AdaptDHM, HamurSmall, M2M,
                                          Sarnet, Star)
from scenario_wise_rec_tpu.train import CTRTrainer
from scenario_wise_rec_tpu.train.loss import bce_loss

N_REAL, N_PAD = 13, 32


def _feats(n_sparse=4, dense=True):
    fs = [SparseFeature(f"s{i}", vocab_size=32, embed_dim=8)
          for i in range(n_sparse)]
    if dense:
        fs.append(DenseFeature("d0"))
    return fs


def _batch(r, n, n_sparse=4, dense=True, domains=3):
    x = {f"s{i}": jnp.asarray(r.integers(0, 32, n)) for i in range(n_sparse)}
    if dense:
        x["d0"] = jnp.asarray(r.normal(size=n).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(r.integers(0, domains, n))
    return x


def _pad(x, n_pad):
    return {k: jnp.concatenate(
        [v, jnp.zeros((n_pad - v.shape[0],) + v.shape[1:], v.dtype)])
        for k, v in x.items()}


def _models():
    feats = _feats()
    dom = [SparseFeature("domain_indicator", vocab_size=3, embed_dim=8)]
    return {
        "mmoe": MMOE(feats, 3, n_expert=2, expert_params={"dims": [16, 8]},
                     tower_params={"dims": [4]}),
        "star": Star(feats, 3, fcn_dims=[16, 8], aux_dims=[8]),
        "hamur": HamurSmall(_feats(dense=False), 3, fcn_dims=[16, 8],
                            hyper_dims=[8], k=4),
        "adaptdhm": AdaptDHM(feats, fcn_dims=[16, 8], cluster_num=3,
                             beta=0.9),
        "m2m": M2M(_feats(dense=False) + dom, dom, domain_num=3,
                   num_experts=2, expert_output_size=8,
                   # dropout off: identical keys draw different masks for
                   # [13,13] vs [32,32] attention shapes, which would make
                   # padded/unpadded runs incomparable for reasons unrelated
                   # to the padding-mask semantics under test
                   transformer_dims={"num_encoder_layers": 2,
                                     "num_decoder_layers": 2,
                                     "dim_feedforward": 16, "dropout": 0.0}),
        "sarnet": Sarnet(feats, 3, domain_shared_expert_num=2,
                         domain_specific_expert_num=1),
    }


def _randomize_adapters(params, seed=8):
    """All-ones u/v adapter init -> catastrophic cancellation where fp
    reduction order dominates (see test_torch_parity hamur notes); randomize
    so padded/unpadded comparisons run at sane magnitudes."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 4 * len(params["adapters"]))
    for j, a in enumerate(params["adapters"]):
        for i, nm in enumerate(["u_down", "v_down", "u_up", "v_up"]):
            a[nm] = 0.1 * jax.random.normal(ks[4 * j + i], a[nm].shape)


@pytest.mark.parametrize("name", sorted(_models()))
def test_padded_train_forward_matches_unpadded(name):
    model = _models()[name]
    r = np.random.default_rng(3)
    x = _batch(r, N_REAL, dense=name not in ("hamur", "m2m"))
    if name == "hamur":
        x.pop("d0", None)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    if name == "hamur":
        _randomize_adapters(params)
    # rng=None disables dropout so padded/unpadded runs are comparable
    # deterministically; train=True still exercises the batch statistics
    probs, new_state = model.apply(params, state, x, train=True, rng=None)

    xp = _pad(x, N_PAD)
    w = jnp.concatenate([jnp.ones((N_REAL,)), jnp.zeros((N_PAD - N_REAL,))])
    probs_p, new_state_p = model.apply(params, state, xp, train=True,
                                       rng=None, w=w)
    # hamur/m2m chain many normalizations (batch-stat norms, LayerNorm,
    # per-row generated weights) that amplify the fp reduction-order
    # difference between masked-sum-over-32 and mean-over-13 to O(1e-4) on
    # the probabilities; a semantic mask failure would be O(0.1) here
    tol = dict(rtol=1e-3, atol=5e-4) if name in ("hamur", "m2m") \
        else dict(rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(probs_p[:N_REAL]),
                               np.asarray(probs), **tol)
    # updated cross-row state (BN running stats / EMA centers) must match
    for a, b in zip(jax.tree_util.tree_leaves(new_state),
                    jax.tree_util.tree_leaves(new_state_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)


@pytest.mark.parametrize("name", ["mmoe", "star"])
def test_padded_train_step_grads_match_unpadded(name):
    """Full loss gradient: padded rows contribute nothing (loss weight 0 AND
    masked batch stats), so grads equal the unpadded batch's exactly."""
    model = _models()[name]
    r = np.random.default_rng(5)
    x = _batch(r, N_REAL)
    y = jnp.asarray(r.integers(0, 2, N_REAL).astype(np.float32))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(1))

    def grads_of(xb, yb, wb):
        def loss_fn(p):
            probs, _ = model.apply(p, state, xb, train=True, rng=None, w=wb)
            return bce_loss(probs, yb, wb)
        return jax.grad(loss_fn)(params)

    g1 = grads_of(x, y, jnp.ones((N_REAL,)))
    xp = _pad(x, N_PAD)
    yp = jnp.concatenate([y, jnp.zeros((N_PAD - N_REAL,))])
    wp = jnp.concatenate([jnp.ones((N_REAL,)), jnp.zeros((N_PAD - N_REAL,))])
    g2 = grads_of(xp, yp, wp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["star", "hamur", "m2m", "adaptdhm"])
def test_fused_eval_masks_padding(name):
    """apply_fused_eval(w=mask) on a padded batch == apply on the unpadded
    batch (the batch-stat reductions outside the kernels honor the mask)."""
    model = _models()[name]
    r = np.random.default_rng(7)
    x = _batch(r, N_REAL, dense=name not in ("hamur", "m2m"))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(2))
    if name == "hamur":
        _randomize_adapters(params)
    want, _ = model.apply(params, state, x, train=False, rng=None)
    xp = _pad(x, N_PAD)
    w = jnp.concatenate([jnp.ones((N_REAL,)), jnp.zeros((N_PAD - N_REAL,))])
    got = model.apply_fused_eval(params, state, xp, w=w)
    tol = dict(rtol=1e-3, atol=5e-4) if name in ("hamur", "m2m") \
        else dict(rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[:N_REAL]), np.asarray(want),
                               **tol)


def test_trainer_passes_mask_end_to_end():
    """CTRTrainer's jitted step threads the loader's weight mask into the
    model: one step on a padded batch == one step on the raw batch."""
    model = _models()["star"]
    r = np.random.default_rng(11)
    x = _batch(r, N_REAL)
    y = jnp.asarray(r.integers(0, 2, N_REAL).astype(np.float32))
    tr = CTRTrainer(model, seed=5)
    p1, o1, s1, loss1 = tr._train_step(
        tr.params, tr.opt_state, tr.state, x, y, jnp.ones((N_REAL,)),
        jax.random.PRNGKey(0))
    xp = _pad(x, N_PAD)
    yp = jnp.concatenate([y, jnp.zeros((N_PAD - N_REAL,))])
    wp = jnp.concatenate([jnp.ones((N_REAL,)), jnp.zeros((N_PAD - N_REAL,))])
    tr2 = CTRTrainer(model, seed=5)
    p2, o2, s2, loss2 = tr2._train_step(
        tr2.params, tr2.opt_state, tr2.state, xp, yp, wp,
        jax.random.PRNGKey(0))
    assert float(loss1) == pytest.approx(float(loss2), abs=1e-6)
    # post-Adam params differ at O(lr) where near-zero grads flip sign under
    # fp reduction-order noise (see test_parallel's grads-only comparison);
    # the SECOND step's loss — computed on the updated params — is the tight
    # functional check that the two trajectories agree.
    _, _, _, l1b = tr._train_step(p1, o1, s1, x, y, jnp.ones((N_REAL,)),
                                  jax.random.PRNGKey(1))
    _, _, _, l2b = tr2._train_step(p2, o2, s2, xp, yp, wp,
                                   jax.random.PRNGKey(1))
    assert float(l1b) == pytest.approx(float(l2b), abs=5e-4)
