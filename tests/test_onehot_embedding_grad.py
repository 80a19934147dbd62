"""Scatter-free embedding backward (ops/embedding.mxu_gather).

On TPU, XLA lowers the scatter-add transpose of ``table[ids]`` to a
serialized per-row loop (~5.7 ms for the flagship batch vs ~0.27 ms for the
same segment-sum as one-hot matmuls on the MXU). These tests force the
one-hot mode on CPU and pin exact agreement with the autodiff scatter-add.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenario_wise_rec_tpu.core import config
from scenario_wise_rec_tpu.core.features import (DenseFeature, SequenceFeature,
                                                 SparseFeature)
from scenario_wise_rec_tpu.ops.embedding import EmbeddingCollection, mxu_gather


@pytest.fixture
def onehot_mode():
    config.set_embedding_grad_mode("onehot")
    yield
    config.set_embedding_grad_mode("auto")


def _grad(fn, *args):
    return jax.grad(lambda t: fn(t).sum())(*args)


def test_mxu_gather_multi_column_grads_match_scatter(onehot_mode):
    rng = np.random.default_rng(0)
    vocabs = [7, 11, 5]
    offsets = np.cumsum([0] + vocabs[:-1])
    partition = tuple((int(o), v) for o, v in zip(offsets, vocabs))
    table = jnp.asarray(rng.standard_normal((sum(vocabs), 3)).astype(np.float32))
    b = 16
    # duplicate ids on purpose (col 2 aliases col 0's span)
    ids = np.stack([
        rng.integers(0, vocabs[0], b),
        rng.integers(0, vocabs[1], b) + offsets[1],
        rng.integers(0, vocabs[0], b),
    ], axis=1).astype(np.int32)
    spans = (partition[0], partition[1], partition[0])
    ids = jnp.asarray(ids)

    g_onehot = _grad(lambda t: mxu_gather(t, ids, spans, partition) ** 2, table)
    g_scatter = _grad(lambda t: (t[ids]) ** 2, table)
    np.testing.assert_allclose(np.asarray(g_onehot), np.asarray(g_scatter),
                               rtol=1e-6, atol=1e-6)
    # forward identical
    np.testing.assert_array_equal(
        np.asarray(mxu_gather(table, ids, spans, partition)),
        np.asarray(table[ids]))


def test_mxu_gather_single_span_sequence_shape(onehot_mode):
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((20, 4)).astype(np.float32))
    ids = jnp.asarray(rng.integers(5, 15, (8, 6)).astype(np.int32))  # [B, L]
    span = ((5, 10),)
    partition = ((0, 5), (5, 10), (15, 5))
    g1 = _grad(lambda t: jnp.sin(mxu_gather(t, ids, span, partition)), table)
    g2 = _grad(lambda t: jnp.sin(t[ids]), table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)
    # untouched partition blocks are exactly zero
    assert np.all(np.asarray(g1[:5]) == 0) and np.all(np.asarray(g1[15:]) == 0)


def test_auto_mode_vocab_ceiling_decision(monkeypatch):
    """Under "auto" on an accelerator, features above the one-hot vocab
    ceiling fall back to the scatter transpose (the one-hot backward's FLOPs
    grow linearly in vocab); forced "onehot" ignores the ceiling."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    saved_ceiling = config.get_onehot_vocab_ceiling()
    config.set_onehot_vocab_ceiling(100_000)
    try:
        assert config.use_onehot_embedding_grad(20_000)
        assert config.use_onehot_embedding_grad(100_000)
        assert not config.use_onehot_embedding_grad(100_001)
        assert config.use_onehot_embedding_grad(None)
        config.set_embedding_grad_mode("onehot")
        assert config.use_onehot_embedding_grad(10_000_000)
        config.set_embedding_grad_mode("scatter")
        assert not config.use_onehot_embedding_grad(1)
    finally:
        config.set_embedding_grad_mode("auto")
        config.set_onehot_vocab_ceiling(saved_ceiling)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not config.use_onehot_embedding_grad(1)


def test_split_gather_groups_match_single_gather():
    """A ceiling that splits the packed features into below/above groups
    (two batched gathers in EmbeddingCollection.apply) must not change
    forward values or gradients."""
    feats = ([SparseFeature("big", vocab_size=50, embed_dim=4)]
             + [SparseFeature(f"s{i}", vocab_size=20, embed_dim=4)
                for i in range(3)])
    coll = EmbeddingCollection(feats)
    params = coll.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    b = 16
    x = {"big": jnp.asarray(rng.integers(0, 50, b).astype(np.int32))}
    x.update({f"s{i}": jnp.asarray(rng.integers(0, 20, b).astype(np.int32))
              for i in range(3)})

    def loss(p):
        return (coll.apply(p, x, feats, squeeze_dim=True) ** 2).sum()

    base_v, base_g = jax.value_and_grad(loss)(params)
    saved_ceiling = config.get_onehot_vocab_ceiling()
    config.set_onehot_vocab_ceiling(30)  # splits 'big' from the s* group
    try:
        split_v, split_g = jax.value_and_grad(loss)(params)
    finally:
        config.set_onehot_vocab_ceiling(saved_ceiling)
    assert float(base_v) == pytest.approx(float(split_v), rel=1e-6)
    np.testing.assert_allclose(np.asarray(base_g["packed"]),
                               np.asarray(split_g["packed"]),
                               rtol=1e-6, atol=1e-6)


def test_model_grads_match_between_modes():
    """Full-model gradient parity: onehot vs scatter embedding backward."""
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train.loss import bce_loss

    feats = (
        [SparseFeature(f"s{i}", vocab_size=30, embed_dim=4) for i in range(3)]
        + [SparseFeature("alias", vocab_size=30, embed_dim=4, shared_with="s0")]
        + [SequenceFeature("seq", vocab_size=30, embed_dim=4, pooling="mean",
                           shared_with="s1")]
        + [DenseFeature("d0")]
    )
    model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [8]},
                 tower_params={"dims": [4]})
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    b = 32
    x = {f"s{i}": jnp.asarray(rng.integers(0, 30, b).astype(np.int32))
         for i in range(3)}
    x["alias"] = jnp.asarray(rng.integers(0, 30, b).astype(np.int32))
    x["seq"] = jnp.asarray(rng.integers(-1, 30, (b, 5)).astype(np.int32))
    x["d0"] = jnp.asarray(rng.normal(size=b).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(rng.integers(0, 2, b).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)

    def loss_fn(p):
        probs, _ = model.apply(p, state, x, train=True,
                               rng=jax.random.PRNGKey(1))
        return bce_loss(probs, y, w)

    grads = {}
    for mode in ("scatter", "onehot"):
        config.set_embedding_grad_mode(mode)
        try:
            grads[mode] = jax.grad(loss_fn)(params)
        finally:
            config.set_embedding_grad_mode("auto")

    for a, b_ in zip(jax.tree_util.tree_leaves(grads["scatter"]),
                     jax.tree_util.tree_leaves(grads["onehot"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
