"""SequenceFeature end-to-end: pooled multi-hot features through a model +
trainer, plus shared_with aliasing and pooling-mode coverage.

Reference surface: SequenceFeature (features.py:5-46) + InputMask +
Sum/Average/ConcatPooling (layers.py:73-87,117-228).
"""

import jax
import numpy as np
import pytest

from scenario_wise_rec_tpu.core import (
    DenseFeature,
    SequenceFeature,
    SparseFeature,
)
from scenario_wise_rec_tpu.data import DataGenerator
from scenario_wise_rec_tpu.models import SharedBottom
from scenario_wise_rec_tpu.ops import EmbeddingCollection
from scenario_wise_rec_tpu.train import CTRTrainer

import jax.numpy as jnp


def test_sum_pooling_and_shared_with(rng):
    feats = [
        SparseFeature("item", vocab_size=20, embed_dim=4),
        SequenceFeature("hist", vocab_size=20, embed_dim=4, pooling="sum",
                        shared_with="item"),
    ]
    coll = EmbeddingCollection(feats)
    params = coll.init(rng)
    x = {
        "item": jnp.array([3, 5]),
        "hist": jnp.array([[1, 2, -1], [4, -1, -1]]),
    }
    out = coll.apply(params, x, feats, squeeze_dim=True)
    table = params["packed"]  # only one owned table ("item")
    assert table.shape == (20, 4)
    np.testing.assert_allclose(np.asarray(out[0, 4:]),
                               np.asarray(table[1] + table[2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1, 4:]),
                               np.asarray(table[4]), atol=1e-6)


def test_concat_pooling_flattens(rng):
    feats = [SequenceFeature("s", vocab_size=10, embed_dim=4, pooling="concat")]
    coll = EmbeddingCollection(feats)
    params = coll.init(rng)
    x = {"s": jnp.array([[1, 2], [3, 4]])}
    out = coll.apply(params, x, feats, squeeze_dim=True)
    assert out.shape == (2, 8)


def test_padding_idx_masks(rng):
    feats = [SequenceFeature("s", vocab_size=10, embed_dim=4, pooling="mean",
                             padding_idx=0)]
    coll = EmbeddingCollection(feats)
    params = coll.init(rng)
    x = {"s": jnp.array([[1, 0, 0]])}  # two padded slots
    out = coll.apply(params, x, feats, squeeze_dim=True)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(params["packed"][1]), atol=1e-6)


def test_sequence_feature_through_trainer(rng):
    n = 64
    np_rng = np.random.default_rng(0)
    x = {
        "item": np_rng.integers(0, 20, n),
        "hist": np_rng.integers(-1, 20, (n, 5)),
        "price": np_rng.normal(size=n).astype(np.float32),
        "domain_indicator": np_rng.integers(0, 2, n),
    }
    y = np_rng.integers(0, 2, n)
    feats = [
        SparseFeature("item", vocab_size=20, embed_dim=8),
        SequenceFeature("hist", vocab_size=20, embed_dim=8, pooling="mean",
                        shared_with="item"),
        DenseFeature("price"),
    ]
    model = SharedBottom(feats, 2, bottom_params={"dims": [16]},
                         tower_params={"dims": [8]})
    dg = DataGenerator(x, y)
    tr, va, te = dg.generate_dataloader(split_ratio=[0.7, 0.15], batch_size=16)
    trainer = CTRTrainer(model, "seq-e2e", n_epoch=1, model_path="/tmp")
    trainer.fit(tr, va)
    auc, ll = trainer.evaluate(model, te)
    assert np.isfinite(ll)
