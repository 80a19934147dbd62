"""Metrics parity vs sklearn; EarlyStopper semantics; data pipeline."""

import numpy as np
import pytest

from scenario_wise_rec_tpu.data import BatchIterable, ColumnarDataset, DataGenerator
from scenario_wise_rec_tpu.train import EarlyStopper, auc_score, log_loss_score
from scenario_wise_rec_tpu.train.metrics import auc_score_device, topk_metrics


# ---------------------------------------------------------------- metrics --


def test_auc_matches_sklearn(np_rng):
    sk = pytest.importorskip("sklearn.metrics")
    for n in (10, 101, 1000):
        y = np_rng.integers(0, 2, n)
        if y.sum() in (0, n):
            y[0] = 1 - y[0]
        p = np_rng.random(n)
        # inject ties
        p[: n // 3] = np.round(p[: n // 3], 1)
        assert auc_score(y, p) == pytest.approx(
            sk.roc_auc_score(y, p), abs=1e-12
        )


def test_logloss_matches_sklearn(np_rng):
    sk = pytest.importorskip("sklearn.metrics")
    y = np_rng.integers(0, 2, 500)
    p = np.clip(np_rng.random(500), 1e-9, 1 - 1e-9)
    assert log_loss_score(y, p) == pytest.approx(sk.log_loss(y, p), rel=1e-9)


def test_auc_device_matches_host(np_rng):
    import jax.numpy as jnp

    y = np_rng.integers(0, 2, 400)
    y[0], y[1] = 0, 1
    p = np.round(np_rng.random(400), 2).astype(np.float32)  # many ties
    host = auc_score(y, p)
    dev = float(auc_score_device(jnp.asarray(y), jnp.asarray(p)))
    assert dev == pytest.approx(host, abs=1e-5)


def test_auc_single_class_raises():
    with pytest.raises(ValueError):
        auc_score(np.ones(5), np.random.rand(5))


def test_topk_metrics():
    y_true = {0: [1, 2], 1: [3]}
    y_pred = {0: [1, 9, 2], 1: [4, 5, 6]}
    res = topk_metrics(y_true, y_pred, topKs=(3,))
    assert "NDCG" in res and "Recall" in res
    assert res["Hit"][0].endswith("0.5000")  # user0 hit, user1 miss


# ------------------------------------------------------------------- loss --


def test_bce_loss_saturated_probs_finite_forward_and_grad():
    """f32 sigmoid underflows to exactly 0.0/1.0 below/above logit ~±104;
    torch's BCELoss clamps each log term at -100 and stays finite. Our
    forward must match that clamp and the gradient must be finite (a bare
    maximum(log(p), -100) has NaN grad at p == 0: 0 * inf in the VJP)."""
    import jax
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.train.loss import bce_loss

    p = jnp.array([0.0, 1.0, 0.5, 1e-30, 1.0 - 1e-7], jnp.float32)
    y = jnp.array([1.0, 0.0, 1.0, 1.0, 0.0], jnp.float32)

    loss = bce_loss(p, y)
    # rows 0/1 contribute the torch clamp value 100, row 2 log(2)
    assert np.isfinite(float(loss))
    expected = np.mean([100.0, 100.0, np.log(2.0),
                        -np.log(1e-30),
                        -np.log1p(-float(jnp.float32(1.0 - 1e-7)))])
    assert float(loss) == pytest.approx(expected, rel=1e-5)

    g = jax.grad(lambda q: bce_loss(q, y))(p)
    assert np.all(np.isfinite(np.asarray(g))), np.asarray(g)
    # clamped region (p == 0 with y == 1): loss is constant -100 -> grad 0
    assert float(g[0]) == 0.0 and float(g[1]) == 0.0
    # interior: d/dp of -log(p) = -1/p
    assert float(g[2]) == pytest.approx(-1.0 / 0.5 / len(p), rel=1e-5)


# ----------------------------------------------------------- early stopper --


def test_early_stopper_reference_semantics():
    # reference callback.py:24-33: stop after `patience` stale epochs
    # (with its off-by-one: trial_counter+1 < patience)
    es = EarlyStopper(patience=2)
    assert not es.stop_training(0.7, {"w": 1})
    assert not es.stop_training(0.6, {"w": 2})  # 1st stale
    assert es.stop_training(0.5, {"w": 3})  # 2nd stale -> stop
    assert es.best_auc == 0.7 and es.best_weights == {"w": 1}

    es = EarlyStopper(patience=2)
    es.stop_training(0.7, {})
    es.stop_training(0.6, {})
    assert not es.stop_training(0.8, {})  # improvement resets counter
    assert es.best_auc == 0.8


# ------------------------------------------------------------------- data --


def test_batch_padding_and_weights():
    ds = ColumnarDataset({"a": np.arange(10)}, np.arange(10))
    it = BatchIterable(ds, batch_size=4, shuffle=False)
    batches = list(it)
    assert len(batches) == 3
    x, y, w = batches[-1]
    assert x["a"].shape == (4,) and w.tolist() == [1, 1, 0, 0]
    # padding repeats a real row (row 8)
    assert x["a"][2] == x["a"][0]


def test_shuffle_reproducible_and_varies_per_epoch():
    ds = ColumnarDataset({"a": np.arange(100)}, np.arange(100))
    it1 = BatchIterable(ds, batch_size=100, shuffle=True, seed=3)
    e1 = next(iter(it1))[0]["a"].copy()
    e2 = next(iter(it1))[0]["a"].copy()
    assert not np.array_equal(e1, e2)  # new permutation each epoch
    it2 = BatchIterable(ds, batch_size=100, shuffle=True, seed=3)
    np.testing.assert_array_equal(e1, next(iter(it2))[0]["a"])


def test_datagen_split_ratio():
    x = {"a": np.arange(100), "domain_indicator": np.zeros(100, int)}
    dg = DataGenerator(x, np.arange(100) % 2)
    tr, va, te = dg.generate_dataloader(split_ratio=[0.8, 0.1], batch_size=16)
    assert len(tr.dataset) == 80 and len(va.dataset) == 10
    assert len(te.dataset) == 10
    # splits are disjoint
    all_a = np.concatenate([tr.dataset.x["a"], va.dataset.x["a"],
                            te.dataset.x["a"]])
    assert len(np.unique(all_a)) == 100


def test_datagen_explicit_splits():
    dg = DataGenerator({"a": np.arange(10)}, np.zeros(10))
    tr, va, te = dg.generate_dataloader(
        x_val={"a": np.arange(4)}, y_val=np.zeros(4),
        x_test={"a": np.arange(6)}, y_test=np.zeros(6), batch_size=4,
    )
    assert len(tr.dataset) == 10 and len(va.dataset) == 4 and len(te.dataset) == 6


def test_auc_host_vectorized_ties_matches_sklearn(np_rng):
    """Quantized scores -> massive tie groups: the vectorized np.unique
    tie-rank must equal sklearn exactly (the old Python tie loop was
    O(#groups))."""
    from sklearn.metrics import roc_auc_score

    y = np_rng.integers(0, 2, 5000).astype(np.float64)
    y[0], y[1] = 0, 1
    p = np.round(np_rng.random(5000), 2)  # ~100 distinct values
    assert auc_score(y, p) == pytest.approx(roc_auc_score(y, p), abs=1e-12)


def test_auc_device_masked_matches_host_subset(np_rng):
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.train.metrics import log_loss_device

    n = 2000
    y = np_rng.integers(0, 2, n).astype(np.float32)
    # quantized (ties) but unsaturated: the device log loss clips at the
    # f32-representable 1e-7, not sklearn's sub-f32 1e-15
    p = (np.round(np_rng.random(n).astype(np.float32), 2) * 0.98
         + 0.01).astype(np.float32)
    m = np_rng.integers(0, 2, n).astype(bool)
    y[np.flatnonzero(m)[:2]] = [0, 1]  # both classes in the subset
    host = auc_score(y[m], p[m])
    dev = float(auc_score_device(jnp.asarray(y), jnp.asarray(p),
                                 jnp.asarray(m)))
    assert dev == pytest.approx(host, abs=5e-5)
    host_ll = log_loss_score(y[m], p[m])
    dev_ll = float(log_loss_device(jnp.asarray(y), jnp.asarray(p),
                                   jnp.asarray(m)))
    assert dev_ll == pytest.approx(host_ll, abs=5e-6)


def test_trainer_evaluate_on_device_matches_host(np_rng):
    import jax.numpy as jnp  # noqa: F401

    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    n = 300
    x = {"s0": np_rng.integers(0, 20, n).astype(np.int32),
         "d0": np_rng.normal(size=n).astype(np.float32),
         "domain_indicator": np_rng.integers(0, 3, n).astype(np.int32)}
    y = np_rng.integers(0, 2, n).astype(np.float32)
    ds = ColumnarDataset(x, y)
    dl = BatchIterable(ds, 64)  # last batch padded -> weight mask exercised
    feats = [SparseFeature("s0", vocab_size=20, embed_dim=8),
             DenseFeature("d0")]
    model = MMOE(feats, 3, n_expert=2, expert_params={"dims": [8]},
                 tower_params={"dims": [4]})
    tr = CTRTrainer(model, seed=0)
    auc_h, ll_h = tr.evaluate(model, dl)
    auc_d, ll_d = tr.evaluate(model, dl, on_device=True)
    assert auc_d == pytest.approx(auc_h, abs=5e-5)
    assert ll_d == pytest.approx(ll_h, abs=5e-6)
    h = tr.evaluate_multi_domain_loss(model, dl, 3)
    d = tr.evaluate_multi_domain_loss(model, dl, 3, on_device=True)
    for a, b in zip(h[1] + [h[3]], d[1] + [d[3]]):
        assert b == pytest.approx(a, abs=5e-5)
    for a, b in zip(h[0] + [h[2]], d[0] + [d[2]]):
        assert b == pytest.approx(a, abs=5e-6)
