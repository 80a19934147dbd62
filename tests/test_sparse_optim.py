"""Sparse/lazy embedding optimizer: exactness vs dense Adam on touched rows.

The opt-in fast path (CTRTrainer(sparse_embedding_updates=True)) must update
touched rows *identically* to the dense torch-Adam chain and leave untouched
rows (params AND moments) bit-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scenario_wise_rec_tpu.core import DenseFeature, SequenceFeature, SparseFeature
from scenario_wise_rec_tpu.ops.embedding import EmbeddingCollection
from scenario_wise_rec_tpu.train.optim import (
    adam,
    sparse_adam_init,
    sparse_adam_rows_update,
)


# ------------------------------------------------------------ touched_ids --


def test_touched_ids_covers_plain_seq_and_aliases():
    feats = [
        SparseFeature("a", vocab_size=10, embed_dim=4),
        SparseFeature("b", vocab_size=20, embed_dim=4),
        SparseFeature("b2", vocab_size=20, embed_dim=4, shared_with="b"),
        SequenceFeature("s", vocab_size=10, embed_dim=4, pooling="mean",
                        shared_with="a"),
        DenseFeature("d"),
    ]
    col = EmbeddingCollection(feats)
    x = {
        "a": jnp.array([1, 2]),
        "b": jnp.array([0, 19]),
        "b2": jnp.array([5, 5]),
        "s": jnp.array([[0, 3], [9, 9]]),
        "d": jnp.array([0.0, 1.0]),
    }
    ids = np.asarray(col.touched_ids(x))
    off_a, off_b = col.offsets["a"], col.offsets["b"]
    expect = sorted(
        [1 + off_a, 2 + off_a, 0 + off_b, 19 + off_b, 5 + off_b, 5 + off_b,
         0 + off_a, 3 + off_a, 9 + off_a, 9 + off_a]
    )
    assert sorted(ids.tolist()) == expect


# ------------------------------------------------- rows update vs dense --


def _dense_adam_reference(table, grads, steps_state=None, lr=1e-3, wd=1e-5):
    opt = adam(lr=lr, weight_decay=wd)
    state = opt.init(table) if steps_state is None else steps_state
    updates, state = opt.update(grads, state, table)
    return optax.apply_updates(table, updates), state


def test_sparse_rows_update_matches_dense_when_all_touched(np_rng):
    V, D = 32, 8
    table = jnp.asarray(np_rng.normal(size=(V, D)).astype(np.float32))
    g = jnp.asarray(np_rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.arange(V, dtype=jnp.int32)

    sstate = sparse_adam_init(table)
    dense_t, dense_s = _dense_adam_reference(table, g)
    for _ in range(3):  # multi-step: bias correction must track the step
        sparse_t, sstate = sparse_adam_rows_update(
            table, sstate, g, ids, lr=1e-3, weight_decay=1e-5
        )
        np.testing.assert_allclose(np.asarray(sparse_t), np.asarray(dense_t),
                                   rtol=1e-6, atol=1e-7)
        table, g = sparse_t, g * 0.5
        dense_t, dense_s = _dense_adam_reference(table, g, dense_s)


def test_sparse_rows_update_duplicates_and_untouched(np_rng):
    V, D = 16, 4
    table = jnp.asarray(np_rng.normal(size=(V, D)).astype(np.float32))
    g = jnp.asarray(np_rng.normal(size=(V, D)).astype(np.float32))
    sstate = sparse_adam_init(table)

    ids_dup = jnp.array([3, 7, 3, 3, 7, 12], jnp.int32)
    ids_uni = jnp.array([3, 7, 12], jnp.int32)
    t_dup, s_dup = sparse_adam_rows_update(table, sstate, g, ids_dup)
    t_uni, s_uni = sparse_adam_rows_update(table, sstate, g, ids_uni)
    np.testing.assert_array_equal(np.asarray(t_dup), np.asarray(t_uni))
    np.testing.assert_array_equal(np.asarray(s_dup["mu"]), np.asarray(s_uni["mu"]))

    # untouched rows: bit-identical params and zero moments
    untouched = np.setdiff1d(np.arange(V), [3, 7, 12])
    np.testing.assert_array_equal(
        np.asarray(t_dup)[untouched], np.asarray(table)[untouched]
    )
    assert np.all(np.asarray(s_dup["mu"])[untouched] == 0)

    # touched rows match the dense chain's rows exactly
    dense_t, _ = _dense_adam_reference(table, g)
    np.testing.assert_allclose(
        np.asarray(t_dup)[[3, 7, 12]], np.asarray(dense_t)[[3, 7, 12]],
        rtol=1e-6, atol=1e-7,
    )


def test_sparse_rows_update_empty_ids(np_rng):
    table = jnp.asarray(np_rng.normal(size=(8, 4)).astype(np.float32))
    sstate = sparse_adam_init(table)
    t, s = sparse_adam_rows_update(
        table, sstate, jnp.zeros_like(table), jnp.zeros((0,), jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(t), np.asarray(table))
    assert int(s["step"]) == 1


# ----------------------------------------------------------- trainer e2e --


def _tiny_data(n=64, vocab=12, seed=0):
    r = np.random.default_rng(seed)
    feats = [SparseFeature(f"s{i}", vocab_size=vocab, embed_dim=4)
             for i in range(3)] + [DenseFeature("d0")]
    x = {f"s{i}": r.integers(0, vocab, n) for i in range(3)}
    x["d0"] = r.normal(size=n).astype(np.float32)
    x["domain_indicator"] = r.integers(0, 2, n)
    y = r.integers(0, 2, n).astype(np.float32)
    return feats, x, y


def test_trainer_sparse_mode_matches_dense_step():
    """One train step: sparse mode == dense mode on every touched row, and the
    only divergence is the (documented) missing weight decay on untouched
    rows."""
    from scenario_wise_rec_tpu.models import SharedBottom
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats, x, y = _tiny_data(n=24, vocab=64, seed=1)
    n = len(y)
    w = np.ones(n, np.float32)

    def make(sparse):
        model = SharedBottom(feats, domain_num=2,
                             bottom_params={"dims": [8]},
                             tower_params={"dims": [4]})
        tr = CTRTrainer(model, n_epoch=1, seed=7,
                        sparse_embedding_updates=sparse,
                        sparse_update_impl="winner")
        return model, tr

    _, tr_d = make(False)
    _, tr_s = make(True)
    # identical init (same seed); snapshot before the step (buffers donated)
    init_packed = np.array(tr_d.params["embedding"]["packed"])
    np.testing.assert_array_equal(
        init_packed, np.asarray(tr_s.params["embedding"]["packed"])
    )
    xb = {k: jnp.asarray(v) for k, v in x.items()}
    yb, wb = jnp.asarray(y), jnp.asarray(w)
    rng = jax.random.PRNGKey(3)
    touched = np.unique(np.asarray(tr_s.model.embedding.touched_ids(xb)))
    pd, od, sd, ld = tr_d._train_step(tr_d.params, tr_d.opt_state, tr_d.state,
                                      xb, yb, wb, rng)
    ps, os_, ss, ls = tr_s._train_step(tr_s.params, tr_s.opt_state, tr_s.state,
                                       xb, yb, wb, rng)
    assert float(ld) == pytest.approx(float(ls), abs=1e-7)
    # non-embedding params identical
    np.testing.assert_allclose(
        np.asarray(pd["bottom"]["layers"][0]["lin"]["w"]),
        np.asarray(ps["bottom"]["layers"][0]["lin"]["w"]), rtol=1e-6)
    dense_packed = np.asarray(pd["embedding"]["packed"])
    sparse_packed = np.asarray(ps["embedding"]["packed"])
    np.testing.assert_allclose(sparse_packed[touched], dense_packed[touched],
                               rtol=1e-5, atol=1e-7)
    # untouched rows: sparse leaves them bit-identical to init; dense applies
    # only the wd decay there (the documented deviation)
    V = dense_packed.shape[0]
    untouched = np.setdiff1d(np.arange(V), touched)
    np.testing.assert_array_equal(sparse_packed[untouched],
                                  init_packed[untouched])
    # dense moved untouched rows by ~lr (Adam normalizes the tiny wd-only
    # gradient to ~sign(p) on the first step) — bounded by lr
    assert np.max(np.abs(sparse_packed[untouched] - dense_packed[untouched])) < 2e-3


def test_trainer_sparse_mode_fit_runs():
    from scenario_wise_rec_tpu.data import DataGenerator
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats, x, y = _tiny_data(n=128)
    dg = DataGenerator(x, y)
    train_dl, val_dl, test_dl = dg.generate_dataloader(
        split_ratio=[0.7, 0.15], batch_size=32
    )
    model = MMOE(feats, domain_num=2, n_expert=2,
                 expert_params={"dims": [8]}, tower_params={"dims": [4]})
    tr = CTRTrainer(model, n_epoch=2, sparse_embedding_updates=True,
                    model_path="/tmp")
    tr.fit(train_dl, val_dl)
    auc, logloss = tr.evaluate(model, test_dl)
    assert 0.0 <= auc <= 1.0 and np.isfinite(logloss)
