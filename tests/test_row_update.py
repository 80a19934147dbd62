"""Pallas row-update path: scatter kernel, occurrence segsum, sparse-Adam
equivalence (occurrence impl == winner impl == dense Adam on touched rows).

The kernels run in interpreter mode here (CPU); the real-chip numerics
artifact is PROFILE.md (scripts/bench_row_scatter.py + bench.py A/B runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenario_wise_rec_tpu.core import DenseFeature, SequenceFeature, SparseFeature
from scenario_wise_rec_tpu.ops.pallas.row_update import (
    occurrence_segsum, occurrence_segsum_ref, scatter_rows)
from scenario_wise_rec_tpu.train.optim import (
    sparse_adam_init, sparse_adam_occurrence_init,
    sparse_adam_occurrence_update, sparse_adam_rowgrads_update)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def test_occurrence_segsum_kernel_matches_ref():
    rng = np.random.default_rng(0)
    f, n, d = 3, 64, 16
    ids = jnp.asarray(rng.integers(0, 10, (f, n)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(f, n, d)).astype(np.float32))
    ref = occurrence_segsum_ref(ids, g)
    out = occurrence_segsum(ids, g, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_occurrence_segsum_kernel_ragged_tile():
    """n not divisible by the tile: sentinel padding must not leak."""
    rng = np.random.default_rng(1)
    f, n, d = 2, 37, 8
    ids = jnp.asarray(rng.integers(0, 5, (f, n)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(f, n, d)).astype(np.float32))
    ref = occurrence_segsum_ref(ids, g)
    out = occurrence_segsum(ids, g, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_segsum_duplicates_get_identical_sums():
    ids = jnp.asarray([[3, 1, 3, 3, 2, 1]], dtype=jnp.int32)
    g = jnp.arange(6 * 4, dtype=jnp.float32).reshape(1, 6, 4)
    out = np.asarray(occurrence_segsum(ids, g, tile=2, interpret=True))[0]
    np.testing.assert_array_equal(out[0], out[2])
    np.testing.assert_array_equal(out[0], out[3])
    np.testing.assert_array_equal(out[1], out[5])
    expected_3 = np.asarray(g)[0, [0, 2, 3]].sum(0)
    np.testing.assert_allclose(out[0], expected_3, rtol=1e-6)


@pytest.mark.parametrize("trailing", [(16,), (2, 8)])
def test_scatter_rows_kernel_matches_xla(trailing):
    rng = np.random.default_rng(2)
    v, k = 50, 40
    dst = rng.normal(size=(v,) + trailing).astype(np.float32)
    ids = rng.integers(0, v, k).astype(np.int32)
    ids[5] = ids[7]          # duplicate (identical rows -> idempotent)
    ids[3] = v               # sentinel: dropped
    rows = rng.normal(size=(k,) + trailing).astype(np.float32)
    rows[7] = rows[5]
    expect = dst.copy()
    for i in range(k):
        if ids[i] < v:
            expect[ids[i]] = rows[i]
    got = scatter_rows(jnp.asarray(dst), jnp.asarray(ids), jnp.asarray(rows),
                       nslots=4, chunk=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), expect)
    got_xla = scatter_rows(jnp.asarray(dst), jnp.asarray(ids),
                           jnp.asarray(rows), force_xla=True)
    np.testing.assert_array_equal(np.asarray(got_xla), expect)


def test_scatter_rows_chunking_boundaries():
    """K spanning multiple chunks and a ragged final tile."""
    rng = np.random.default_rng(3)
    v, w, k = 30, 4, 53
    dst = rng.normal(size=(v, w)).astype(np.float32)
    ids = rng.integers(0, v, k).astype(np.int32)
    rows = rng.normal(size=(k, w)).astype(np.float32)
    # make duplicates consistent: later occurrences copy the first row
    seen = {}
    for i, t in enumerate(ids):
        if int(t) in seen:
            rows[i] = rows[seen[int(t)]]
        else:
            seen[int(t)] = i
    expect = dst.copy()
    expect[ids] = rows[np.asarray([seen[int(t)] for t in ids])]
    got = scatter_rows(jnp.asarray(dst), jnp.asarray(ids), jnp.asarray(rows),
                       nslots=4, chunk=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), expect)


# ---------------------------------------------------------------------------
# optimizer equivalence
# ---------------------------------------------------------------------------


def _winner_as_mom(state):
    return np.stack([np.asarray(state["mu"]), np.asarray(state["nu"])], axis=1)


def test_occurrence_update_matches_winner_update():
    """Same inputs -> same new table and moments as the winner-scatter impl,
    with duplicates inside a segment AND across alias segments."""
    rng = np.random.default_rng(4)
    v, d = 40, 8
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    # two owners: owner A spans rows [0, 25) with two alias segments,
    # owner B spans [25, 40)
    ids_a1 = rng.integers(0, 25, 10).astype(np.int32)
    ids_a2 = rng.integers(0, 25, 10).astype(np.int32)
    ids_a2[0] = ids_a1[3]  # cross-segment duplicate within owner A
    ids_b = (rng.integers(0, 15, 6) + 25).astype(np.int32)
    ids = jnp.asarray(np.concatenate([ids_a1, ids_a2, ids_b]))
    segments = (("A", 0, 10), ("A", 10, 10), ("B", 20, 6))
    g = jnp.asarray(rng.normal(size=(26, d)).astype(np.float32))

    kw = dict(lr=1e-2, weight_decay=1e-4)
    # multiple steps: moments + bias correction advance
    tw, sw = table, sparse_adam_init(table)
    so = sparse_adam_occurrence_init(table)
    for _ in range(3):
        tw, sw = sparse_adam_rowgrads_update(tw, sw, g, ids, **kw)
        so = sparse_adam_occurrence_update(so, g, ids, segments,
                                           so["comb"][ids],
                                           use_pallas=False, **kw)
    np.testing.assert_allclose(np.asarray(so["comb"][:, :d]), np.asarray(tw),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(so["comb"][:, d:]).reshape(v, 2, d),
        _winner_as_mom(sw), rtol=1e-5, atol=1e-6)
    assert int(so["step"]) == int(sw["step"]) == 3

    # and the pallas segsum kernel (interpreter) gives the same result
    sp = sparse_adam_occurrence_init(table)
    for _ in range(3):
        sp = sparse_adam_occurrence_update(sp, g, ids, segments,
                                           sp["comb"][ids],
                                           use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(sp["comb"][:, :d]), np.asarray(tw),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sp["comb"][:, d:]).reshape(v, 2, d),
        _winner_as_mom(sw), rtol=1e-5, atol=1e-6)


def test_trainer_occurrence_impl_matches_winner_impl():
    """Full CTRTrainer step parity between the two sparse impls."""
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = (
        [SparseFeature(f"s{i}", vocab_size=30, embed_dim=8) for i in range(3)]
        + [SparseFeature("alias", vocab_size=30, embed_dim=8,
                         shared_with="s0")]
        + [SequenceFeature("seq", vocab_size=30, embed_dim=8, pooling="mean",
                           shared_with="s1")]
        + [DenseFeature("d0")]
    )

    def make_trainer(impl):
        model = MMOE(feats, 2, n_expert=2,
                     expert_params={"dims": [16]}, tower_params={"dims": [8]})
        return CTRTrainer(model, sparse_embedding_updates=True,
                          sparse_update_impl=impl, seed=7)

    tw = make_trainer("winner")
    to = make_trainer("occurrence")
    rng = np.random.default_rng(5)
    b = 16
    x = {f"s{i}": jnp.asarray(rng.integers(0, 30, b).astype(np.int32))
         for i in range(3)}
    x["alias"] = jnp.asarray(rng.integers(0, 30, b).astype(np.int32))
    x["seq"] = jnp.asarray(rng.integers(0, 30, (b, 4)).astype(np.int32))
    x["d0"] = jnp.asarray(rng.normal(size=b).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(
        rng.integers(0, 2, b).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)

    # ONE step compared tightly: the two impls segment-sum duplicate grads
    # in different (both valid) f32 accumulation orders, and by step 2
    # Adam's sqrt(nu) amplifies last-ulp nu differences (nu ~ 1e-9 early)
    # chaotically — single-step equality IS the semantic claim.
    key = jax.random.PRNGKey(11)
    k = jax.random.split(key)[1]
    pw, ow, stw, lw = tw._train_step(tw.params, tw.opt_state, tw.state,
                                     x, y, w, k)
    po, oo, sto, lo = to._train_step(to.params, to.opt_state, to.state,
                                     x, y, w, k)
    np.testing.assert_allclose(float(lw), float(lo), rtol=1e-6)
    # occurrence mode strips the packed leaf from params (authority lives
    # in the combined store) — compare the shared leaves by path
    pw_flat = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(pw)}
    po_flat = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(po)}
    assert set(po_flat) == set(pw_flat) - {"['embedding']['packed']"}
    for kp, vo in po_flat.items():
        np.testing.assert_allclose(np.asarray(vo), np.asarray(pw_flat[kp]),
                                   rtol=1e-6, atol=1e-7, err_msg=kp)
    comb = np.asarray(oo["emb"]["comb"])
    d8 = 8
    np.testing.assert_allclose(
        comb[:, :d8], np.asarray(pw_flat["['embedding']['packed']"]),
        rtol=1e-6, atol=1e-7)
    mom_w = np.stack([np.asarray(ow["emb"]["mu"]),
                      np.asarray(ow["emb"]["nu"])], axis=1)
    np.testing.assert_allclose(comb[:, d8:].reshape(-1, 2, d8),
                               mom_w, rtol=1e-5, atol=1e-8)


def test_combined_mode_fit_eval_save_load(tmp_path):
    """Combined-store plumbing: fit (eval + early-stop snapshot through
    _params_for_eval), save materializes the packed table, load routes it
    back into the combined store, predictions survive the roundtrip."""
    from scenario_wise_rec_tpu.data.dataset import DataGenerator
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = ([SparseFeature(f"s{i}", vocab_size=20, embed_dim=4)
              for i in range(2)] + [DenseFeature("d0")])
    rng = np.random.default_rng(9)
    n = 96
    x = {f"s{i}": rng.integers(0, 20, n).astype(np.int32) for i in range(2)}
    x["d0"] = rng.normal(size=n).astype(np.float32)
    x["domain_indicator"] = rng.integers(0, 2, n).astype(np.int32)
    y = rng.integers(0, 2, n).astype(np.float32)
    train, val, test = DataGenerator(x, y).generate_dataloader(
        split_ratio=[0.5, 0.25], batch_size=16)

    def build():
        model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [8]},
                     tower_params={"dims": [4]})
        return CTRTrainer(model, sparse_embedding_updates=True,
                          sparse_update_impl="occurrence", n_epoch=2,
                          earlystop_patience=1, seed=3,
                          model_path=str(tmp_path))

    tr = build()
    assert "packed" not in tr.params["embedding"]  # authority in comb
    tr.fit(train, val)
    auc, logloss = tr.evaluate(tr.model, test)
    preds = tr.predict(tr.model, test)

    # roundtrip through the timestamped checkpoint fit() wrote
    import glob
    ckpts = glob.glob(str(tmp_path / "*"))
    assert ckpts
    tr2 = build()
    tr2.load(ckpts[0].rsplit(".", 1)[0] if ckpts[0].endswith(".npz")
             else ckpts[0])
    np.testing.assert_allclose(
        np.asarray(tr2.opt_state["emb"]["comb"]),
        np.asarray(tr.opt_state["emb"]["comb"]), rtol=1e-6)
    preds2 = tr2.predict(tr2.model, test)
    np.testing.assert_allclose(np.asarray(preds2), np.asarray(preds),
                               rtol=1e-6, atol=1e-7)
