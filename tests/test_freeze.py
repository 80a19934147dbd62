"""Pretrained(freeze=True) is enforced in EVERY trainer update mode
(train/freeze.py): the frozen table stays bit-identical through training
while everything else moves. Reference semantics:
``nn.Embedding.from_pretrained(..., freeze=True)`` -> requires_grad=False
-> torch.optim.Adam skips the param entirely (basic/initializers.py:76-92).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.core.init import pretrained
from scenario_wise_rec_tpu.models import MMOE
from scenario_wise_rec_tpu.train import CTRTrainer

V0, D = 20, 8
W_FROZEN = np.random.default_rng(99).normal(size=(V0, D)).astype(np.float32)
W_LOOSE = np.random.default_rng(98).normal(size=(12, 4)).astype(np.float32)


def _feats():
    return [
        # frozen pretrained feature INSIDE the packed mega-table
        SparseFeature("s0", vocab_size=V0, embed_dim=D,
                      initializer=pretrained(W_FROZEN, freeze=True)),
        SparseFeature("s1", vocab_size=30, embed_dim=D),
        SparseFeature("s2", vocab_size=30, embed_dim=D),
        # frozen pretrained LOOSE table (odd embed_dim -> not packed)
        SparseFeature("sl", vocab_size=12, embed_dim=4,
                      initializer=pretrained(W_LOOSE, freeze=True)),
        DenseFeature("d0"),
    ]


def _batch(b=32):
    rng = np.random.default_rng(3)
    x = {"s0": jnp.asarray(rng.integers(0, V0, b).astype(np.int32)),
         "s1": jnp.asarray(rng.integers(0, 30, b).astype(np.int32)),
         "s2": jnp.asarray(rng.integers(0, 30, b).astype(np.int32)),
         "sl": jnp.asarray(rng.integers(0, 12, b).astype(np.int32)),
         "d0": jnp.asarray(rng.normal(size=b).astype(np.float32)),
         "domain_indicator": jnp.asarray(
             rng.integers(0, 2, b).astype(np.int32))}
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    return x, y, jnp.ones((b,), jnp.float32)


@pytest.mark.parametrize("mode", ["optax", "winner", "occurrence",
                                  "dense", "sorted"])
def test_frozen_table_bit_identical_after_steps(mode):
    model = MMOE(_feats(), 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    kw = {}
    if mode != "optax":
        kw = dict(sparse_embedding_updates=True, sparse_update_impl=mode,
                  sorted_block_rows=64)
    tr = CTRTrainer(model, seed=7, **kw)
    col = model.embedding
    assert col.frozen_spans == ((col.offsets["s0"], V0),)
    assert col.frozen_loose == ("sl",)
    off = col.offsets["s0"]

    x, y, w = _batch()
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, k = jax.random.split(key)
        tr.params, tr.opt_state, tr.state, loss = tr._train_step(
            tr.params, tr.opt_state, tr.state, x, y, w, k)
    p = tr._params_for_eval()
    packed = np.asarray(p["embedding"]["packed"])
    # frozen span: BIT-identical to the pretrained weights
    np.testing.assert_array_equal(packed[off:off + V0], W_FROZEN)
    # frozen loose table too
    np.testing.assert_array_equal(
        np.asarray(p["embedding"]["tables"]["sl"]), W_LOOSE)
    # everything else trained: s1's touched rows moved from their init
    off1 = col.offsets["s1"]
    p0, _ = jax.jit(model.init)(jax.random.split(jax.random.PRNGKey(7))[1])
    init_packed = np.asarray(p0["embedding"]["packed"])
    assert not np.array_equal(packed[off1:off1 + 30],
                              init_packed[off1:off1 + 30]), \
        "trainable rows did not move"


def test_frozen_moments_stay_zero_dense_optax():
    """torch keeps NO optimizer state for skipped (requires_grad=False)
    params; our dense-optax path zeroes frozen rows of the chain's Adam
    moments after each update so a resume-then-unfreeze matches reference
    behavior (ADVICE r4)."""
    import optax

    model = MMOE(_feats(), 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    tr = CTRTrainer(model, seed=7)
    col = model.embedding
    off = col.offsets["s0"]

    x, y, w = _batch()
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, k = jax.random.split(key)
        tr.params, tr.opt_state, tr.state, _ = tr._train_step(
            tr.params, tr.opt_state, tr.state, x, y, w, k)

    adam_states = [s for s in tr.opt_state
                   if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states, "optax chain carries no ScaleByAdamState?"
    (st,) = adam_states
    for mom in (st.mu, st.nu):
        packed = np.asarray(mom["embedding"]["packed"])
        np.testing.assert_array_equal(packed[off:off + V0],
                                      np.zeros((V0, D), np.float32))
        np.testing.assert_array_equal(
            np.asarray(mom["embedding"]["tables"]["sl"]),
            np.zeros(W_LOOSE.shape, np.float32))
        # non-frozen rows DID accumulate moments
        off1 = col.offsets["s1"]
        assert np.abs(packed[off1:off1 + 30]).sum() > 0


def test_frozen_survives_fit(tmp_path):
    """End-to-end fit(): frozen table unchanged, results still produced."""
    import pandas as pd

    from scenario_wise_rec_tpu.data import DataGenerator

    rng = np.random.default_rng(0)
    n = 128
    df = pd.DataFrame({
        "s0": rng.integers(0, V0, n), "s1": rng.integers(0, 30, n),
        "s2": rng.integers(0, 30, n), "sl": rng.integers(0, 12, n),
        "d0": rng.normal(size=n).astype(np.float32),
        "domain_indicator": rng.integers(0, 2, n),
    })
    y = pd.Series(rng.integers(0, 2, n).astype(np.float32))
    dg = DataGenerator(df, y)
    train_dl, val_dl, _ = dg.generate_dataloader(
        split_ratio=[0.6, 0.2], batch_size=32)
    model = MMOE(_feats(), 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    tr = CTRTrainer(model, n_epoch=2, model_path=str(tmp_path), seed=1)
    tr.fit(train_dl, val_dl)
    p = tr._params_for_eval()
    off = model.embedding.offsets["s0"]
    np.testing.assert_array_equal(
        np.asarray(p["embedding"]["packed"][off:off + V0]), W_FROZEN)
    np.testing.assert_array_equal(
        np.asarray(p["embedding"]["tables"]["sl"]), W_LOOSE)


def test_frozen_table_bit_identical_sorted_kernel_mesh():
    """Pretrained(freeze=True) through the shard_map'd sorted kernel on a
    4x2 mesh: the frozen packed span stays bit-identical (the packed-tile
    frozen blend runs on the SPMD-sharded authority after the per-shard
    kernel)."""
    from scenario_wise_rec_tpu.parallel.mesh import make_mesh

    model = MMOE(_feats(), 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    mesh = make_mesh(n_data=4, n_embed=2)
    tr = CTRTrainer(model, seed=7, mesh=mesh, sparse_embedding_updates=True,
                    sparse_update_impl="sorted", sorted_block_rows=64,
                    sorted_kernel=True)
    col = model.embedding
    off = col.offsets["s0"]
    x, y, w = _batch()
    xs, ys, ws = tr._shard(x, y, w)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, k = jax.random.split(key)
        tr.params, tr.opt_state, tr.state, loss = tr._train_step(
            tr.params, tr.opt_state, tr.state, xs, ys, ws, k)
    assert np.isfinite(float(loss))
    p = tr._params_for_eval()
    np.testing.assert_array_equal(
        np.asarray(p["embedding"]["packed"])[off:off + V0], W_FROZEN)
    np.testing.assert_array_equal(
        np.asarray(p["embedding"]["tables"]["sl"]), W_LOOSE)
