"""Sharding tests on the 8-device virtual CPU mesh.

Covers SURVEY §2.4's distributed design: DP batch sharding with automatic
gradient all-reduce, row-sharded embedding tables (both the XLA-SPMD path
and the explicit shard_map path), and single-vs-multi-device equivalence of
the full train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
from scenario_wise_rec_tpu.models import MMOE
from scenario_wise_rec_tpu.parallel.mesh import make_mesh
from scenario_wise_rec_tpu.parallel.sharded_embedding import (
    make_sharded_lookup_fn,
    pad_vocab,
)
from scenario_wise_rec_tpu.parallel.sharding_rules import (
    param_specs,
    place_params,
)
from scenario_wise_rec_tpu.train.loss import bce_loss
from scenario_wise_rec_tpu.train.optim import adam

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _model_and_batch(batch=32):
    sparse = [SparseFeature(f"s{i}", vocab_size=40, embed_dim=8)
              for i in range(3)]
    dense = [DenseFeature("d0")]
    model = MMOE(dense + sparse, 3, n_expert=2,
                 expert_params={"dims": [16]}, tower_params={"dims": [8]})
    rng = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(rng.integers(0, 40, batch)) for i in range(3)}
    x["d0"] = jnp.asarray(rng.normal(size=batch).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(rng.integers(0, 3, batch))
    y = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))
    return model, x, y


def test_sharded_lookup_matches_dense(rng):
    mesh = make_mesh(n_data=2, n_embed=4)
    table = jax.random.normal(rng, (37, 8))  # deliberately non-divisible
    sharded, lookup = make_sharded_lookup_fn(mesh, table)
    assert sharded.shape[0] == pad_vocab(37, 4) == 40
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 37, (4, 6)))
    got = lookup(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]),
                               atol=1e-6)
    # the table really is distributed: each device holds 1/4 of the rows
    row_counts = {s.data.shape[0] for s in sharded.addressable_shards}
    assert row_counts == {10}


def test_dp_train_step_matches_single_device():
    """Same batch, same init: (data=8)-sharded step == single-device step."""
    model, x, y = _model_and_batch(batch=32)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    optimizer = adam(lr=1e-2, weight_decay=1e-5)
    opt_state = optimizer.init(params)

    def train_step(params, opt_state, state, x, y):
        def loss_fn(p):
            probs, ns = model.apply(p, state, x, train=True,
                                    rng=jax.random.PRNGKey(1))
            return bce_loss(probs, y), ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # NOTE: comparing grads, not post-Adam params — Adam's first-step
        # g/sqrt(g^2) normalization turns fp32 reduction-order noise in
        # near-zero grads into O(lr) param differences.
        return grads, loss

    # single device
    p1, loss1 = jax.jit(train_step)(params, opt_state, state, x, y)

    # 8-way data parallel + embed-sharded tables
    mesh = make_mesh(n_data=8, n_embed=1)
    data_sh = NamedSharding(mesh, P("data"))
    xs = {k: jax.device_put(v, data_sh) for k, v in x.items()}
    ys = jax.device_put(y, data_sh)
    ps = place_params(mesh, params)
    ss = jax.device_put(state, NamedSharding(mesh, P()))
    os_ = jax.device_put(opt_state, NamedSharding(mesh, P()))
    with mesh:
        p8, loss8 = jax.jit(train_step)(ps, os_, ss, xs, ys)

    assert float(loss1) == pytest.approx(float(loss8), abs=1e-6)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_sparse_mode_on_mesh():
    """CTRTrainer(mesh=..., sparse_embedding_updates=True): the fully-sparse
    row update (winner-scatter dedup + row Adam) must compile and run under
    SPMD with the batch sharded over ``data``."""
    from scenario_wise_rec_tpu.train import CTRTrainer

    model, x, y = _model_and_batch(batch=32)
    mesh = make_mesh(n_data=8, n_embed=1)
    tr = CTRTrainer(model, mesh=mesh, sparse_embedding_updates=True,
                    sparse_update_impl="winner", seed=3)
    xb = {k: jnp.asarray(v) for k, v in x.items()}
    w = jnp.ones((32,), jnp.float32)
    xb, yb, wb = tr._shard(xb, jnp.asarray(y), w)
    with mesh:
        p, o, s, loss = tr._train_step(tr.params, tr.opt_state, tr.state,
                                       xb, yb, wb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # equivalence with the single-device sparse step
    tr1 = CTRTrainer(model, sparse_embedding_updates=True,
                     sparse_update_impl="winner", seed=3)
    p1, o1, s1, loss1 = tr1._train_step(
        tr1.params, tr1.opt_state, tr1.state,
        {k: jnp.asarray(v) for k, v in x.items()}, jnp.asarray(y), w,
        jax.random.PRNGKey(0))
    assert float(loss) == pytest.approx(float(loss1), abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["embedding"]["packed"]),
        np.asarray(p1["embedding"]["packed"]), atol=2e-5)


def test_trainer_dense_row_sharded_matches_single_device():
    """CTRTrainer(mesh=4x2): the user-facing trainer must row-shard the packed
    table AND its dense-Adam moments over ``embed`` (VERDICT r1 #3), and the
    sharded step must match the single-device step."""
    from scenario_wise_rec_tpu.train import CTRTrainer

    model, x, y = _model_and_batch(batch=32)
    w = jnp.ones((32,), jnp.float32)
    xb = {k: jnp.asarray(v) for k, v in x.items()}

    tr1 = CTRTrainer(model, seed=3)
    p1, o1, s1, loss1 = tr1._train_step(
        tr1.params, tr1.opt_state, tr1.state, xb, jnp.asarray(y), w,
        jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=4, n_embed=2)
    tr = CTRTrainer(model, mesh=mesh, seed=3)
    table = tr.params["embedding"]["packed"]
    assert max(s.data.shape[0] for s in table.addressable_shards) \
        < table.shape[0], "packed table not row-sharded by the trainer"
    mu = tr.opt_state[1].mu["embedding"]["packed"]
    assert max(s.data.shape[0] for s in mu.addressable_shards) \
        < table.shape[0], "Adam moments not mirroring the table sharding"

    xs, ys, ws = tr._shard(xb, jnp.asarray(y), w)
    p8, o8, s8, loss8 = tr._train_step(
        tr.params, tr.opt_state, tr.state, xs, ys, ws, jax.random.PRNGKey(0))
    assert float(loss1) == pytest.approx(float(loss8), abs=1e-6)
    # Adam's first-step g/sqrt(g^2) normalization amplifies fp reduction-order
    # noise in near-zero grads to O(lr) (see the grads-only comparison in
    # test_dp_train_step_matches_single_device) — hence the loose param atol;
    # the second step's LOSS (computed on the updated params) is the tight
    # functional check.
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    _, _, _, l1b = tr1._train_step(p1, o1, s1, xb, jnp.asarray(y), w,
                                   jax.random.PRNGKey(1))
    _, _, _, l8b = tr._train_step(p8, o8, s8, xs, ys, ws,
                                  jax.random.PRNGKey(1))
    assert float(l1b) == pytest.approx(float(l8b), abs=5e-5)


def test_trainer_sparse_row_sharded_matches_single_device():
    """Row-sharded table x row-sparse Adam (winner-scatter dedup): the
    combination that matters at production vocab (VERDICT r1 #7). n_embed=2
    so the scatter/dedup runs against a genuinely distributed table."""
    from scenario_wise_rec_tpu.train import CTRTrainer

    model, x, y = _model_and_batch(batch=32)
    w = jnp.ones((32,), jnp.float32)
    xb = {k: jnp.asarray(v) for k, v in x.items()}

    tr1 = CTRTrainer(model, sparse_embedding_updates=True,
                     sparse_update_impl="winner", seed=3)
    p1, o1, s1, loss1 = tr1._train_step(
        tr1.params, tr1.opt_state, tr1.state, xb, jnp.asarray(y), w,
        jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=4, n_embed=2)
    tr = CTRTrainer(model, mesh=mesh, sparse_embedding_updates=True,
                    sparse_update_impl="winner", seed=3)
    table = tr.params["embedding"]["packed"]
    assert max(s.data.shape[0] for s in table.addressable_shards) \
        < table.shape[0]
    mu = tr.opt_state["emb"]["mu"]
    assert max(s.data.shape[0] for s in mu.addressable_shards) \
        < table.shape[0], "sparse-Adam moments not row-sharded"

    xs, ys, ws = tr._shard(xb, jnp.asarray(y), w)
    p8, o8, s8, loss8 = tr._train_step(
        tr.params, tr.opt_state, tr.state, xs, ys, ws, jax.random.PRNGKey(0))
    assert float(loss1) == pytest.approx(float(loss8), abs=1e-6)
    np.testing.assert_allclose(np.asarray(p8["embedding"]["packed"]),
                               np.asarray(p1["embedding"]["packed"]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(o8["emb"]["mu"]),
                               np.asarray(o1["emb"]["mu"]), atol=1e-6)


def test_trainer_occurrence_row_sharded_matches_single_device():
    """The DEFAULT sparse impl (occurrence combined row store) under a 4x2
    mesh: comb row-sharded over ``embed``, step equals single-device."""
    from scenario_wise_rec_tpu.train import CTRTrainer

    model, x, y = _model_and_batch(batch=32)
    w = jnp.ones((32,), jnp.float32)
    xb = {k: jnp.asarray(v) for k, v in x.items()}

    tr1 = CTRTrainer(model, sparse_embedding_updates=True, seed=3)
    p1, o1, s1, loss1 = tr1._train_step(
        tr1.params, tr1.opt_state, tr1.state, xb, jnp.asarray(y), w,
        jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=4, n_embed=2)
    tr = CTRTrainer(model, mesh=mesh, sparse_embedding_updates=True, seed=3)
    comb = tr.opt_state["emb"]["comb"]
    assert max(sh.data.shape[0] for sh in comb.addressable_shards) \
        < comb.shape[0], "combined row store not row-sharded"

    xs, ys, ws = tr._shard(xb, jnp.asarray(y), w)
    p8, o8, s8, loss8 = tr._train_step(
        tr.params, tr.opt_state, tr.state, xs, ys, ws, jax.random.PRNGKey(0))
    assert float(loss1) == pytest.approx(float(loss8), abs=1e-6)
    np.testing.assert_allclose(np.asarray(o8["emb"]["comb"]),
                               np.asarray(o1["emb"]["comb"]), atol=2e-5)


def test_trainer_sorted_row_sharded_matches_single_device():
    """The sorted (exact-dense) impl under a 4x2 mesh: padded authority
    table + moments row-sharded over ``embed``, step equals single-device
    — through BOTH mesh engines: the pure-XLA dense formulation
    (sorted_kernel=False, the CPU default) and the shard_map'd Pallas
    streaming kernel (sorted_kernel=True — the engine a real TPU mesh
    runs by default, sorted_dense_adam_apply_sharded; VERDICT r4 #1). The
    kernel leg also proves the pallas_call is really in the traced mesh
    step (not silently replaced by a fallback)."""
    from scenario_wise_rec_tpu.train import CTRTrainer

    model, x, y = _model_and_batch(batch=32)
    w = jnp.ones((32,), jnp.float32)
    xb = {k: jnp.asarray(v) for k, v in x.items()}

    kw = dict(sparse_embedding_updates=True, sparse_update_impl="sorted",
              sorted_block_rows=64, seed=3)
    tr1 = CTRTrainer(model, **kw)
    p1, o1, s1, loss1 = tr1._train_step(
        tr1.params, tr1.opt_state, tr1.state, xb, jnp.asarray(y), w,
        jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=4, n_embed=2)
    for kernel in (False, True):
        tr = CTRTrainer(model, mesh=mesh, sorted_kernel=kernel or None,
                        **kw)
        table = tr.opt_state["emb"]["table"]
        assert max(sh.data.shape[0] for sh in table.addressable_shards) \
            < table.shape[0], "sorted authority table not row-sharded"
        assert max(sh.data.shape[0]
                   for sh in tr.opt_state["emb"]["mu"].addressable_shards) \
            < table.shape[0], "sorted-mode moments not row-sharded"

        xs, ys, ws = tr._shard(xb, jnp.asarray(y), w)
        if kernel:
            jaxpr = jax.make_jaxpr(tr._train_step)(
                tr.params, tr.opt_state, tr.state, xs, ys, ws,
                jax.random.PRNGKey(0))
            txt = str(jaxpr)
            assert "pallas_call" in txt, \
                "mesh step does not route through the Pallas kernel"
            assert "shard_map" in txt
        p8, o8, s8, loss8 = tr._train_step(
            tr.params, tr.opt_state, tr.state, xs, ys, ws,
            jax.random.PRNGKey(0))
        assert float(loss1) == pytest.approx(float(loss8), abs=1e-6), kernel
        np.testing.assert_allclose(np.asarray(o8["emb"]["table"]),
                                   np.asarray(o1["emb"]["table"]),
                                   atol=2e-5, err_msg=f"kernel={kernel}")
        np.testing.assert_allclose(np.asarray(o8["emb"]["mu"]),
                                   np.asarray(o1["emb"]["mu"]), atol=1e-5,
                                   err_msg=f"kernel={kernel}")


def test_fit_on_mesh_e2e():
    """End-to-end CTRTrainer.fit() on an 8-device mesh with scan_steps>1:
    multi-batch training + val eval + early-stop bookkeeping all run under
    SPMD (VERDICT r1 #8)."""
    import pandas as pd

    from scenario_wise_rec_tpu.data import DataGenerator
    from scenario_wise_rec_tpu.train import CTRTrainer

    rng = np.random.default_rng(0)
    n = 256
    df = pd.DataFrame({
        "s0": rng.integers(0, 40, n), "s1": rng.integers(0, 40, n),
        "s2": rng.integers(0, 40, n),
        "d0": rng.normal(size=n).astype(np.float32),
        "domain_indicator": rng.integers(0, 3, n),
    })
    y = pd.Series(rng.integers(0, 2, n).astype(np.float32))
    sparse = [SparseFeature(f"s{i}", vocab_size=40, embed_dim=8)
              for i in range(3)]
    model = MMOE([DenseFeature("d0")] + sparse, 3, n_expert=2,
                 expert_params={"dims": [16]}, tower_params={"dims": [8]})
    dg = DataGenerator(df, y)
    train_dl, val_dl, _ = dg.generate_dataloader(
        split_ratio=[0.75, 0.125], batch_size=32)
    mesh = make_mesh(n_data=4, n_embed=2)
    tr = CTRTrainer(model, mesh=mesh, n_epoch=2, scan_steps=2,
                    model_path="/tmp", seed=0)
    tr.fit(train_dl, val_dl)
    assert tr.early_stopper.best_auc > 0.0
    table = tr.params["embedding"]["packed"]
    assert max(s.data.shape[0] for s in table.addressable_shards) \
        < table.shape[0], "table lost its sharding during fit"


def test_param_specs_only_shards_tables():
    model, _, _ = _model_and_batch()
    params, _ = jax.jit(model.init)(jax.random.PRNGKey(0))
    specs = param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    for path, spec in flat:
        keys = [str(getattr(p, "key", "")) for p in path]
        if "packed" in keys:
            assert spec == P("embed", None)
        else:
            assert spec == P()


def test_trainer_sorted_bf16_sharded_kernel_smoke():
    """bf16 authority tiles through the shard_map'd kernel on a 4x2 mesh:
    executes, keeps the storage dtype, finite loss."""
    from scenario_wise_rec_tpu.train import CTRTrainer

    model, x, y = _model_and_batch(batch=32)
    w = jnp.ones((32,), jnp.float32)
    xb = {k: jnp.asarray(v) for k, v in x.items()}
    mesh = make_mesh(n_data=4, n_embed=2)
    tr = CTRTrainer(model, mesh=mesh, sparse_embedding_updates=True,
                    sparse_update_impl="sorted", sorted_block_rows=64,
                    sorted_dtype="bf16", sorted_kernel=True, seed=3)
    xs, ys, ws = tr._shard(xb, jnp.asarray(y), w)
    _, o8, _, loss = tr._train_step(tr.params, tr.opt_state, tr.state,
                                    xs, ys, ws, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert o8["emb"]["table"].dtype == jnp.bfloat16
    assert max(sh.data.shape[0]
               for sh in o8["emb"]["table"].addressable_shards) \
        < o8["emb"]["table"].shape[0]
