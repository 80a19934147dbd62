"""Chunk-vectorized sorted streaming dense-Adam (ops/pallas/sorted_adam.py):
kernel + sort prep must reproduce the plain dense path (scatter-add gradient
+ vectorized dense torch-Adam) exactly — this impl claims NO parity
deviation, like sparse_update_impl='dense'.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scenario_wise_rec_tpu.core import (DenseFeature, SequenceFeature,
                                        SparseFeature)
from scenario_wise_rec_tpu.ops.pallas.fused_adam import fused_dense_adam_ref
from scenario_wise_rec_tpu.ops.pallas.sorted_adam import (
    owner_sorted_grads, pack_rows, packed_row_gather, sorted_dense_adam_apply,
    unpack_rows)
from scenario_wise_rec_tpu.train.optim import (sorted_dense_adam_init,
                                               sorted_dense_adam_update)

# owners with disjoint ascending packed spans (like EmbeddingCollection)
OFFSETS = {"a": 0, "b": 30, "c": 60}
VOCABS = {"a": 30, "b": 30, "c": 40}
V = 100


def _make_batch(rng, seg_sizes, c_hi=None):
    """segments incl. an aliased second segment on owner 'a' (cross-segment
    duplicates within one owner span). ``c_hi`` caps owner c's draws so the
    tail of its span stays empty (empty-vocab-block coverage) — ids must
    stay inside their owner's span (the global-sortedness invariant of
    owner_sorted_grads)."""
    owners = ["a", "b", "c", "a"]
    ids_np, segments, pos = [], [], 0
    for owner, s in zip(owners, seg_sizes):
        lo, hi = OFFSETS[owner], OFFSETS[owner] + VOCABS[owner]
        if owner == "c" and c_hi is not None:
            hi = c_hi
        ids_np.append(rng.integers(lo, hi, s).astype(np.int32))
        segments.append((owner, pos, s))
        pos += s
    ids_np = np.concatenate(ids_np)
    ids_np[1] = ids_np[5]            # in-segment duplicate
    k = ids_np.shape[0]
    return ids_np, tuple(segments), k


def _hp(t, lr=1e-2, wd=1e-4, b1=0.9, b2=0.999, eps=1e-8):
    return jnp.asarray([lr, wd, b1, b2,
                        1.0 / (1.0 - b1 ** t), 1.0 / (1.0 - b2 ** t), eps],
                       jnp.float32)


def test_owner_sorted_grads_both_reorders():
    rng = np.random.default_rng(0)
    ids_np, segments, k = _make_batch(rng, [12, 12, 20, 8])
    d = 8
    g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
    ids = jnp.asarray(ids_np)

    for reorder in ("gather", "payload"):
        sid, gs = owner_sorted_grads(ids, g, segments, OFFSETS,
                                     reorder=reorder)
        sid_np = np.asarray(sid)
        assert np.all(np.diff(sid_np) >= 0), reorder  # globally sorted
        # multiset of (id, grad-row) pairs preserved
        order_ref = np.argsort(ids_np, kind="stable")
        np.testing.assert_array_equal(sid_np, ids_np[order_ref])
        np.testing.assert_allclose(np.asarray(gs), np.asarray(g)[order_ref],
                                   rtol=0, atol=0, err_msg=reorder)


def test_kernel_matches_dense_ref_with_duplicates_and_empty_blocks():
    """Interpreter kernel vs the XLA dense reference over several steps:
    duplicate ids (in- and cross-segment), vocab not a block multiple,
    blocks with zero ids (dense decay must still reach them)."""
    rng = np.random.default_rng(1)
    d, block_rows = 8, 32            # r = 16 rows per packed tile row
    # owner c capped at 70: rows [70, 100) never touched -> the last real
    # block has zero ids and must still receive dense decay. Segment sizes
    # push K past several 128-id chunks so the work-list logic (chunk
    # spans, block straddles, surplus pad items) is actually exercised.
    ids_np, segments, k = _make_batch(rng, [160, 160, 240, 96], c_hi=70)
    ids = jnp.asarray(ids_np)

    table0 = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    state = sorted_dense_adam_init(table0, block_rows=block_rows)
    r = 128 // d
    v2 = state["table"].shape[0] * r
    assert v2 == 4 * block_rows       # whole blocks, no dedicated pad block
    # packed round trip + packed gather match the plain table
    np.testing.assert_array_equal(
        np.asarray(unpack_rows(state["table"], V, d)), np.asarray(table0))
    np.testing.assert_array_equal(
        np.asarray(packed_row_gather(state["table"], ids, d)),
        np.asarray(table0[ids_np]))

    ref_t = unpack_rows(state["table"], v2, d)
    ref_mu = jnp.zeros((v2, d))
    ref_nu = jnp.zeros((v2, d))
    for t in range(1, 4):
        g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
        hp = _hp(t)
        sid, gs = owner_sorted_grads(ids, g, segments, OFFSETS)
        out_t, out_mu, out_nu = sorted_dense_adam_apply(
            state["table"], state["mu"], state["nu"], sid, gs, hp, d,
            block_rows=block_rows, interpret=True)
        ref_t, ref_mu, ref_nu = fused_dense_adam_ref(
            ref_t, ref_mu, ref_nu, g, ids, hp)
        state = {"table": out_t, "mu": out_mu, "nu": out_nu,
                 "step": state["step"] + 1}
        # the kernel's gradient operand rides a bf16 hi/lo split (exact
        # 1.0 x bf16 products, f32 accumulation; residual ~2^-18 relative
        # from the lo remainder's second rounding — see _kernel)
        for got, want in ((out_t, ref_t), (out_mu, ref_mu),
                          (out_nu, ref_nu)):
            np.testing.assert_allclose(
                np.asarray(unpack_rows(got, v2, d)), np.asarray(want),
                rtol=1e-4, atol=1e-5)
    # pad rows never move
    assert np.all(np.asarray(unpack_rows(state["table"], v2, d))[V:] == 0)


def test_update_wrapper_pallas_matches_ref_path():
    rng = np.random.default_rng(2)
    d = 4
    ids_np, segments, k = _make_batch(rng, [10, 10, 24, 6])
    ids = jnp.asarray(ids_np)
    table = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))

    s_ref = sorted_dense_adam_init(table, block_rows=64)
    s_pal = {k2: v for k2, v in s_ref.items()}
    s_pay = {k2: v for k2, v in s_ref.items()}
    for _ in range(3):
        g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
        s_ref = sorted_dense_adam_update(s_ref, g, ids, segments, OFFSETS, d,
                                         use_pallas=False, block_rows=64)
        s_pal = sorted_dense_adam_update(s_pal, g, ids, segments, OFFSETS, d,
                                         use_pallas=True, block_rows=64)
        s_pay = sorted_dense_adam_update(s_pay, g, ids, segments, OFFSETS, d,
                                         use_pallas=True, block_rows=64,
                                         reorder="payload")
    for a, b in ((s_pal, s_ref), (s_pay, s_ref)):
        np.testing.assert_allclose(np.asarray(a["table"]),
                                   np.asarray(b["table"]),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(a["nu"]), np.asarray(b["nu"]),
                                   rtol=1e-5, atol=1e-8)
    assert int(s_pal["step"]) == 3


def test_trainer_sorted_impl_matches_regular_dense_trainer():
    """CTRTrainer(sparse_update_impl='sorted') must produce the SAME
    training step as the plain dense trainer — the no-deviation claim —
    and eval/save must see the live table from the padded authority."""
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

    def make(**kw):
        model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [16]},
                     tower_params={"dims": [8]})
        return CTRTrainer(model, seed=7, **kw)

    # impl="dense" is itself pinned against the plain dense trainer
    # (test_fused_adam.py) and shares the torch-Adam hp math with "sorted",
    # so the two stay bit-comparable across steps (the plain optax chain
    # associates bias correction differently — ~1e-4 f32 drift by step 2).
    td = make(sparse_embedding_updates=True, sparse_update_impl="dense")
    ts = make(sparse_embedding_updates=True, sparse_update_impl="sorted",
              sorted_block_rows=64)

    rng = np.random.default_rng(5)
    b = 16
    x = {f"s{i}": jnp.asarray(rng.integers(0, 30, b).astype(np.int32))
         for i in range(3)}
    x["alias"] = jnp.asarray(rng.integers(0, 30, b).astype(np.int32))
    x["seq"] = jnp.asarray(rng.integers(0, 30, (b, 4)).astype(np.int32))
    x["d0"] = jnp.asarray(rng.normal(size=b).astype(np.float32))
    x["domain_indicator"] = jnp.asarray(rng.integers(0, 2, b).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)

    key = jax.random.PRNGKey(11)
    k = jax.random.split(key)[1]
    for _ in range(2):
        pd, od, sd, ld = td._train_step(td.params, td.opt_state, td.state,
                                        x, y, w, k)
        td.params, td.opt_state, td.state = pd, od, sd
        ps, os_, ss, ls = ts._train_step(ts.params, ts.opt_state, ts.state,
                                         x, y, w, k)
        ts.params, ts.opt_state, ts.state = ps, os_, ss
        np.testing.assert_allclose(float(ld), float(ls), rtol=1e-6)

    pe = ts._params_for_eval()
    np.testing.assert_allclose(
        np.asarray(pe["embedding"]["packed"]),
        np.asarray(td.params["embedding"]["packed"]),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(unpack_rows(ts.opt_state["emb"]["mu"], 90, 8)),
        np.asarray(td.opt_state["emb"]["mu"]),
        rtol=1e-5, atol=1e-8)
    # non-embedding leaves identical too
    for (kp, vd), (_, vf) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(
                td._strip_packed(td.params)), key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(ts.params),
                   key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vd),
                                   rtol=1e-5, atol=1e-7, err_msg=str(kp))
    # adopt round-trip (early-stop restore / checkpoint load path)
    ts._adopt_params(pe)
    np.testing.assert_allclose(
        np.asarray(ts._params_for_eval()["embedding"]["packed"]),
        np.asarray(pe["embedding"]["packed"]), rtol=0, atol=0)


def test_checkpoint_roundtrip_and_impl_mismatch(tmp_path):
    """sorted-mode save/load: dedup'd opt state round-trips (authority
    table reconstructed from params), and loading into a trainer with a
    different sparse_update_impl fails with a clear error."""
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = [SparseFeature("s0", vocab_size=40, embed_dim=8),
             DenseFeature("d0")]

    def make(impl):
        model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [8]},
                     tower_params={"dims": [4]})
        return CTRTrainer(model, sparse_embedding_updates=True,
                          sparse_update_impl=impl, sorted_block_rows=64,
                          seed=3)

    tr = make("sorted")
    rng = np.random.default_rng(0)
    b = 16
    x = {"s0": jnp.asarray(rng.integers(0, 40, b).astype(np.int32)),
         "d0": jnp.asarray(rng.normal(size=b).astype(np.float32)),
         "domain_indicator": jnp.asarray(
             rng.integers(0, 2, b).astype(np.int32))}
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)
    for _ in range(2):
        tr.params, tr.opt_state, tr.state, _ = tr._train_step(
            tr.params, tr.opt_state, tr.state, x, y, w,
            jax.random.PRNGKey(1))
    path = str(tmp_path / "ck")
    tr.save(path)

    tr2 = make("sorted")
    tr2.load(path)
    np.testing.assert_allclose(
        np.asarray(tr2.opt_state["emb"]["table"]),
        np.asarray(tr.opt_state["emb"]["table"]), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(tr2.opt_state["emb"]["mu"]),
        np.asarray(tr.opt_state["emb"]["mu"]), rtol=1e-6, atol=1e-7)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="sparse_update_impl"):
        make("occurrence").load(path)


def test_bf16_storage_kernel_matches_ref_path():
    """sorted_dtype='bf16' tiles: the interpret kernel and the XLA ref
    path share quantization semantics (f32 math, bf16-rounded storage)."""
    rng = np.random.default_rng(4)
    d = 8
    ids_np, segments, k = _make_batch(rng, [24, 24, 40, 8])
    ids = jnp.asarray(ids_np)
    table = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    s_ref = sorted_dense_adam_init(table, block_rows=64, dtype=jnp.bfloat16)
    assert s_ref["table"].dtype == jnp.bfloat16
    s_pal = dict(s_ref)
    for _ in range(3):
        g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
        s_ref = sorted_dense_adam_update(s_ref, g, ids, segments, OFFSETS, d,
                                         use_pallas=False, block_rows=64)
        s_pal = sorted_dense_adam_update(s_pal, g, ids, segments, OFFSETS, d,
                                         use_pallas=True, block_rows=64)
    assert s_pal["table"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(s_pal["table"].astype(jnp.float32)),
        np.asarray(s_ref["table"].astype(jnp.float32)),
        rtol=1e-2, atol=1e-3)  # bf16-rounded storage: ~8-bit mantissa
    # and the bf16 run tracks the f32 run to bf16 resolution
    s32 = sorted_dense_adam_init(table, block_rows=64)
    rng2 = np.random.default_rng(4)
    _make_batch(rng2, [24, 24, 40, 8])
    for _ in range(3):
        g = jnp.asarray(rng2.normal(size=(k, d)).astype(np.float32))
        s32 = sorted_dense_adam_update(s32, g, ids, segments, OFFSETS, d,
                                       use_pallas=False, block_rows=64)
    np.testing.assert_allclose(
        np.asarray(s_ref["table"].astype(jnp.float32)),
        np.asarray(s32["table"]), rtol=0.05, atol=0.02)


def test_trainer_sorted_bf16_smoke():
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = [SparseFeature("s0", vocab_size=40, embed_dim=8),
             DenseFeature("d0")]
    model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [8]},
                 tower_params={"dims": [4]})
    tr = CTRTrainer(model, sparse_embedding_updates=True,
                    sparse_update_impl="sorted", sorted_block_rows=64,
                    sorted_dtype="bf16", seed=3)
    rng = np.random.default_rng(0)
    b = 16
    x = {"s0": jnp.asarray(rng.integers(0, 40, b).astype(np.int32)),
         "d0": jnp.asarray(rng.normal(size=b).astype(np.float32)),
         "domain_indicator": jnp.asarray(
             rng.integers(0, 2, b).astype(np.int32))}
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)
    for _ in range(3):
        tr.params, tr.opt_state, tr.state, loss = tr._train_step(
            tr.params, tr.opt_state, tr.state, x, y, w,
            jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    p = tr._params_for_eval()
    assert p["embedding"]["packed"].dtype == jnp.float32
    assert tr.opt_state["emb"]["table"].dtype == jnp.bfloat16


def test_bf16_checkpoint_roundtrip(tmp_path):
    """bf16 authority tiles survive save/load (npz stores bfloat16 as raw
    uint16 bits + a key list; train/checkpoint.py)."""
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = [SparseFeature("s0", vocab_size=40, embed_dim=8),
             DenseFeature("d0")]

    def make():
        model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [8]},
                     tower_params={"dims": [4]})
        return CTRTrainer(model, sparse_embedding_updates=True,
                          sparse_update_impl="sorted", sorted_block_rows=64,
                          sorted_dtype="bf16", seed=3)

    tr = make()
    rng = np.random.default_rng(0)
    b = 16
    x = {"s0": jnp.asarray(rng.integers(0, 40, b).astype(np.int32)),
         "d0": jnp.asarray(rng.normal(size=b).astype(np.float32)),
         "domain_indicator": jnp.asarray(
             rng.integers(0, 2, b).astype(np.int32))}
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)
    tr.params, tr.opt_state, tr.state, _ = tr._train_step(
        tr.params, tr.opt_state, tr.state, x, y, w, jax.random.PRNGKey(1))
    tr.save(str(tmp_path / "ck"))
    tr2 = make()
    tr2.load(str(tmp_path / "ck"))
    assert tr2.opt_state["emb"]["mu"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(tr2.opt_state["emb"]["mu"].astype(jnp.float32)),
        np.asarray(tr.opt_state["emb"]["mu"].astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(tr2._params_for_eval()["embedding"]["packed"]),
        np.asarray(tr._params_for_eval()["embedding"]["packed"]))


def test_checkpoint_elastic_resharding(tmp_path):
    """A sorted-mode checkpoint written single-device resumes onto a
    row-sharded mesh (different shard count AND block size): the packed
    authority moments re-lay-out losslessly on load (train/trainer.py
    coerce hook; the mesh pads the block count to the shard count)."""
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.parallel.mesh import make_mesh
    from scenario_wise_rec_tpu.train import CTRTrainer

    feats = [SparseFeature("s0", vocab_size=40, embed_dim=8),
             DenseFeature("d0")]

    def make(**kw):
        model = MMOE(feats, 2, n_expert=2, expert_params={"dims": [8]},
                     tower_params={"dims": [4]})
        return CTRTrainer(model, sparse_embedding_updates=True,
                          sparse_update_impl="sorted", seed=3, **kw)

    tr = make(sorted_block_rows=64)
    rng = np.random.default_rng(0)
    b = 16
    x = {"s0": jnp.asarray(rng.integers(0, 40, b).astype(np.int32)),
         "d0": jnp.asarray(rng.normal(size=b).astype(np.float32)),
         "domain_indicator": jnp.asarray(
             rng.integers(0, 2, b).astype(np.int32))}
    y = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    w = jnp.ones((b,), jnp.float32)
    for _ in range(2):
        tr.params, tr.opt_state, tr.state, _ = tr._train_step(
            tr.params, tr.opt_state, tr.state, x, y, w,
            jax.random.PRNGKey(1))
    path = str(tmp_path / "ck")
    tr.save(path)

    # resume on a 4x2 mesh: the shard count pads the block count (1 -> 2
    # blocks of 64 rows -> [8, 128] tiles vs the saved [4, 128])
    tr2 = make(sorted_block_rows=64, mesh=make_mesh(n_data=4, n_embed=2))
    assert tr2.opt_state["emb"]["mu"].shape != tr.opt_state["emb"]["mu"].shape
    tr2.load(path)
    np.testing.assert_allclose(
        np.asarray(unpack_rows(tr2.opt_state["emb"]["mu"], 40, 8)),
        np.asarray(unpack_rows(tr.opt_state["emb"]["mu"], 40, 8)),
        rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(unpack_rows(tr2.opt_state["emb"]["table"], 40, 8)),
        np.asarray(unpack_rows(tr.opt_state["emb"]["table"], 40, 8)),
        rtol=1e-6, atol=1e-7)
    # and the resumed trainer still trains a step on the mesh
    xs, ys, ws = tr2._shard(x, y, w)
    _, o2, _, loss = tr2._train_step(tr2.params, tr2.opt_state, tr2.state,
                                     xs, ys, ws, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_kernel_chunk_ids_256_matches_ref():
    """chunk_ids=256 (wider work items, half the grid) must be numerically
    identical to the default 128-chunk kernel path."""
    rng = np.random.default_rng(7)
    d, block_rows = 8, 32
    ids_np, segments, k = _make_batch(rng, [160, 160, 240, 96], c_hi=70)
    ids = jnp.asarray(ids_np)
    table0 = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    state = sorted_dense_adam_init(table0, block_rows=block_rows)
    g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
    hp = _hp(1)
    sid, gs = owner_sorted_grads(ids, g, segments, OFFSETS)
    out128 = sorted_dense_adam_apply(
        state["table"], state["mu"], state["nu"], sid, gs, hp, d,
        block_rows=block_rows, interpret=True)
    out256 = sorted_dense_adam_apply(
        state["table"], state["mu"], state["nu"], sid, gs, hp, d,
        block_rows=block_rows, chunk_ids=256, interpret=True)
    for a, b in zip(out256, out128):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
