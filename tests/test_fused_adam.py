"""Streaming fused dense-Adam (ops/pallas/fused_adam.py): the kernel and its
XLA reference must reproduce the regular dense path (optax torch-Adam chain +
autodiff embedding backward) exactly — this impl claims NO parity deviation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scenario_wise_rec_tpu.core import DenseFeature, SequenceFeature, SparseFeature
from scenario_wise_rec_tpu.ops.pallas.fused_adam import (
    fused_dense_adam_apply, fused_dense_adam_ref)
from scenario_wise_rec_tpu.train.optim import fused_dense_adam_update


def _hp(t, lr=1e-2, wd=1e-4, b1=0.9, b2=0.999, eps=1e-8):
    return jnp.asarray([lr, wd, b1, b2,
                        1.0 / (1.0 - b1 ** t), 1.0 / (1.0 - b2 ** t), eps],
                       jnp.float32)


def test_kernel_matches_ref_with_duplicates_and_padding():
    """Small-shape kernel (interpreter) vs the XLA reference: duplicate ids,
    several segments of different sizes, vocab not a block multiple."""
    rng = np.random.default_rng(0)
    v, d = 100, 8          # pads to 112 with block_rows=16
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32) * 0.01)
    nu = jnp.asarray(np.abs(rng.normal(size=(v, d))).astype(np.float32) * 0.01)

    # segments: two of size 12, one of size 20 (sequence-like)
    seg_sizes = [12, 12, 20]
    ids_np = np.concatenate([rng.integers(0, v, s) for s in seg_sizes]).astype(np.int32)
    ids_np[1] = ids_np[5]          # in-segment duplicate
    ids_np[13] = ids_np[2]         # cross-segment duplicate
    k = ids_np.shape[0]
    g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
    ids = jnp.asarray(ids_np)
    hp = _hp(1)

    ref_t, ref_mu, ref_nu = fused_dense_adam_ref(table, mu, nu, g, ids, hp)

    # build sorted/starts exactly as the optim wrapper does
    block_rows = 16
    vpad = ((v + block_rows - 1) // block_rows) * block_rows
    nb = vpad // block_rows
    bounds = np.arange(nb + 1, dtype=np.int32) * block_rows
    sorted_ids, sorted_pos, starts = [], [], []
    off = 0
    for s in seg_sizes:
        seg = ids_np[off:off + s]
        order = np.argsort(seg, kind="stable")
        sorted_ids.append(seg[order])
        sorted_pos.append(order.astype(np.int32) + off)
        starts.append(np.searchsorted(seg[order], bounds).astype(np.int32)
                      + sum(len(x) for x in sorted_ids[:-1]))
        off += s
    out_t, out_mu, out_nu = fused_dense_adam_apply(
        table, mu, nu, g,
        jnp.asarray(np.concatenate(sorted_ids)),
        jnp.asarray(np.concatenate(sorted_pos)),
        jnp.asarray(np.concatenate(starts)),
        hp, block_rows=block_rows, interpret=True)

    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_mu), np.asarray(ref_mu),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_nu), np.asarray(ref_nu),
                               rtol=1e-6, atol=1e-7)


def test_optim_wrapper_pallas_matches_ref_path():
    rng = np.random.default_rng(1)
    v, d = 60, 4
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    state = {"mu": jnp.zeros((v, d)), "nu": jnp.zeros((v, d)),
             "step": jnp.zeros((), jnp.int32)}
    segments = (("a", 0, 10), ("b", 10, 10), ("c", 20, 24))
    ids = jnp.asarray(rng.integers(0, v, 44).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(44, d)).astype(np.float32))

    t_ref, s_ref = table, state
    t_pal, s_pal = table, state
    for _ in range(3):
        t_ref, s_ref = fused_dense_adam_update(
            t_ref, s_ref, g, ids, segments, use_pallas=False)
        t_pal, s_pal = fused_dense_adam_update(
            t_pal, s_pal, g, ids, segments, use_pallas=True, block_rows=32)
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_pal["nu"]), np.asarray(s_ref["nu"]),
                               rtol=1e-5, atol=1e-8)
    assert int(s_pal["step"]) == 3


def test_trainer_dense_impl_matches_regular_dense_trainer():
    """CTRTrainer(sparse_embedding_updates=True, impl='dense') must produce
    the SAME training step as the plain dense trainer (optax Adam over the
    whole params tree) — the no-deviation claim."""
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

    td = make()                                           # plain dense
    tf = make(sparse_embedding_updates=True, sparse_update_impl="dense")

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
    pd, od, sd, ld = td._train_step(td.params, td.opt_state, td.state,
                                    x, y, w, k)
    pf, of, sf, lf = tf._train_step(tf.params, tf.opt_state, tf.state,
                                    x, y, w, k)
    np.testing.assert_allclose(float(ld), float(lf), rtol=1e-6)
    for (kp, vd), (_, vf) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(pd),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(pf),
                   key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vd),
                                   rtol=1e-5, atol=1e-7, err_msg=str(kp))
    # moments of the packed table match optax's ScaleByAdamState
    adam_state = [s for s in od[0] if hasattr(s, "mu")]
    if not adam_state:
        adam_state = [s for s in od if hasattr(s, "mu")]
    mu_d = adam_state[0].mu["embedding"]["packed"]
    nu_d = adam_state[0].nu["embedding"]["packed"]
    np.testing.assert_allclose(np.asarray(of["emb"]["mu"]), np.asarray(mu_d),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(of["emb"]["nu"]), np.asarray(nu_d),
                               rtol=1e-5, atol=1e-7)
