"""Unit tests for core ops: features, embedding, MLP/BN, activations, select."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenario_wise_rec_tpu.core import (
    DenseFeature,
    SequenceFeature,
    SparseFeature,
    get_auto_embedding_dim,
)
from scenario_wise_rec_tpu.core.activations import activation
from scenario_wise_rec_tpu.ops import (
    MLP,
    EmbeddingCollection,
    batchnorm_apply,
    batchnorm_init,
    domain_select,
    stacked_mlp_apply,
    stacked_mlp_init,
)


def test_auto_embedding_dim():
    # floor(6 * n^0.26), matching reference code (utils/data.py:65-75)
    assert get_auto_embedding_dim(1000) == int(np.floor(6 * 1000 ** 0.26))


def test_embedding_packed_lookup(rng):
    feats = [
        SparseFeature("a", vocab_size=10, embed_dim=4),
        SparseFeature("b", vocab_size=20, embed_dim=4),
        SparseFeature("b_alias", vocab_size=20, embed_dim=4, shared_with="b"),
        DenseFeature("d"),
    ]
    emb = EmbeddingCollection(feats)
    assert emb.packed_vocab == 30 and emb.offsets == {"a": 0, "b": 10}
    params = emb.init(rng)
    assert params["packed"].shape == (30, 4)

    x = {
        "a": jnp.array([0, 1, 2]),
        "b": jnp.array([5, 6, 7]),
        "b_alias": jnp.array([5, 0, 1]),
        "d": jnp.array([1.5, 2.5, 3.5]),
    }
    out = emb.apply(params, x, feats, squeeze_dim=True)
    assert out.shape == (3, 3 * 4 + 1)
    # alias shares the owner's rows
    np.testing.assert_allclose(out[0, 4:8], out[0, 8:12], rtol=1e-6)
    # dense passthrough rides last
    np.testing.assert_allclose(out[:, -1], np.array([1.5, 2.5, 3.5]))

    out3d = emb.apply(params, x, feats[:3], squeeze_dim=False)
    assert out3d.shape == (3, 3, 4)


def test_embedding_sequence_pooling(rng):
    feats = [SequenceFeature("s", vocab_size=10, embed_dim=4, pooling="mean")]
    emb = EmbeddingCollection(feats)
    params = emb.init(rng)
    # second row has one padding (-1) entry -> mean over 2 items
    x = {"s": jnp.array([[1, 2, 3], [4, 5, -1]])}
    out = emb.apply(params, x, feats, squeeze_dim=True)
    table = params["packed"]
    exp0 = (table[1] + table[2] + table[3]) / 3
    # reference gathers padding ids too (ids clip/wrap), but masks them out of
    # the sum; -1 wraps to the last row in jax, which the mask zeroes.
    exp1 = (table[4] + table[5]) / 2
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(exp0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(exp1), atol=1e-6)


def test_batchnorm_torch_semantics(rng):
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(32, 5)).astype(np.float32)
    params, state = batchnorm_init(5)
    y, new_state = batchnorm_apply(params, state, jnp.asarray(x), train=True)

    bn = torch.nn.BatchNorm1d(5)
    bn.train()
    yt = bn(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["mean"]), bn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state["var"]), bn.running_var.numpy(), atol=1e-5
    )

    # eval mode uses running stats
    bn.eval()
    y2, _ = batchnorm_apply(params, new_state, jnp.asarray(x), train=False)
    yt2 = bn(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y2), yt2, atol=1e-5)


def test_dice_matches_reference_math():
    torch = pytest.importorskip("torch")
    act = activation("dice")
    params = {"alpha": jnp.array([0.3], dtype=jnp.float32)}
    x = np.random.default_rng(1).normal(size=(8, 6)).astype(np.float32)
    y = act.apply(params, jnp.asarray(x))

    # reference math (activation.py:16-25)
    xt = torch.tensor(x)
    avg = xt.mean(dim=1, keepdim=True)
    var = (torch.pow(xt - avg, 2) + 1e-3).sum(dim=1, keepdim=True)
    ps = torch.sigmoid((xt - avg) / torch.sqrt(var))
    expected = ps * xt + (1 - ps) * 0.3 * xt
    np.testing.assert_allclose(np.asarray(y), expected.numpy(), atol=1e-6)


def test_mlp_shapes_and_state(rng):
    mlp = MLP(12, dims=[8, 4], output_layer=True)
    params, state = mlp.init(rng)
    x = jnp.ones((16, 12))
    y, new_state = mlp.apply(params, state, x, train=True)
    assert y.shape == (16, 1)
    # BN state updated in train mode
    assert not np.allclose(np.asarray(new_state["layers"][0]["mean"]), 0.0)
    y2, s2 = mlp.apply(params, new_state, x, train=False)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.allclose(a, b), s2, new_state)
    )


def test_stacked_mlp_equals_loop(rng):
    mlp = MLP(6, dims=[5], output_layer=True)
    stacked_p, stacked_s = stacked_mlp_init(mlp, rng, 3)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(10, 6)).astype(np.float32))
    ys, _ = stacked_mlp_apply(mlp, stacked_p, stacked_s, x, train=False)
    assert ys.shape == (3, 10, 1)
    # member d of the stack == applying member d's params alone
    for d in range(3):
        p_d = jax.tree_util.tree_map(lambda a: a[d], stacked_p)
        s_d = jax.tree_util.tree_map(lambda a: a[d], stacked_s)
        y_d, _ = mlp.apply(p_d, s_d, x, train=False)
        np.testing.assert_allclose(np.asarray(ys[d]), np.asarray(y_d), atol=1e-6)


def test_domain_select_matches_where_loop():
    ys = jnp.asarray(np.random.default_rng(3).normal(size=(3, 7, 1)).astype(np.float32))
    domain_id = jnp.array([0, 1, 2, 0, 1, 2, 1])
    got = domain_select(ys, domain_id)
    # reference idiom: final = where(mask_d, y_d, final) over d
    final = np.zeros((7, 1), np.float32)
    for d in range(3):
        m = (np.asarray(domain_id) == d)[:, None]
        final = np.where(m, np.asarray(ys[d]), final)
    np.testing.assert_allclose(np.asarray(got), final[:, 0], atol=1e-7)
