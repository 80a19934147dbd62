"""M2M parity: our Transformer replica + the full model vs torch."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scenario_wise_rec_tpu.core import SparseFeature  # noqa: E402
from scenario_wise_rec_tpu.models import M2M  # noqa: E402
from scenario_wise_rec_tpu.ops.transformer import Transformer  # noqa: E402

import scenario_wise_rec.basic.features as rf  # noqa: E402
import scenario_wise_rec.models.multi_domain as rm  # noqa: E402

from test_torch_parity import (  # noqa: E402
    set_embeddings,
    set_linear,
    set_ln,
    set_mlp,
    t,
)


def transplant_transformer(ref: "torch.nn.Transformer", params, n_enc, n_dec):
    for i in range(n_enc):
        lay = ref.encoder.layers[i]
        p = params["enc"][i]
        lay.self_attn.in_proj_weight.data = t(p["attn"]["in_w"])
        lay.self_attn.in_proj_bias.data = t(p["attn"]["in_b"])
        lay.self_attn.out_proj.weight.data = t(p["attn"]["out_w"])
        lay.self_attn.out_proj.bias.data = t(p["attn"]["out_b"])
        set_linear(lay.linear1, p["ff"]["l1"])
        set_linear(lay.linear2, p["ff"]["l2"])
        set_ln(lay.norm1, p["norm1"])
        set_ln(lay.norm2, p["norm2"])
    for i in range(n_dec):
        lay = ref.decoder.layers[i]
        p = params["dec"][i]
        lay.self_attn.in_proj_weight.data = t(p["self_attn"]["in_w"])
        lay.self_attn.in_proj_bias.data = t(p["self_attn"]["in_b"])
        lay.self_attn.out_proj.weight.data = t(p["self_attn"]["out_w"])
        lay.self_attn.out_proj.bias.data = t(p["self_attn"]["out_b"])
        lay.multihead_attn.in_proj_weight.data = t(p["cross_attn"]["in_w"])
        lay.multihead_attn.in_proj_bias.data = t(p["cross_attn"]["in_b"])
        lay.multihead_attn.out_proj.weight.data = t(p["cross_attn"]["out_w"])
        lay.multihead_attn.out_proj.bias.data = t(p["cross_attn"]["out_b"])
        set_linear(lay.linear1, p["ff"]["l1"])
        set_linear(lay.linear2, p["ff"]["l2"])
        set_ln(lay.norm1, p["norm1"])
        set_ln(lay.norm2, p["norm2"])
        set_ln(lay.norm3, p["norm3"])
    set_ln(ref.encoder.norm, params["enc_norm"])
    set_ln(ref.decoder.norm, params["dec_norm"])


def test_transformer_matches_torch(rng, np_rng):
    ours = Transformer(d_model=16, nhead=4, num_encoder_layers=2,
                       num_decoder_layers=2, dim_feedforward=16)
    params = ours.init(rng)
    ref = torch.nn.Transformer(d_model=16, nhead=4, num_encoder_layers=2,
                               num_decoder_layers=2, dim_feedforward=16)
    transplant_transformer(ref, params, 2, 2)
    ref.eval()
    x = np_rng.normal(size=(10, 16)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x), torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_m2m_full_parity(rng, np_rng):
    B, D_NUM, VOCAB = 16, 3, 11
    sparse = [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=8)
              for i in range(3)]
    sce = [SparseFeature("domain_indicator", vocab_size=D_NUM, embed_dim=8)]
    r_sparse = [rf.SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=8)
                for i in range(3)]
    r_sce = [rf.SparseFeature("domain_indicator", vocab_size=D_NUM,
                              embed_dim=8)]
    ours = M2M(sparse + sce, sce, D_NUM, num_experts=4, expert_output_size=16)
    params, state = jax.jit(ours.init)(rng)
    ref = rm.M2M(r_sparse + r_sce, r_sce, D_NUM, num_experts=4,
                 expert_output_size=16)
    set_embeddings(ref.embedding, ours.embedding, params["embedding"])
    transplant_transformer(ref.transformer, params["transformer"], 2, 2)
    for i in range(4):
        e = jax.tree_util.tree_map(lambda a: a[i], params["experts"])
        set_mlp(ref.experts[i], e)
    set_mlp(ref.task_mlp, params["task"])
    set_mlp(ref.scenario_mlp, params["scenario"])
    set_mlp(ref.vw_mlp, params["vw"])
    set_mlp(ref.vb_mlp, params["vb"])
    set_mlp(ref.meta_tower_w_mlp, params["tw"])
    set_mlp(ref.meta_tower_b_mlp, params["tb"])
    set_mlp(ref.output_mlp, params["out"])
    ref.v.data = t(params["v"])

    x = {f"s{i}": np_rng.integers(0, VOCAB, B) for i in range(3)}
    x["domain_indicator"] = np_rng.integers(0, D_NUM, B)
    xj = {k: jnp.asarray(v) for k, v in x.items()}
    xt = {k: torch.tensor(v) for k, v in x.items()}
    ref.eval()
    with torch.no_grad():
        expected = ref(xt).numpy()
    fwd = jax.jit(lambda p, s, xx: ours.apply(p, s, xx, train=False)[0])
    got = np.asarray(fwd(params, state, xj))
    np.testing.assert_allclose(got, expected, atol=3e-5, rtol=1e-4)
