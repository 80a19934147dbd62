"""M2M: meta-attention + meta-tower over transformer-mixed features.

TPU-native rebuild of reference m2m.py:6-70:

- the flat embedding goes through a full Transformer called as
  ``transformer(emb, emb)`` on a 2-D tensor — torch's *unbatched
  length-B-sequence* semantics, i.e. attention ACROSS batch examples
  (m2m.py:48). Reproduced exactly via ops/transformer.py;
- 4 expert MLPs (leakyrelu) on the transformer output;
- meta-attention: per-example attention weight matrix and bias *generated*
  from the scenario embedding by hyper-MLPs (m2m.py:55-62), scoring each
  expert's concat([expert_out, task_out]);
- meta-tower: generated weight/bias + residual (m2m.py:65-67);
- output MLP [64, 32] -> sigmoid. No mask-select: scenario conditioning is
  entirely via the scenario embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, stacked_mlp_apply, stacked_mlp_init
from ..ops.transformer import Transformer
from .base import Model, split_rng


class M2M(Model):
    def __init__(self, features, domain_feature, domain_num: int,
                 num_experts: int = 4, expert_output_size: int = 16,
                 transformer_dims=None):
        if transformer_dims is None:
            transformer_dims = {"num_encoder_layers": 2, "num_decoder_layers": 2,
                                "dim_feedforward": 16}
        self.features = tuple(features)
        self.domain_feature = tuple(domain_feature)
        self.embedding = EmbeddingCollection(features)
        self.input_dim = sum_embed_dims(features)
        self.num_experts = num_experts
        self.E = expert_output_size
        self.domain_num = domain_num
        self.transformer = Transformer(d_model=self.input_dim, nhead=4,
                                       **transformer_dims)
        E = self.E
        dd = domain_feature[0].embed_dim
        self.expert = MLP(self.input_dim, output_layer=False, dims=[E],
                          activation="leakyrelu")
        self.task_mlp = MLP(dd, output_layer=False, dims=[E],
                            activation="leakyrelu")
        self.scenario_mlp = MLP(dd, output_layer=False, dims=[E],
                                activation="leakyrelu")
        self.vw_mlp = MLP(E, output_layer=False, dims=[4 * E * E],
                          activation="leakyrelu")
        self.vb_mlp = MLP(E, output_layer=False, dims=[2 * E],
                          activation="leakyrelu")
        self.tower_w_mlp = MLP(E, output_layer=False, dims=[E * E],
                               activation="leakyrelu")
        self.tower_b_mlp = MLP(E, output_layer=False, dims=[E],
                               activation="leakyrelu")
        self.output_mlp = MLP(E, dims=[64, 32])

    def init(self, rng):
        names = ["task", "scenario", "vw", "vb", "tw", "tb", "out"]
        modules = [self.task_mlp, self.scenario_mlp, self.vw_mlp, self.vb_mlp,
                   self.tower_w_mlp, self.tower_b_mlp, self.output_mlp]
        keys = jax.random.split(rng, len(names) + 3)
        params = {"embedding": self.embedding.init(keys[0]),
                  "transformer": self.transformer.init(keys[1]),
                  "v": jnp.ones((2 * self.E, 1), jnp.float32)}
        state = {}
        ep, es = stacked_mlp_init(self.expert, keys[2], self.num_experts)
        params["experts"], state["experts"] = ep, es
        for name, mod, k in zip(names, modules, keys[3:]):
            p, s = mod.init(k)
            params[name], state[name] = p, s
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        E, nE = self.E, self.num_experts
        keys = split_rng(rng, 9)
        dom_emb = self.embedding.apply(params["embedding"], x,
                                       self.domain_feature, squeeze_dim=True)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)  # [B, in]
        B = emb.shape[0]

        t_out = self.transformer.apply(params["transformer"], emb, emb, train,
                                       keys[0], w)  # [B, in] (cross-row mix;
                                                    # padded keys masked out)

        new_state = {}
        scen, new_state["scenario"] = self.scenario_mlp.apply(
            params["scenario"], state["scenario"], dom_emb, train, keys[1], w)
        task, new_state["task"] = self.task_mlp.apply(
            params["task"], state["task"], dom_emb, train, keys[2], w)
        experts, new_state["experts"] = stacked_mlp_apply(
            self.expert, params["experts"], state["experts"], t_out, train,
            keys[3], w=w)  # [nE, B, E]
        experts = experts.transpose(1, 0, 2)  # [B, nE, E]

        # meta-attention (m2m.py:55-62)
        meta_in = jnp.concatenate(
            [experts, jnp.broadcast_to(task[:, None, :], (B, nE, E))], axis=2
        )  # [B, nE, 2E]
        vw, new_state["vw"] = self.vw_mlp.apply(params["vw"], state["vw"],
                                                scen, train, keys[4], w)
        meta_w = vw.reshape(B, 2 * E, 2 * E)
        vb, new_state["vb"] = self.vb_mlp.apply(params["vb"], state["vb"],
                                                scen, train, keys[5], w)
        meta = jnp.einsum("bne,bef->bnf", meta_in, meta_w) + vb[:, None, :]
        meta = jnp.where(meta >= 0, meta, 0.1 * meta)  # LeakyReLU(0.1)
        meta = jnp.einsum("bnf,fo->bno", meta, params["v"])[..., 0]  # [B, nE]
        alpha = jax.nn.softmax(meta, axis=1)
        rt = jnp.einsum("bn,bne->be", alpha, experts)  # [B, E]

        # meta-tower (m2m.py:65-67)
        tw, new_state["tw"] = self.tower_w_mlp.apply(params["tw"], state["tw"],
                                                     scen, train, keys[6], w)
        tb, new_state["tb"] = self.tower_b_mlp.apply(params["tb"], state["tb"],
                                                     scen, train, keys[7], w)
        tower_w = tw.reshape(B, E, E)
        h = jnp.einsum("be,bef->bf", rt, tower_w) + tb + rt
        h = jnp.where(h >= 0, h, 0.1 * h)

        y, new_state["out"] = self.output_mlp.apply(params["out"], state["out"],
                                                    h, train, keys[8], w)
        return jax.nn.sigmoid(y)[:, 0], new_state

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward: transformer in XLA (cross-example attention is
        batch-global), everything after it in ONE Pallas kernel — equal to
        ``apply(train=False)`` up to float reassociation in the generated-
        weight contractions (BN folded; ops/pallas/m2m_infer.py)."""
        from ..ops.pallas.folding import fold_stacked_mlp_eval
        from ..ops.pallas.m2m_infer import m2m_fused_infer

        for mod in (self.expert, self.task_mlp, self.scenario_mlp,
                    self.vw_mlp, self.vb_mlp, self.tower_w_mlp,
                    self.tower_b_mlp):
            assert mod.act.name == "leakyrelu"
        assert self.output_mlp.act.name == "relu" and \
            self.output_mlp.output_layer

        dom_emb = self.embedding.apply(params["embedding"], x,
                                       self.domain_feature, squeeze_dim=True)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        t_out = self.transformer.apply(params["transformer"], emb, emb,
                                       train=False, rng=None, w=w)

        def fold(name):
            stages, head = fold_stacked_mlp_eval(params[name], state[name])
            return stages, head

        expert_stages, _ = fold_stacked_mlp_eval(params["experts"],
                                                 state["experts"])
        task_stages, _ = fold("task")
        scen_stages, _ = fold("scenario")
        vw_stages, _ = fold("vw")
        vb_stages, _ = fold("vb")
        tw_stages, _ = fold("tw")
        tb_stages, _ = fold("tb")
        out_stages, out_head = fold("out")
        return m2m_fused_infer(
            t_out, dom_emb, expert_stages, task_stages, scen_stages,
            vw_stages, vb_stages, tw_stages, tb_stages, params["v"],
            out_stages, out_head, E=self.E)
