"""MMOE: shared experts + per-domain softmax gates + per-domain towers.

TPU-native rebuild of reference mmoe.py:6-56. Experts and gates each become a
stacked MLP bank (one ``[n, B, ·]`` batched matmul per layer on the MXU); the
gate-weighted expert mixture is one einsum; towers + mask-select collapse to a
stacked tower bank + per-row gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import config as compute_config

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, stacked_mlp_apply, stacked_mlp_init
from ..ops.select import domain_select
from .base import Model, domain_ids, split_rng


class MMOE(Model):
    def __init__(self, features, domain_num: int, n_expert: int,
                 expert_params: dict, tower_params: dict):
        self.features = tuple(features)
        self.domain_num = domain_num
        self.n_expert = n_expert
        self.embedding = EmbeddingCollection(features)
        self.input_dims = sum_embed_dims(features)
        self.expert = MLP(self.input_dims, output_layer=False, **expert_params)
        # gate = MLP(input, dims=[n_expert], activation=softmax, no out layer)
        # (mmoe.py:26-30)
        self.gate = MLP(self.input_dims, output_layer=False,
                        dims=[n_expert], activation="softmax")
        self.tower = MLP(expert_params["dims"][-1], **tower_params)

    def init(self, rng):
        ke, kx, kg, kt = jax.random.split(rng, 4)
        experts_p, experts_s = stacked_mlp_init(self.expert, kx, self.n_expert)
        gates_p, gates_s = stacked_mlp_init(self.gate, kg, self.domain_num)
        towers_p, towers_s = stacked_mlp_init(self.tower, kt, self.domain_num)
        params = {"embedding": self.embedding.init(ke), "experts": experts_p,
                  "gates": gates_p, "towers": towers_p}
        state = {"experts": experts_s, "gates": gates_s, "towers": towers_s}
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        kx, kg, kt = split_rng(rng, 3)

        expert_outs, experts_s = stacked_mlp_apply(
            self.expert, params["experts"], state["experts"], emb, train, kx,
            w=w
        )  # [E, B, H]
        gate_outs, gates_s = stacked_mlp_apply(
            self.gate, params["gates"], state["gates"], emb, train, kg, w=w
        )  # [D, B, E] (softmax over E)

        # per-domain mixture: sum_e gate[d,b,e] * expert[e,b,h] (mmoe.py:48-49)
        mixed = compute_config.einsum("dbe,ebh->dbh", gate_outs, expert_outs)

        ys, towers_s = stacked_mlp_apply(
            self.tower, params["towers"], state["towers"], mixed, train, kt,
            per_member_x=True, w=w,
        )  # [D, B, 1]
        out = domain_select(jax.nn.sigmoid(ys), did)
        return out, {"experts": experts_s, "gates": gates_s, "towers": towers_s}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused inference kernel.

        Numerically equivalent to ``apply(train=False)`` (BatchNorm folded
        into the affines — ops/pallas/folding.py); the entire post-embedding
        stack runs in ONE kernel out of VMEM (ops/pallas/mmoe_infer.py).
        """
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.folding import fold_stacked_mlp_eval
        from ..ops.pallas.mmoe_infer import mmoe_fused_infer

        assert self.expert.act.name == "relu" and self.tower.act.name == "relu"
        assert self.gate.act.name == "softmax"
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        expert_stages, _ = fold_stacked_mlp_eval(params["experts"],
                                                 state["experts"])
        gate_stages, _ = fold_stacked_mlp_eval(params["gates"], state["gates"])
        tower_stages, tower_out = fold_stacked_mlp_eval(params["towers"],
                                                        state["towers"])
        return mmoe_fused_infer(emb, did, expert_stages, gate_stages[0],
                                tower_stages, tower_out)
