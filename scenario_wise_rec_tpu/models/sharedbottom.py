"""SharedBottom: shared bottom MLP -> per-domain tower MLPs.

TPU-native rebuild of reference sharebottom.py:6-50. The reference's
per-domain tower loop (sharebottom.py:37-45) becomes one stacked
``[D, B, 1]`` tower computation; the ``torch.where`` mask chain
(sharebottom.py:47-50) becomes a per-row gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, stacked_mlp_apply, stacked_mlp_init
from ..ops.select import domain_select
from .base import Model, domain_ids, split_rng


class SharedBottom(Model):
    def __init__(self, features, domain_num: int, bottom_params: dict,
                 tower_params: dict):
        self.features = tuple(features)
        self.domain_num = domain_num
        self.embedding = EmbeddingCollection(features)
        self.bottom_dims = sum_embed_dims(features)
        self.bottom_mlp = MLP(
            self.bottom_dims, **{**bottom_params, "output_layer": False}
        )
        self.tower = MLP(bottom_params["dims"][-1], **tower_params)

    def init(self, rng):
        ke, kb, kt = jax.random.split(rng, 3)
        bottom_p, bottom_s = self.bottom_mlp.init(kb)
        towers_p, towers_s = stacked_mlp_init(self.tower, kt, self.domain_num)
        params = {"embedding": self.embedding.init(ke), "bottom": bottom_p,
                  "towers": towers_p}
        state = {"bottom": bottom_s, "towers": towers_s}
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        kb, kt = split_rng(rng, 2)
        h, bottom_s = self.bottom_mlp.apply(params["bottom"], state["bottom"],
                                            emb, train, kb, w)
        ys, towers_s = stacked_mlp_apply(self.tower, params["towers"],
                                         state["towers"], h, train, kt, w=w)
        probs = jax.nn.sigmoid(ys)  # [D, B, 1]
        out = domain_select(probs, did)
        return out, {"bottom": bottom_s, "towers": towers_s}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward via the Pallas fused trunk→towers kernel
        (ops/pallas/tower_infer.py); numerically equivalent to
        ``apply(train=False)`` with BatchNorm constant-folded."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.folding import fold_stacked_mlp_eval
        from ..ops.pallas.tower_infer import trunk_towers_fused_infer

        assert self.bottom_mlp.act.name == "relu"
        assert self.tower.act.name == "relu"
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        trunk, _ = fold_stacked_mlp_eval(params["bottom"], state["bottom"])
        towers, tower_out = fold_stacked_mlp_eval(params["towers"],
                                                  state["towers"])
        return trunk_towers_fused_infer(emb, did, trunk, towers, tower_out)
