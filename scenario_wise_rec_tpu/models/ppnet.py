"""PPNet: per-domain towers with GateNU-modulated hidden layers.

TPU-native rebuild of reference ppnet.py:9-67:
- gate input = id-feature embedding ‖ stop-gradient agnostic embedding
  (ppnet.py:52-54);
- each tower layer: ``hidden = MLP_i(hidden) * GateNU_i(gate_input)``
  (ppnet.py:21-29) — QUIRK PRESERVED: the tower's *input* stream is the
  gate_input embedding, not the agnostic embedding (ppnet.py:22), so the
  ``agn_emb`` argument only reaches the model through the detached half of
  the gate input;
- D towers stacked on a leading domain axis + per-row select
  (ppnet.py:58-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, GateNU, linear_apply, linear_init
from ..ops.select import domain_select
from .base import Model, domain_ids, split_rng


class _PPTowerBlock:
    """One domain tower (ppnet.py:9-30)."""

    def __init__(self, input_dim: int, fcn_dims):
        self.dims = [input_dim] + list(fcn_dims)
        self.mlps = [
            MLP(self.dims[i], dims=[self.dims[i + 1]], output_layer=False)
            for i in range(len(self.dims) - 1)
        ]
        self.gates = [
            GateNU(self.dims[0], self.dims[i + 1])
            for i in range(len(self.dims) - 1)
        ]

    def init(self, rng):
        n = len(self.mlps)
        keys = jax.random.split(rng, 2 * n + 1)
        params = {"mlps": [], "gates": [], "final": None}
        state = {"mlps": []}
        for i in range(n):
            mp, ms = self.mlps[i].init(keys[2 * i])
            params["mlps"].append(mp)
            state["mlps"].append(ms)
            params["gates"].append(self.gates[i].init(keys[2 * i + 1]))
        params["final"] = linear_init(keys[-1], self.dims[-1], 1)
        return params, state

    def apply(self, params, state, agn_emb, gate_input_emb, train, rng,
              w=None):
        hidden = gate_input_emb  # ppnet.py:22 — NOT agn_emb
        new_ms = []
        keys = split_rng(rng, len(self.mlps))
        for i in range(len(self.mlps)):
            gate_out = self.gates[i].apply(params["gates"][i], gate_input_emb)
            hidden, ms = self.mlps[i].apply(params["mlps"][i], state["mlps"][i],
                                            hidden, train, keys[i], w)
            new_ms.append(ms)
            hidden = hidden * gate_out
        y = jax.nn.sigmoid(linear_apply(params["final"], hidden))
        return y, {"mlps": new_ms}


class PPNet(Model):
    def __init__(self, id_features, agn_features, domain_num: int, fcn_dims):
        self.id_features = tuple(id_features)
        self.agn_features = tuple(agn_features)
        self.domain_num = domain_num
        self.id_embedding = EmbeddingCollection(id_features)
        self.agn_embedding = EmbeddingCollection(agn_features)
        self.id_dims = sum_embed_dims(id_features)
        self.agn_dims = sum_embed_dims(agn_features)
        self.tower = _PPTowerBlock(self.id_dims + self.agn_dims, fcn_dims)

    def init(self, rng):
        ki, ka, kt = jax.random.split(rng, 3)
        towers_p, towers_s = jax.vmap(self.tower.init)(
            jax.random.split(kt, self.domain_num)
        )
        params = {
            "id_embedding": self.id_embedding.init(ki),
            "agn_embedding": self.agn_embedding.init(ka),
            "towers": towers_p,
        }
        return params, {"towers": towers_s}

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        id_x = self.id_embedding.apply(params["id_embedding"], x,
                                       self.id_features, squeeze_dim=True)
        agn_x = self.agn_embedding.apply(params["agn_embedding"], x,
                                         self.agn_features, squeeze_dim=True)
        gate_input = jnp.concatenate([id_x, jax.lax.stop_gradient(agn_x)], axis=1)

        if rng is None:
            keys = None
            k_axis = None
        else:
            keys = jax.random.split(rng, self.domain_num)
            k_axis = 0

        def one(p, s, k):
            return self.tower.apply(p, s, agn_x, gate_input, train, k, w)

        ys, towers_s = jax.vmap(one, in_axes=(0, 0, k_axis))(
            params["towers"], state["towers"], keys
        )  # [D, B, 1]
        return domain_select(ys, did), {"towers": towers_s}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused kernel — numerically equal
        to ``apply(train=False)`` (BN folded; ops/pallas/gated_infer.py)."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.folding import fold_stacked_mlp_eval
        from ..ops.pallas.gated_infer import ppnet_fused_infer

        for mlp in self.tower.mlps:
            assert mlp.act.name == "relu"
        did = domain_ids(x)
        id_x = self.id_embedding.apply(params["id_embedding"], x,
                                       self.id_features, squeeze_dim=True)
        agn_x = self.agn_embedding.apply(params["agn_embedding"], x,
                                         self.agn_features, squeeze_dim=True)
        gate_input = jnp.concatenate([id_x, agn_x], axis=1)

        tp, ts = params["towers"], state["towers"]
        layer_stages, gate_l1s, gate_l2s = [], [], []
        for i in range(len(self.tower.mlps)):
            stages, _ = fold_stacked_mlp_eval(tp["mlps"][i], ts["mlps"][i])
            # _PPTowerBlock builds strictly single-layer MLPs per stage; the
            # fused kernel relies on that (a silent stages[0] would drop
            # layers of a future multi-layer block)
            assert len(stages) == 1, (
                f"PPNet fused kernel expects 1-layer tower stages, "
                f"got {len(stages)}")
            layer_stages.append(stages[0])
            g = tp["gates"][i]
            gate_l1s.append((g["l1"]["w"], g["l1"]["b"]))
            gate_l2s.append((g["l2"]["w"], g["l2"]["b"]))
        final = (tp["final"]["w"], tp["final"]["b"])
        return ppnet_fused_infer(gate_input, did, layer_stages, gate_l1s,
                                 gate_l2s, final,
                                 gemma=self.tower.gates[0].gemma)
