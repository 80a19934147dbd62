"""PLE: stacked CGC layers with domain-specific + shared experts.

TPU-native rebuild of reference ple.py:13-137. Per-domain specific experts
become a doubly-stacked ``[D, n_spec]`` MLP bank (two nested vmaps -> one
batched matmul per layer); gates and shared experts are stacked banks; the
gate-weighted pooling is an einsum. Inputs fan through levels exactly as the
reference (ple.py:44-48): each level consumes ``domain_num + 1`` input
streams (per-domain + shared).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, stacked_mlp_apply, stacked_mlp_init
from ..ops.select import domain_select
from .base import Model, domain_ids, split_rng


class PLE(Model):
    def __init__(self, features, domain_num: int, n_level: int,
                 n_expert_specific: int, n_expert_shared: int,
                 expert_params: dict, tower_params: dict):
        self.features = tuple(features)
        self.domain_num = domain_num
        self.n_level = n_level
        self.n_spec = n_expert_specific
        self.n_shared = n_expert_shared
        self.embedding = EmbeddingCollection(features)
        self.input_dims = sum_embed_dims(features)
        self.expert_params = dict(expert_params)
        h = expert_params["dims"][-1]
        # per-level expert/gate modules (level 1 reads the embedding,
        # deeper levels read the previous level's expert width, ple.py:89)
        self.levels = []
        for lvl in range(n_level):
            in_dim = self.input_dims if lvl == 0 else h
            expert = MLP(in_dim, output_layer=False, **expert_params)
            gate = MLP(in_dim, output_layer=False,
                       dims=[self.n_spec + self.n_shared], activation="softmax")
            n_all = self.n_spec * domain_num + self.n_shared
            gate_shared = (
                MLP(in_dim, output_layer=False, dims=[n_all], activation="softmax")
                if lvl < n_level - 1 else None
            )
            self.levels.append((expert, gate, gate_shared))
        self.tower = MLP(h, output_layer=True, **tower_params)

    # -- helpers for the [D, n_spec] doubly-stacked expert bank -----------

    def _spec_init(self, expert: MLP, rng):
        keys = jax.random.split(rng, self.domain_num * self.n_spec).reshape(
            self.domain_num, self.n_spec, -1
        )
        return jax.vmap(jax.vmap(expert.init))(keys)

    def _spec_apply(self, expert: MLP, params, state, x_domains, train, rng,
                    w=None):
        """x_domains: [D, B, in] -> outs [D, n_spec, B, H]."""
        if rng is None:
            keys = None
            axes = (0, 0, 0, None)
        else:
            keys = jax.random.split(rng, self.domain_num * self.n_spec).reshape(
                self.domain_num, self.n_spec, -1
            )
            axes = (0, 0, 0, 0)

        def per_expert(p, s, x, k):
            return expert.apply(p, s, x, train, k, w)

        def per_domain(p, s, x, k):
            in2 = (0, 0, None, None if k is None else 0)
            return jax.vmap(per_expert, in_axes=in2)(p, s, x, k)

        return jax.vmap(per_domain, in_axes=axes)(params, state, x_domains, keys)

    def init(self, rng):
        keys = jax.random.split(rng, 2 + 4 * self.n_level)
        params = {"embedding": self.embedding.init(keys[0]), "levels": []}
        state = {"levels": []}
        for lvl, (expert, gate, gate_shared) in enumerate(self.levels):
            ks, ksh, kg, kgs = keys[2 + 4 * lvl : 6 + 4 * lvl]
            spec_p, spec_s = self._spec_init(expert, ks)
            shared_p, shared_s = stacked_mlp_init(expert, ksh, self.n_shared)
            gates_p, gates_s = stacked_mlp_init(gate, kg, self.domain_num)
            lp = {"spec": spec_p, "shared": shared_p, "gates": gates_p}
            ls = {"spec": spec_s, "shared": shared_s, "gates": gates_s}
            if gate_shared is not None:
                gs_p, gs_s = gate_shared.init(kgs)
                lp["gate_shared"], ls["gate_shared"] = gs_p, gs_s
            params["levels"].append(lp)
            state["levels"].append(ls)
        towers_p, towers_s = stacked_mlp_init(self.tower, keys[1], self.domain_num)
        params["towers"], state["towers"] = towers_p, towers_s
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        keys = split_rng(rng, self.n_level * 4 + 1)
        D = self.domain_num

        # ple_inputs: [D+1, B, in] — same embedding fanned out (ple.py:46)
        inputs = jnp.broadcast_to(emb[None], (D + 1,) + emb.shape)
        new_state = {"levels": []}
        for lvl, (expert, gate, gate_shared) in enumerate(self.levels):
            lp, ls = params["levels"][lvl], state["levels"][lvl]
            ks, ksh, kg, kgs = keys[4 * lvl : 4 * lvl + 4]
            spec_outs, spec_s = self._spec_apply(
                expert, lp["spec"], ls["spec"], inputs[:D], train, ks, w
            )  # [D, n_spec, B, H]
            shared_outs, shared_s = stacked_mlp_apply(
                expert, lp["shared"], ls["shared"], inputs[D], train, ksh, w=w
            )  # [n_shared, B, H]
            gate_outs, gates_s = stacked_mlp_apply(
                gate, lp["gates"], ls["gates"], inputs[:D], train, kg,
                per_member_x=True, w=w,
            )  # [D, B, n_spec + n_shared] (softmax over experts)

            # per-domain expert set: own specifics then shared (ple.py:121-128)
            shared_b = jnp.broadcast_to(
                shared_outs[None], (D,) + shared_outs.shape
            )  # [D, n_shared, B, H]
            experts_d = jnp.concatenate([spec_outs, shared_b], axis=1)
            cgc_outs = jnp.einsum("dbe,debh->dbh", gate_outs, experts_d)

            new_ls = {"spec": spec_s, "shared": shared_s, "gates": gates_s}
            if gate_shared is not None:
                gs_out, gs_s = gate_shared.apply(
                    lp["gate_shared"], ls["gate_shared"], inputs[D], train, kgs, w
                )  # [B, n_all]
                all_experts = jnp.concatenate(
                    [spec_outs.reshape(-1, *spec_outs.shape[2:]), shared_outs],
                    axis=0,
                )  # [n_all, B, H]
                shared_next = jnp.einsum("be,ebh->bh", gs_out, all_experts)
                new_ls["gate_shared"] = gs_s
                inputs = jnp.concatenate([cgc_outs, shared_next[None]], axis=0)
            else:
                # last level: towers only read the per-domain streams
                inputs = jnp.concatenate(
                    [cgc_outs, jnp.zeros_like(cgc_outs[:1])], axis=0
                )
            new_state["levels"].append(new_ls)

        ys, towers_s = stacked_mlp_apply(
            self.tower, params["towers"], state["towers"], inputs[:D], train,
            keys[-1], per_member_x=True, w=w,
        )  # [D, B, 1]
        new_state["towers"] = towers_s
        return domain_select(jax.nn.sigmoid(ys), did), new_state

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward via the Pallas fused CGC kernel
        (ops/pallas/ple_infer.py); numerically equivalent to
        ``apply(train=False)`` with BatchNorm constant-folded."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.folding import fold_stacked_mlp_eval
        from ..ops.pallas.ple_infer import LevelSpec, ple_fused_infer

        assert self.tower.act.name == "relu"
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        level_specs = []
        for lvl, (expert, gate, gate_shared) in enumerate(self.levels):
            assert expert.act.name == "relu" and gate.act.name == "softmax"
            lp, ls = params["levels"][lvl], state["levels"][lvl]
            spec, _ = fold_stacked_mlp_eval(lp["spec"], ls["spec"])
            shared, _ = fold_stacked_mlp_eval(lp["shared"], ls["shared"])
            gates, _ = fold_stacked_mlp_eval(lp["gates"], ls["gates"])
            gs = None
            if gate_shared is not None:
                assert gate_shared.act.name == "softmax"
                gs, _ = fold_stacked_mlp_eval(lp["gate_shared"],
                                              ls["gate_shared"])
            level_specs.append(LevelSpec(spec, shared, gates, gs))
        towers, tower_out = fold_stacked_mlp_eval(params["towers"],
                                                  state["towers"])
        return ple_fused_infer(emb, did, level_specs, towers, tower_out)
