"""SAR-Net: per-domain scale/shift + shared/specific debias experts + gate.

TPU-native rebuild of reference sarnet.py:8-93:
- per-domain elementwise scale (xavier-uniform [1, in]) + shift (U(0,1) [in])
  of the embedding (sarnet.py:70-71);
- DebiasExpertNet = BatchNorm1d -> Linear(in, 16) (sarnet.py:13-21);
  8 shared experts on the per-row-selected scaled embedding, 2 specific
  experts per domain on each domain's scaled embedding (selected after —
  BN batch stats differ per domain branch, so compute-then-select is the
  faithful order);
- gate = softmax(Linear(in, 10)) on the selected embedding (sarnet.py:89);
- weighted expert sum -> MLP[32, 32] -> sigmoid (sarnet.py:90-93).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import init as initializers
from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, batchnorm_apply, batchnorm_init, linear_apply, linear_init
from .base import Model, domain_ids, split_rng


class _DebiasExpert:
    """BN(in) -> Linear(in, 16) (sarnet.py:13-21)."""

    def __init__(self, input_dim: int, out_dim: int = 16):
        self.input_dim = input_dim
        self.out_dim = out_dim

    def init(self, rng):
        bn_p, bn_s = batchnorm_init(self.input_dim)
        return {"bn": bn_p, "lin": linear_init(rng, self.input_dim, self.out_dim)}, \
               {"bn": bn_s}

    def apply(self, params, state, x, train, w=None):
        h, bn_s = batchnorm_apply(params["bn"], state["bn"], x, train, w)
        return linear_apply(params["lin"], h), {"bn": bn_s}


class Sarnet(Model):
    def __init__(self, features, domain_num: int,
                 domain_shared_expert_num: int = 8,
                 domain_specific_expert_num: int = 2):
        self.features = tuple(features)
        self.embedding = EmbeddingCollection(features)
        self.input_dim = sum_embed_dims(features)
        self.domain_num = domain_num
        self.n_shared = domain_shared_expert_num
        self.n_spec = domain_specific_expert_num
        self.expert = _DebiasExpert(self.input_dim)
        self.final_mlp = MLP(16, output_layer=True, dims=[32, 32])

    def init(self, rng):
        D = self.domain_num
        ke, kw, kb, ksh, ksp, kg, kf = jax.random.split(rng, 7)
        xavier = initializers.xavier_uniform()
        uniform01 = initializers.random_uniform(0.0, 1.0)
        dom_w = jax.vmap(lambda k: xavier(k, (1, self.input_dim)))(
            jax.random.split(kw, D)
        )[:, 0, :]  # [D, in]
        dom_b = jax.vmap(lambda k: uniform01(k, (self.input_dim,)))(
            jax.random.split(kb, D)
        )
        shared_p, shared_s = jax.vmap(self.expert.init)(
            jax.random.split(ksh, self.n_shared)
        )
        spec_keys = jax.random.split(ksp, D * self.n_spec).reshape(D, self.n_spec, -1)
        spec_p, spec_s = jax.vmap(jax.vmap(self.expert.init))(spec_keys)
        gate = linear_init(kg, self.input_dim, self.n_shared + self.n_spec)
        final_p, final_s = self.final_mlp.init(kf)
        params = {"embedding": self.embedding.init(ke), "dom_w": dom_w,
                  "dom_b": dom_b, "shared": shared_p, "spec": spec_p,
                  "gate": gate, "final": final_p}
        state = {"shared": shared_s, "spec": spec_s, "final": final_s}
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)  # [B, in]
        kf, = split_rng(rng, 1)
        D = self.domain_num

        scaled = emb[None] * params["dom_w"][:, None, :] + params["dom_b"][:, None, :]
        # per-row scaled embedding for the row's own domain (sarnet.py:79-81)
        onehot = jax.nn.one_hot(jnp.clip(did, 0, D - 1), D, dtype=emb.dtype)
        shared_emb = jnp.einsum("bd,dbi->bi", onehot, scaled)

        shared_fn = lambda p, s: self.expert.apply(p, s, shared_emb, train, w)
        shared_out, shared_s = jax.vmap(shared_fn)(params["shared"], state["shared"])
        # [n_shared, B, 16]

        def spec_domain(p, s, xi):
            fn = lambda pp, ss: self.expert.apply(pp, ss, xi, train, w)
            return jax.vmap(fn)(p, s)

        spec_out, spec_s = jax.vmap(spec_domain)(params["spec"], state["spec"],
                                                 scaled)  # [D, n_spec, B, 16]
        spec_sel = jnp.einsum("bd,debo->ebo", onehot, spec_out)  # [n_spec, B, 16]

        expert_out = jnp.concatenate([shared_out, spec_sel], axis=0)  # [E, B, 16]
        gate = jax.nn.softmax(linear_apply(params["gate"], shared_emb), axis=-1)
        mixed = jnp.einsum("be,ebo->bo", gate, expert_out)  # [B, 16]

        y, final_s = self.final_mlp.apply(params["final"], state["final"], mixed,
                                          train, kf, w)
        probs = jax.nn.sigmoid(y)[:, 0]
        return probs, {"shared": shared_s, "spec": spec_s, "final": final_s}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused kernel — numerically equal
        to ``apply(train=False)`` (debias-expert BN→Linear folded by
        folding.fold_bn_linear_eval; ops/pallas/sarnet_infer.py)."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.folding import (fold_bn_linear_eval,
                                          fold_stacked_mlp_eval)
        from ..ops.pallas.sarnet_infer import sarnet_fused_infer

        assert self.final_mlp.act.name == "relu"
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        shared = fold_bn_linear_eval(params["shared"]["bn"],
                                     state["shared"]["bn"],
                                     params["shared"]["lin"])
        spec = fold_bn_linear_eval(params["spec"]["bn"], state["spec"]["bn"],
                                   params["spec"]["lin"])
        final_stages, final_out = fold_stacked_mlp_eval(params["final"],
                                                        state["final"])
        return sarnet_fused_infer(
            emb, did, params["dom_w"], params["dom_b"], shared, spec,
            (params["gate"]["w"], params["gate"]["b"]),
            final_stages, final_out,
        )
