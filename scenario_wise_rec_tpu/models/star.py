"""STAR: star topology FCN with shared (x) domain-specific weights.

TPU-native rebuild of reference star.py:10-118:

- domain norm over **current-batch statistics** (star.py:95-100; used at both
  train and eval time, deliberately), with shared*specific gamma and
  shared+specific beta;
- FCN whose layer-d weight is ``W_shared ⊙ W_domain`` and bias
  ``b_shared + b_domain`` (star.py:103-107) — here one ``[D, in, out]``
  elementwise product and one ``dbi,dio->dbo`` einsum per layer;
- per-domain BatchNorm1d + ReLU after every layer including the final
  width-1 layer (star.py:109-110 — quirk preserved);
- auxiliary MLP logit added pre-sigmoid (star.py:87,117);
- kaiming-uniform W (torch fan quirk: fan taken from axis 1 of the (in,out)
  matrix), U(0,1) bias (star.py:68-76).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import config as compute_config
from ..core import init as initializers
from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import (
    MLP,
    batch_stats,
    stacked_batchnorm_apply,
    stacked_batchnorm_init,
)
from ..ops.select import domain_select
from .base import Model, domain_ids, split_rng


class Star(Model):
    def __init__(self, features, num_domains: int, fcn_dims, aux_dims):
        self.features = tuple(features)
        self.input_dim = sum_embed_dims(features)
        self.layer_num = len(fcn_dims) + 1
        self.fcn_dim = [self.input_dim] + list(fcn_dims) + [1]
        self.num_domains = num_domains
        self.embedding = EmbeddingCollection(features)
        self.auxnet = MLP(self.input_dim, dims=list(aux_dims))
        self.eps = 1e-6

    def init(self, rng):
        D = self.num_domains
        keys = jax.random.split(rng, 2 + 2 * self.layer_num)
        kaiming = initializers.kaiming_uniform_torch()
        uniform01 = initializers.random_uniform(0.0, 1.0)
        params = {
            "embedding": self.embedding.init(keys[0]),
            "dn": {
                "share_gamma": jnp.ones((self.input_dim,), jnp.float32),
                "share_beta": jnp.zeros((self.input_dim,), jnp.float32),
                "gamma": jnp.ones((D, self.input_dim), jnp.float32),
                "beta": jnp.zeros((D, self.input_dim), jnp.float32),
            },
            "fcn": {"share_w": [], "share_b": [], "dom_w": [], "dom_b": [],
                    "bn": []},
        }
        state = {"bn": []}
        for i in range(self.layer_num):
            kw, kb = jax.random.split(keys[2 + 2 * i])
            din, dout = self.fcn_dim[i], self.fcn_dim[i + 1]
            params["fcn"]["share_w"].append(kaiming(kw, (din, dout)))
            params["fcn"]["share_b"].append(uniform01(kb, (dout,)))
            kdw, kdb = jax.random.split(keys[2 + self.layer_num + i])
            dom_w = jax.vmap(lambda k: kaiming(k, (din, dout)))(
                jax.random.split(kdw, D)
            )
            dom_b = jax.vmap(lambda k: uniform01(k, (dout,)))(
                jax.random.split(kdb, D)
            )
            params["fcn"]["dom_w"].append(dom_w)
            params["fcn"]["dom_b"].append(dom_b)
            bn_p, bn_s = stacked_batchnorm_init(dout, D)
            params["fcn"]["bn"].append(bn_p)
            state["bn"].append(bn_s)
        aux_p, aux_s = self.auxnet.init(keys[1])
        params["aux"] = aux_p
        state["aux"] = aux_s
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        k_aux, = split_rng(rng, 1)
        aux_out, aux_s = self.auxnet.apply(params["aux"], state["aux"], emb,
                                           train, k_aux, w)  # [B, 1]

        # domain norm on current-batch stats (star.py:95-100); the stats are
        # computed on the same emb for every domain, so once is enough.
        # Padded (w=0) rows are excluded — the reference never sees them.
        mean, var, _ = batch_stats(emb, w)
        normed = (emb - mean) * jax.lax.rsqrt(var + self.eps)  # [B, in]
        dn = params["dn"]
        g = dn["share_gamma"][None] * dn["gamma"]  # [D, in]
        b = dn["share_beta"][None] + dn["beta"]  # [D, in]
        h = g[:, None, :] * normed[None] + b[:, None, :]  # [D, B, in]

        new_bn = []
        for i in range(self.layer_num):
            fcn = params["fcn"]
            w_eff = fcn["share_w"][i][None] * fcn["dom_w"][i]  # [D, in, out]
            bias = fcn["share_b"][i][None] + fcn["dom_b"][i]  # [D, out]
            h = compute_config.einsum("dbi,dio->dbo", h, w_eff) \
                + bias[:, None, :]
            h, bn_s = stacked_batchnorm_apply(
                fcn["bn"][i], state["bn"][i], h, train, w
            )
            new_bn.append(bn_s)
            h = jax.nn.relu(h)

        out = domain_select(h, did)  # [B]
        probs = jax.nn.sigmoid(out + aux_out[:, 0])
        return probs, {"bn": new_bn, "aux": aux_s}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused kernel — numerically equal
        to ``apply(train=False)`` (per-layer BN folded into the shared⊙domain
        affines; batch-stat domain-norm mean/rstd computed outside the kernel
        on the full batch with padded rows masked out, exactly as apply does;
        ops/pallas/star_infer.py).
        """
        from ..ops.nn import BN_EPS
        from ..ops.pallas.folding import fold_stacked_mlp_eval
        from ..ops.pallas.star_infer import star_fused_infer

        assert self.auxnet.act.name == "relu" and self.auxnet.output_layer
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        mean, var, _ = batch_stats(emb, w)
        rstd = jax.lax.rsqrt(var + self.eps)
        dn = params["dn"]
        dn_gamma = dn["share_gamma"][None] * dn["gamma"]
        dn_beta = dn["share_beta"][None] + dn["beta"]

        fcn = params["fcn"]
        fcn_stages = []
        for i in range(self.layer_num):
            w_eff = fcn["share_w"][i][None] * fcn["dom_w"][i]   # [D, in, out]
            b_eff = fcn["share_b"][i][None] + fcn["dom_b"][i]   # [D, out]
            scale = fcn["bn"][i]["gamma"] * jax.lax.rsqrt(
                state["bn"][i]["var"] + BN_EPS)                 # [D, out]
            w = w_eff * scale[:, None, :]
            b = (b_eff - state["bn"][i]["mean"]) * scale + fcn["bn"][i]["beta"]
            fcn_stages.append((w, b))
        aux_stages, aux_out = fold_stacked_mlp_eval(params["aux"],
                                                    state["aux"])
        return star_fused_infer(emb, did, mean, rstd, dn_gamma, dn_beta,
                                fcn_stages, aux_stages, aux_out)
