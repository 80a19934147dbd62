"""AdaSparse: scenario-conditioned pruning of MLP activations.

TPU-native rebuild of reference adasparse.py:14-71:
- Pruner before the MLP and after each hidden layer, multiplying activations
  by (hard-thresholded) weighting factors (adasparse.py:63-70);
- ``alpha`` annealed by ``delta_alpha`` on every forward pass under no_grad
  (adasparse.py:61-62). Here alpha is explicit carried **state**; it
  advances on train steps (the reference also advances it during eval
  passes — a documented, immaterial deviation: eval-time increments only
  nudge the sigmoid temperature schedule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import (
    Pruner,
    batchnorm_apply,
    batchnorm_init,
    dropout as dropout_fn,
    linear_apply,
    linear_init,
)
from ..core.activations import activation as activation_factory
from .base import Model, split_rng


class AdaSparse(Model):
    def __init__(self, sce_features, agn_features, mlp_params,
                 form: str = "Fusion", epsilon: float = 1e-2, beta: float = 2.0,
                 alpha: float = 1.0, delta_alpha: float = 1e-4):
        self.sce_features = tuple(sce_features)
        self.agn_features = tuple(agn_features)
        self.alpha0 = alpha
        self.delta_alpha = delta_alpha
        self.sce_dims = sum_embed_dims(sce_features)
        self.agn_dims = sum_embed_dims(agn_features)
        self.sce_embedding = EmbeddingCollection(sce_features)
        self.agn_embedding = EmbeddingCollection(agn_features)
        self.mlp_dims = list(mlp_params.get("dims") or [])
        self.act = activation_factory(mlp_params.get("activation", "relu"))
        self.dropout_p = float(mlp_params.get("dropout", 0.0))
        # pruner 0 acts on the agnostic embedding; pruner i+1 on hidden i
        self.pruners = [Pruner(self.sce_dims, self.agn_dims, form=form,
                               epsilon=epsilon, beta=beta)]
        in_dim = self.sce_dims + self.agn_dims
        self.layer_dims = []
        for d in self.mlp_dims:
            self.layer_dims.append((in_dim, d))
            in_dim = d
            self.pruners.append(Pruner(self.sce_dims, d, form=form,
                                       epsilon=epsilon, beta=beta))
        self.final_in = in_dim

    def init(self, rng):
        n_layers = len(self.layer_dims)
        keys = jax.random.split(rng, 4 + 2 * n_layers + len(self.pruners))
        params = {
            "sce_embedding": self.sce_embedding.init(keys[0]),
            "agn_embedding": self.agn_embedding.init(keys[1]),
            "layers": [],
            "pruners": [],
            "final": linear_init(keys[2], self.final_in, 1),
        }
        state = {"alpha": jnp.asarray(self.alpha0, jnp.float32), "layers": []}
        for i, (din, dout) in enumerate(self.layer_dims):
            kl, ka = jax.random.split(keys[4 + 2 * i])
            bn_p, bn_s = batchnorm_init(dout)
            params["layers"].append({
                "lin": linear_init(kl, din, dout), "bn": bn_p,
                "act": self.act.init(ka),
            })
            state["layers"].append(bn_s)
        for i, pr in enumerate(self.pruners):
            params["pruners"].append(pr.init(keys[4 + 2 * n_layers + i]))
        return params, state

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        # alpha anneal (adasparse.py:61-62), stop-gradded carried state
        alpha = jax.lax.stop_gradient(state["alpha"])
        new_alpha = alpha + self.delta_alpha if train else alpha

        sce = self.sce_embedding.apply(params["sce_embedding"], x,
                                       self.sce_features, squeeze_dim=True)
        agn = self.agn_embedding.apply(params["agn_embedding"], x,
                                       self.agn_features, squeeze_dim=True)
        agn = self.pruners[0].apply(params["pruners"][0], sce, agn, alpha) * agn
        h = jnp.concatenate([sce, agn], axis=1)

        keys = split_rng(rng, len(self.layer_dims))
        new_bn = []
        for i in range(len(self.layer_dims)):
            layer = params["layers"][i]
            h = linear_apply(layer["lin"], h)
            h, bn_s = batchnorm_apply(layer["bn"], state["layers"][i], h, train,
                                      w)
            new_bn.append(bn_s)
            h = self.act.apply(layer["act"], h)
            if self.dropout_p > 0 and train:
                h = dropout_fn(keys[i], h, self.dropout_p, train)
            h = self.pruners[i + 1].apply(params["pruners"][i + 1], sce, h,
                                          alpha) * h
        y = linear_apply(params["final"], h)[:, 0]
        return jax.nn.sigmoid(y), {"alpha": new_alpha, "layers": new_bn}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused kernel — equal to
        ``apply(train=False)`` up to float reassociation at the ``sign``
        threshold (BN folded to affines; ``alpha`` folded into the pruner
        weights, so Binarization/Fusion compute ``x @ (w*alpha)`` instead of
        ``(x @ w) * alpha`` — a row whose pre-sigmoid value sits exactly at
        ``epsilon`` could flip its hard-threshold factor;
        ops/pallas/gated_infer.py)."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.folding import fold_stacked_mlp_eval
        from ..ops.pallas.gated_infer import adasparse_fused_infer

        assert self.act.name == "relu"
        form = self.pruners[0].form
        alpha = state["alpha"]
        sce = self.sce_embedding.apply(params["sce_embedding"], x,
                                       self.sce_features, squeeze_dim=True)
        agn = self.agn_embedding.apply(params["agn_embedding"], x,
                                       self.agn_features, squeeze_dim=True)
        # Binarization/Fusion scale the pre-sigmoid value by alpha
        # (layers.py:291-305); Scaling does not.
        scale = 1.0 if form == "Scaling" else alpha
        pruner_ws = [p["w"] * scale for p in params["pruners"]]
        layer_stages, _ = fold_stacked_mlp_eval(params, state)
        return adasparse_fused_infer(
            sce, agn, pruner_ws, layer_stages,
            (params["final"]["w"], params["final"]["b"]),
            form=form, epsilon=self.pruners[0].epsilon,
            beta=self.pruners[0].beta,
        )
