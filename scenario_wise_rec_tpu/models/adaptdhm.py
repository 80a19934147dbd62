"""AdaptDHM: learned-free cluster routing with EMA centers.

TPU-native rebuild of reference adaptdhm.py:14-114:

- L2-normalized cluster centers are **carried state**, updated by EMA inside
  the forward pass, under stop_gradient, train-time only, with 3 refinement
  iterations (adaptdhm.py:70-95, beta=0.9) — the train/eval asymmetry
  (eval computes assignments once from frozen centers) is preserved;
- router = argmax of the soft assignment (adaptdhm.py:94);
- the scoring FCN multiplies shared weights elementwise with per-cluster
  weights, STAR-style (adaptdhm.py:101-107); QUIRK PRESERVED: the bias
  parameters are created and initialized (normal(0, 1e-7)) but never used in
  the forward pass (adaptdhm.py:101-107 applies only the weights);
- outputs of all clusters are computed densely and gathered by router value
  (adaptdhm.py:113).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import config as compute_config
from ..core import init as initializers
from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from .base import Model


def _l2norm(v, axis=-1, eps: float = 1e-12):
    """torch F.normalize(p=2): divide by max(||v||, eps)."""
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return v / jnp.maximum(n, eps)


class AdaptDHM(Model):
    def __init__(self, features, fcn_dims, cluster_num: int, beta: float,
                 device: str = ""):
        self.features = tuple(features)
        self.beta = beta
        self.cluster_num = cluster_num
        self.layer_num = len(fcn_dims) + 1
        self.dims = sum_embed_dims(features)
        self.fcn_dims = [self.dims] + list(fcn_dims) + [1]
        self.embedding = EmbeddingCollection(features)

    def init(self, rng):
        C = self.cluster_num
        ke, kc, kw = jax.random.split(rng, 3)
        xavier = initializers.xavier_uniform(gain=jnp.sqrt(2.0))  # relu gain
        bias_init = initializers.random_normal(0.0, 1e-7)
        center = _l2norm(jax.random.normal(kc, (C, self.dims)), axis=1)
        params = {"embedding": self.embedding.init(ke), "w": [], "b": []}
        # branch 0 = shared FCN; branches 1..C = per-cluster (adaptdhm.py:36-67)
        keys = jax.random.split(kw, (C + 1) * self.layer_num * 2).reshape(
            C + 1, self.layer_num, 2, -1
        )
        for br in range(C + 1):
            ws, bs = [], []
            for i in range(self.layer_num):
                din, dout = self.fcn_dims[i], self.fcn_dims[i + 1]
                ws.append(xavier(keys[br, i, 0], (din, dout)))
                bs.append(bias_init(keys[br, i, 1], (dout,)))
            params["w"].append(ws)
            params["b"].append(bs)
        return params, {"center": center}

    def _route(self, center, emb, train: bool, w=None):
        """Soft-assign + EMA refine (adaptdhm.py:70-95)."""
        x = jax.lax.stop_gradient(emb)  # [B, dim]
        # padded (w=0) rows must not pull on the EMA centers — the reference
        # never sees them (adaptdhm.py:70-95 refines over real rows only)
        wc = None if w is None else w.reshape(-1, 1).astype(x.dtype)
        if train:
            for _ in range(3):
                sij = x @ center.T  # [B, C]
                rij = jax.nn.softmax(sij, axis=1)
                if wc is not None:
                    rij = rij * wc
                cij = rij.T @ x  # [C, dim]
                center = _l2norm(self.beta * center + (1 - self.beta) * cij,
                                 axis=1)
            rij = jax.nn.softmax(x @ center.T, axis=1)
        else:
            rij = jax.nn.softmax(x @ center.T, axis=1)
        router = jnp.argmax(rij, axis=1)  # [B]
        return router, center

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        router, new_center = self._route(state["center"], emb, train, w)

        # dense per-cluster scoring with W0 ⊙ Wd (adaptdhm.py:101-107);
        # stack cluster weights -> one [C, in, out] einsum per layer.
        outs = []
        w0 = params["w"][0]
        h = jnp.broadcast_to(emb[None],
                             (self.cluster_num,) + emb.shape)  # [C, B, in]
        stacked_w = [
            jnp.stack([w0[i] * params["w"][d + 1][i]
                       for d in range(self.cluster_num)])
            for i in range(self.layer_num)
        ]  # each [C, in, out]
        for i in range(self.layer_num - 1):
            h = jax.nn.relu(compute_config.einsum("cbi,cio->cbo", h, stacked_w[i]))
        h = jax.nn.sigmoid(
            compute_config.einsum("cbi,cio->cbo", h, stacked_w[self.layer_num - 1])
        )  # [C, B, 1]
        out = jnp.take_along_axis(h[..., 0].T, router[:, None], axis=1)[:, 0]
        new_state = {"center": new_center if train else state["center"]}
        return out, new_state

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused kernel — numerically equal
        to ``apply(train=False)``: the router is the argmax soft-assignment
        against the frozen EMA centers (softmax is monotone, so argmax of the
        logits is identical), computed outside the kernel; the shared⊙cluster
        FCN + gather runs fused (ops/pallas/adaptdhm_infer.py)."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.adaptdhm_infer import adaptdhm_fused_infer

        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        router = jnp.argmax(emb @ state["center"].T, axis=1)
        w0 = params["w"][0]
        stages = [
            jnp.stack([w0[i] * params["w"][c + 1][i]
                       for c in range(self.cluster_num)])
            for i in range(self.layer_num)
        ]  # each [C, in, out]
        return adaptdhm_fused_infer(emb, router, stages)
