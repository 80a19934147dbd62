"""EPNet: scenario-gated embedding personalization.

TPU-native rebuild of reference epnet.py:6-33. The scenario embedding is
concatenated with a **stop-gradient** copy of the agnostic embedding
(epnet.py:28 ``.detach()`` — critical for parity), fed through GateNU, and
the gate scales the (gradient-carrying) agnostic embedding.

QUIRK PRESERVED: the reference constructs its head as ``MLP(self.agn_dims,
fcn_dims)`` (epnet.py:22) — but the reference MLP's second *positional*
parameter is ``output_layer``, not ``dims``. The truthy list lands in
``output_layer`` and ``dims`` stays None, so EPNet's "MLP" is a single
``Linear(agn_dims, 1)`` with no hidden layers; ``fcn_dims`` is effectively
ignored. Reproduced deliberately (it affects metrics).
"""

from __future__ import annotations

import jax

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, GateNU
from .base import Model, split_rng


class EPNet(Model):
    def __init__(self, sce_features, agn_features, fcn_dims):
        self.sce_features = tuple(sce_features)
        self.agn_features = tuple(agn_features)
        self.sce_embedding = EmbeddingCollection(sce_features)
        self.agn_embedding = EmbeddingCollection(agn_features)
        self.sce_dims = sum_embed_dims(sce_features)
        self.agn_dims = sum_embed_dims(agn_features)
        self.gatenu = GateNU(self.sce_dims + self.agn_dims, self.agn_dims)
        # see module docstring: fcn_dims intentionally unused, as reference
        self.mlp = MLP(self.agn_dims, dims=None, output_layer=bool(fcn_dims))

    def init(self, rng):
        ks, ka, kg, km = jax.random.split(rng, 4)
        mlp_p, mlp_s = self.mlp.init(km)
        params = {
            "sce_embedding": self.sce_embedding.init(ks),
            "agn_embedding": self.agn_embedding.init(ka),
            "gatenu": self.gatenu.init(kg),
            "mlp": mlp_p,
        }
        return params, {"mlp": mlp_s}

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        km, = split_rng(rng, 1)
        sce = self.sce_embedding.apply(params["sce_embedding"], x,
                                       self.sce_features, squeeze_dim=True)
        agn = self.agn_embedding.apply(params["agn_embedding"], x,
                                       self.agn_features, squeeze_dim=True)
        gate_in = jax.numpy.concatenate(
            [sce, jax.lax.stop_gradient(agn)], axis=1
        )
        gate = self.gatenu.apply(params["gatenu"], gate_in)
        y, mlp_s = self.mlp.apply(params["mlp"], state["mlp"], agn * gate,
                                  train, km, w)
        return jax.nn.sigmoid(y)[:, 0], {"mlp": mlp_s}

    def apply_fused_eval(self, params, state, x, w=None):
        """Eval forward through the Pallas fused kernel — numerically equal
        to ``apply(train=False)`` (ops/pallas/gated_infer.py)."""
        # ``w`` accepted for the uniform trainer call; the eval math here
        # is per-row (no batch statistics), so the mask is unused.
        from ..ops.pallas.gated_infer import epnet_fused_infer

        assert self.mlp.output_layer, (
            "epnet fused inference needs the MLP head (fcn_dims built with "
            "output_layer=True); this model was built without one")
        sce = self.sce_embedding.apply(params["sce_embedding"], x,
                                       self.sce_features, squeeze_dim=True)
        agn = self.agn_embedding.apply(params["agn_embedding"], x,
                                       self.agn_features, squeeze_dim=True)
        g = params["gatenu"]
        head = params["mlp"]["out"]
        return epnet_fused_infer(
            sce, agn,
            (g["l1"]["w"], g["l1"]["b"]), (g["l2"]["w"], g["l2"]["b"]),
            (head["w"], head["b"]), gemma=self.gatenu.gemma,
        )
