"""Model protocol + template.

Every model is a static-config object exposing:

- ``init(rng) -> (params, state)`` — parameter/state pytrees
- ``apply(params, state, x, train, rng, w) -> (probs[B], new_state)``
  (``w`` = optional [B] 0/1 padding mask: static-shape batches pad ragged
  tails with weight-0 rows, and every batch-statistics op — BatchNorm train
  stats, STAR/HAMUR batch-stat norms, AdaptDHM's EMA, M2M's cross-example
  attention — excludes them; padded rows' outputs are discarded host-side)

``x`` is a dict of per-column arrays; ``probs`` are post-sigmoid click
probabilities; ``state`` carries BatchNorm running stats and any forward-time
mutable state (AdaSparse alpha, AdaptDHM centers, M3oE tau) explicitly.

The universal multi-scenario contract (SURVEY §1 L3): read
``x["domain_indicator"]``, compute every domain branch on the full batch, and
select per-row — here via stacked parameters + one gather rather than the
reference's Python loop + ``torch.where`` chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import sum_embed_dims
from ..ops.embedding import EmbeddingCollection
from ..ops.nn import MLP, stacked_mlp_apply, stacked_mlp_init
from ..ops.select import domain_select


def split_rng(rng, n: int):
    """Split an optional rng into n optional keys."""
    if rng is None:
        return (None,) * n
    return tuple(jax.random.split(rng, n))


def domain_ids(x) -> jnp.ndarray:
    return x["domain_indicator"].astype(jnp.int32)


class Model:
    """Base class (also the user template, reference base_example.py:11-77)."""

    def init(self, rng):
        raise NotImplementedError

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        raise NotImplementedError


class Base(Model):
    """Documented skeleton for user models (reference base_example.py:50-77):
    embed -> (user-defined per-domain computation) -> per-row select.

    As shipped, the reference template's forward is an identity over the
    flattened embedding selected per domain; reproduced for parity.
    """

    def __init__(self, features, num_domains: int, **kwargs):
        self.features = tuple(features)
        self.num_domains = num_domains
        self.input_dim = sum_embed_dims(features)
        self.embedding = EmbeddingCollection(features)

    def init(self, rng):
        return {"embedding": self.embedding.init(rng)}, {}

    def apply(self, params, state, x, train: bool = False, rng=None,
              w=None):
        did = domain_ids(x)
        emb = self.embedding.apply(params["embedding"], x, self.features,
                                   squeeze_dim=True)
        ys = jnp.broadcast_to(emb[None], (self.num_domains,) + emb.shape)
        return domain_select(ys[..., :1], did), state
