"""Frozen-pretrained-embedding support (reference Pretrained(freeze=True)).

The reference freezes via ``nn.Embedding.from_pretrained(..., freeze=True)``
(basic/initializers.py:76-92): the weight gets ``requires_grad=False``, its
``.grad`` stays ``None``, and ``torch.optim.Adam`` skips None-grad params
entirely — no update, no weight decay, no moment state.

Our equivalent per training mode (CTRTrainer wires all of these):

- dense optax mode: :func:`freeze_updates` wraps the optimizer chain and
  zeroes the final updates on frozen packed-table rows and frozen loose
  tables, so the frozen weights are bit-identical after any number of
  steps (weight decay included — it enters the chain as part of the
  update). It ALSO zeroes the inner chain's Adam moments (``mu``/``nu``)
  on frozen rows after every update: torch keeps NO state for skipped
  params, and nonzero saved moments would diverge from reference behavior
  if a checkpoint were resumed with the rows unfrozen (ADVICE r4).
- lazy row-sparse modes (winner/occurrence): frozen ids are dropped from
  the row write-back (and their moment rows left untouched), matching
  torch's skip-the-param behavior.
- dense-semantics sparse modes (dense/sorted): the updated table/moments
  are blended back to their old values on frozen rows after the update
  (one O(V) select, only traced when frozen spans exist).

Which rows are frozen is STATIC (a property of the feature list): every
owned feature whose initializer carries ``freeze=True``
(core/init.py:pretrained) contributes its packed span or loose table.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import optax


def frozen_ids_mask(ids: jnp.ndarray,
                    spans: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Bool mask over packed row ``ids``: True where the id is frozen."""
    m = jnp.zeros(ids.shape, bool)
    for off, vc in spans:
        m = m | ((ids >= off) & (ids < off + vc))
    return m


def frozen_rows_mask(v: int, spans: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Bool column ``[v, 1]``: True on frozen packed-table rows."""
    row = jnp.arange(v, dtype=jnp.int32)[:, None]
    return frozen_ids_mask(row, spans)


def frozen_packed_mask(nrows: int, d: int,
                       spans: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Bool ``[nrows, 128]`` mask over a PACKED ``[V2/r, 128]`` tile array
    (r = 128 // d rows per tile row, ops/pallas/sorted_adam.py): True on
    lanes belonging to frozen logical rows. Built from 2-D iotas — no
    [V2, D]-shaped intermediate (padded-layout hazard)."""
    r = 128 // d
    row = (jnp.arange(nrows, dtype=jnp.int32)[:, None] * r
           + jnp.arange(128, dtype=jnp.int32)[None, :] // d)
    return frozen_ids_mask(row, spans)


def blend_frozen_packed(old, new, d: int, spans):
    """Packed-layout counterpart of :func:`blend_frozen_rows`."""
    if not spans:
        return new
    return jnp.where(frozen_packed_mask(new.shape[0], d, spans), old, new)


def blend_frozen_rows(old, new, spans):
    """``new`` with frozen rows restored from ``old`` (no-op if no spans)."""
    if not spans:
        return new
    return jnp.where(frozen_rows_mask(new.shape[0], spans), old, new)


def _zero_frozen_tree(tree, spans, loose_names):
    """Zero frozen rows/tables of a params-shaped pytree (final updates or
    Adam moment trees)."""
    emb = tree.get("embedding") if isinstance(tree, dict) else None
    if emb is None:
        return tree
    emb = dict(emb)
    if spans and "packed" in emb:
        keep = ~frozen_rows_mask(emb["packed"].shape[0], spans)
        emb["packed"] = emb["packed"] * keep
    if loose_names and "tables" in emb:
        tables = dict(emb["tables"])
        for n in loose_names:
            if n in tables:
                tables[n] = jnp.zeros_like(tables[n])
        emb["tables"] = tables
    return {**tree, "embedding": emb}


def _zero_frozen_moments(state, spans, loose_names):
    """Recurse through an optax chain state and zero frozen rows of every
    ``ScaleByAdamState``'s moment trees (torch keeps no state for skipped
    params — see module docstring)."""
    if isinstance(state, optax.ScaleByAdamState):
        return state._replace(
            mu=_zero_frozen_tree(state.mu, spans, loose_names),
            nu=_zero_frozen_tree(state.nu, spans, loose_names))
    if isinstance(state, tuple):
        items = tuple(_zero_frozen_moments(s, spans, loose_names)
                      for s in state)
        # namedtuples (e.g. other optax states) rebuild by fields; a plain
        # tuple (optax.chain state) rebuilds directly
        return type(state)(*items) if hasattr(state, "_fields") else items
    return state


def freeze_updates(inner: optax.GradientTransformation,
                   spans: Sequence[Tuple[int, int]],
                   loose_names: Sequence[str]) -> optax.GradientTransformation:
    """Wrap ``inner`` so frozen embedding weights receive ZERO update.

    Masks the chain's final updates (not the gradients): torch-Adam folds
    weight decay into the update path, so a gradient-only mask would still
    decay frozen rows. The inner chain's Adam moments are zeroed on frozen
    rows after each update too (a gradient + decay contribution would
    otherwise accumulate there, diverging from torch's no-state-at-all on
    a resume that unfreezes — ADVICE r4). ``spans``: frozen (offset, vocab)
    ranges of the packed mega-table; ``loose_names``: frozen odd-dim tables
    under ``params["embedding"]["tables"]``.
    """
    spans = tuple(spans)
    loose_names = tuple(loose_names)
    if not spans and not loose_names:
        return inner

    def init(params):
        return inner.init(params)

    def update(updates, state, params=None):
        updates, state = inner.update(updates, state, params)
        updates = _zero_frozen_tree(updates, spans, loose_names)
        state = _zero_frozen_moments(state, spans, loose_names)
        return updates, state

    return optax.GradientTransformation(init, update)
