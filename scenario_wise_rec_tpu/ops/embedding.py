"""Embedding engine: packed multi-table lookup with pooling and masking.

TPU-native re-design of the reference ``EmbeddingLayer``
(reference: scenario_wise_rec/basic/layers.py:27-146). Differences that matter
for TPU performance:

- All owned tables that share an embed_dim are **packed into one mega-table**
  ``[sum(vocab_sizes), D]`` with per-feature row offsets, so a batch of F
  sparse features is a *single* gather ``table[ids + offsets]`` instead of F
  small ones. This is also the unit of row-sharding across the device mesh
  (see parallel/sharded_embedding.py).
- ``shared_with`` aliasing resolves to the owner's offset (layers.py:69-72,
  84-87) — still one gather.
- Sequence features gather ``[B, L, D]`` from the same packed table and are
  pooled (sum / mean / concat) under a padding mask (layers.py:73-87,174-228).
- Output contract matches the reference exactly (layers.py:96-114):
  ``squeeze_dim=True`` -> ``[B, sum_sparse_dims (+ n_dense)]`` with sparse
  blocks in feature-list order followed by dense columns;
  ``squeeze_dim=False`` -> ``[B, F, D]`` (sparse/sequence only).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as _cfg
from ..core.features import DenseFeature, Feature, SequenceFeature, SparseFeature


# ---------------------------------------------------------------------------
# MXU-friendly gather: one-hot matmul backward instead of scatter-add.
#
# Autodiff's transpose of ``table[ids]`` is a scatter-add, which XLA lowers to
# a SERIALIZED per-row loop on TPU — measured 5.7 ms for the flagship batch
# (94k rows into [460k, 16]) vs 0.27 ms for the same segment-sum expressed as
# per-feature one-hot matmuls on the MXU (f32-exact: the one-hot factor is
# 0/1, so products are exact; duplicate ids sum in the f32 accumulator just
# like scatter-add, only in a different order). The dense [vocab, D] gradient
# is assembled by CONCATENATING per-feature blocks (features own disjoint,
# ordered row ranges of the packed table) — no scatter anywhere.
# ---------------------------------------------------------------------------


def _onehot_segsum(g2d: jnp.ndarray, local_ids: jnp.ndarray,
                   vocab: int) -> jnp.ndarray:
    """``sum_n onehot(local_ids[n]) ⊗ g2d[n]`` → ``[vocab, D]`` on the MXU."""
    oh = (local_ids[:, None]
          == jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1))
    return jnp.einsum("nv,nd->vd", oh.astype(g2d.dtype), g2d,
                      preferred_element_type=jnp.float32).astype(g2d.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_onehot_bwd(table, ids, spans, partition):
    return table[ids]


def _gather_fwd(table, ids, spans, partition):
    return table[ids], ids


def _gather_bwd(spans: Tuple[Tuple[int, int], ...],
                partition: Tuple[Tuple[int, int], ...], ids, g):
    ncols = len(spans)
    d = g.shape[-1]
    if ncols == 1:
        idc = ids.reshape(-1, 1)
        gc = g.reshape(-1, 1, d)
    else:
        idc = ids.reshape(-1, ncols)
        gc = g.reshape(-1, ncols, d)
    # group columns by owning (offset, vocab) span — aliased features share one
    per_span: Dict[Tuple[int, int], List[int]] = {}
    for col, span in enumerate(spans):
        per_span.setdefault(span, []).append(col)

    # Bucket spans so each bucket becomes ONE batched einsum: launching a
    # separate one-hot matmul per feature costs a fixed ~0.13 ms each on the
    # axon runtime (23 features -> ~3 ms); one [m, n, Vpad] einsum for the
    # whole bucket runs in ~0.27 ms. Bucket key = (#ids, ceil(log2(vocab)));
    # within a bucket one-hots are padded to the largest vocab (<2x waste).
    buckets: Dict[Tuple[int, int], List[Tuple[int, int, jnp.ndarray,
                                              jnp.ndarray]]] = {}
    for (off, vf), cols in per_span.items():
        if len(cols) == 1:
            lid = idc[:, cols[0]] - off
            gg = gc[:, cols[0], :]
        else:
            lid = jnp.concatenate([idc[:, c] - off for c in cols])
            gg = jnp.concatenate([gc[:, c, :] for c in cols])
        key = (lid.shape[0], max(vf - 1, 1).bit_length())
        buckets.setdefault(key, []).append((off, vf, lid, gg))

    blocks: Dict[int, jnp.ndarray] = {}
    for (_, _), entries in buckets.items():
        vpad = max(vf for _, vf, _, _ in entries)
        # clip like XLA's clamping gather so OOB ids route to the same row
        lids = jnp.stack([jnp.clip(lid, 0, vf - 1)
                          for _, vf, lid, _ in entries])        # [m, n]
        ggs = jnp.stack([gg for _, _, _, gg in entries])        # [m, n, d]
        oh = (lids[:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, 1, vpad), 2))
        out = jnp.einsum("mnv,mnd->mvd", oh.astype(ggs.dtype), ggs,
                         preferred_element_type=jnp.float32).astype(ggs.dtype)
        for i, (off, vf, _, _) in enumerate(entries):
            blk = out[i, :vf]
            blocks[off] = blocks[off] + blk if off in blocks else blk

    parts = [
        blocks[off] if off in blocks else jnp.zeros((vf, d), g.dtype)
        for off, vf in partition
    ]
    grad = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return grad, None


_gather_onehot_bwd.defvjp(_gather_fwd, _gather_bwd)


def mxu_gather(table, ids, spans, partition):
    """``table[ids]`` whose backward is scatter-free (one-hot matmuls).

    Args:
        table: ``[V, D]`` (packed mega-table or a single loose table).
        ids: global row indices; if ``len(spans) > 1`` the LAST axis indexes
            feature columns (``ids[..., f]`` belongs to ``spans[f]``),
            otherwise every element belongs to ``spans[0]``.
        spans: static ``((offset, vocab), ...)`` per id column.
        partition: static row partition of the whole table, ascending &
            contiguous — the backward emits one block per entry.

    Mode is resolved at trace time (core/config.use_onehot_embedding_grad):
    CPU keeps the scatter-add transpose (fast there; the one-hot matmul is
    FLOP-prohibitive without an MXU), and under "auto" so does any gather
    whose largest span vocab exceeds ``config.get_onehot_vocab_ceiling()``
    (the one-hot backward's FLOPs grow linearly in vocab; the scatter's
    serialized cost does not).
    """
    max_vocab = max(v for _, v in spans)
    if not _cfg.use_onehot_embedding_grad(max_vocab):
        return table[ids]
    return _gather_onehot_bwd(table, ids, spans, partition)


def input_mask(x: Dict[str, jnp.ndarray], feature) -> jnp.ndarray:
    """Padding mask for one sparse/sequence feature (layers.py:117-146).

    ids equal to ``padding_idx`` (or -1 when unset) are masked out.
    Returns float mask with the ids' shape.
    """
    if not isinstance(feature, (SparseFeature, SequenceFeature)):
        raise ValueError("Only SparseFeature or SequenceFeature support to get mask.")
    pad = feature.padding_idx if feature.padding_idx is not None else -1
    return (x[feature.name].astype(jnp.int32) != pad).astype(jnp.float32)


def _pool(emb: jnp.ndarray, mask: jnp.ndarray, pooling: str) -> jnp.ndarray:
    """Pool ``[B, L, D]`` under ``[B, L]`` mask (layers.py:174-228)."""
    if pooling == "concat":
        # reference ConcatPooling keeps [B, L, D]; we flatten so it can concat
        # with [B, D] features in squeeze mode (the only mode any model uses).
        return emb.reshape(emb.shape[0], -1)
    masked_sum = jnp.einsum("bl,bld->bd", mask, emb)
    if pooling == "sum":
        return masked_sum
    # mean: masked sum / #non-padding (+1e-16, layers.py:207)
    count = jnp.sum(mask, axis=1, keepdims=True)
    return masked_sum / (count + 1e-16)


class EmbeddingCollection:
    """Owns the embedding tables for a feature list and performs lookups.

    ``init(rng) -> params`` where params is ``{"tables": {name: [V, D]}}`` for
    odd-sized tables plus ``{"packed": [V_total, D]}`` for the packed group.
    """

    def __init__(self, features: Sequence[Feature]):
        self.features = tuple(features)
        # Owned tables: first occurrence wins, aliases excluded (layers.py:51-62)
        owned: Dict[str, Feature] = {}
        for f in self.features:
            if isinstance(f, (SparseFeature, SequenceFeature)):
                if f.shared_with is None and f.name not in owned:
                    owned[f.name] = f
        self.owned = owned

        # Pack every owned table with the majority embed_dim into one table.
        dims = [f.embed_dim for f in owned.values()]
        self.packed_dim = max(set(dims), key=dims.count) if dims else 0
        self.offsets: Dict[str, int] = {}
        self.packed_names: List[str] = []
        total = 0
        for name, f in owned.items():
            if f.embed_dim == self.packed_dim:
                self.offsets[name] = total
                total += f.vocab_size
                self.packed_names.append(name)
        self.packed_vocab = total
        self.loose_names = [n for n in owned if n not in self.offsets]
        # static row partition of the packed table (for mxu_gather's backward)
        self.partition: Tuple[Tuple[int, int], ...] = tuple(
            (self.offsets[n], owned[n].vocab_size) for n in self.packed_names
        )
        # frozen pretrained tables (initializer carries freeze=True,
        # core/init.py:pretrained; reference basic/initializers.py:76-92):
        # packed spans + loose table names — consumed by the trainer's
        # freeze machinery (train/freeze.py)
        self.frozen_spans: Tuple[Tuple[int, int], ...] = tuple(
            (self.offsets[n], owned[n].vocab_size)
            for n in self.packed_names
            if getattr(owned[n].initializer, "freeze", False)
        )
        self.frozen_loose: Tuple[str, ...] = tuple(
            n for n in self.loose_names
            if getattr(owned[n].initializer, "freeze", False)
        )

    # -- params -----------------------------------------------------------

    def init(self, rng) -> Dict:
        import jax

        params: Dict = {}
        names = list(self.owned)
        keys = jax.random.split(rng, max(len(names), 1))
        per_table = {}
        for name, key in zip(names, keys):
            f = self.owned[name]
            per_table[name] = f.initializer(key, (f.vocab_size, f.embed_dim))
        if self.packed_names:
            params["packed"] = jnp.concatenate(
                [per_table[n] for n in self.packed_names], axis=0
            )
        loose = {n: per_table[n] for n in self.loose_names}
        if loose:
            params["tables"] = loose
        return params

    def _owner(self, f) -> str:
        return f.shared_with if getattr(f, "shared_with", None) else f.name

    def _rows(self, params, owner: str, ids: jnp.ndarray) -> jnp.ndarray:
        if owner in self.offsets:
            off = self.offsets[owner]
            span = (off, self.owned[owner].vocab_size)
            return mxu_gather(params["packed"], ids + off, (span,),
                              self.partition)
        vocab = self.owned[owner].vocab_size
        return mxu_gather(params["tables"][owner], ids, ((0, vocab),),
                          ((0, vocab),))

    def touched_ids(self, x: Dict[str, jnp.ndarray],
                    features: Sequence[Feature] | None = None) -> jnp.ndarray:
        """Packed-table row indices touched by this batch (static shape).

        Union over every packed sparse/sequence feature (aliases resolve to
        the owner's offset). Used by the sparse/lazy embedding optimizer
        (train/optim.py:sparse_adam_rows_update): rows outside this set have
        zero gradient, so a row-wise update over this set is exact.
        Out-of-range ids are clipped to match XLA's clamping gather.
        """
        feats = self.features if features is None else tuple(features)
        parts: List[jnp.ndarray] = []
        for f in feats:
            if not isinstance(f, (SparseFeature, SequenceFeature)):
                continue
            owner = self._owner(f)
            if owner not in self.offsets:
                continue
            ids = x[f.name].astype(jnp.int32).reshape(-1)
            vocab = self.owned[owner].vocab_size
            ids = jnp.clip(ids, 0, vocab - 1) + self.offsets[owner]
            parts.append(ids)
        if not parts:
            return jnp.zeros((0,), jnp.int32)
        return jnp.concatenate(parts)

    def touched_owner_segments(
            self, x: Dict[str, jnp.ndarray]) -> Tuple[Tuple[str, int, int], ...]:
        """Static ``(owner, start, size)`` layout of :meth:`touched_ids`.

        One entry per packed sparse/sequence feature, in concatenation
        order. Segments sharing an ``owner`` draw ids from the same packed
        span (``shared_with`` aliases), so duplicate row ids can occur
        *across* those segments — the occurrence-segsum optimizer
        (train/optim.py:sparse_adam_occurrence_update) must merge them
        before deduplicating. All values are Python ints (shapes only), so
        this is trace-time static.
        """
        segs: List[Tuple[str, int, int]] = []
        pos = 0
        for f in self.features:
            if not isinstance(f, (SparseFeature, SequenceFeature)):
                continue
            owner = self._owner(f)
            if owner not in self.offsets:
                continue
            size = 1
            for s in x[f.name].shape:
                size *= int(s)
            segs.append((owner, pos, size))
            pos += size
        return tuple(segs)

    # -- lookup -----------------------------------------------------------

    def _rows_layout(self, x: Dict[str, jnp.ndarray]) -> Dict[str, tuple]:
        """(start, size) per packed feature in the canonical ``touched_ids``
        order: ``self.features`` order, each feature's ids flattened
        row-major. This is the contract between ``touched_ids`` (which builds
        the concatenated ids) and the ``__rows__`` cache consumed here."""
        layout: Dict[str, tuple] = {}
        pos = 0
        for f in self.features:
            if not isinstance(f, (SparseFeature, SequenceFeature)):
                continue
            if self._owner(f) not in self.offsets:
                continue
            size = 1
            for s in x[f.name].shape:
                size *= int(s)
            layout[f.name] = (pos, size)
            pos += size
        return layout

    def apply(self, params, x: Dict[str, jnp.ndarray], features: Sequence[Feature],
              squeeze_dim: bool = False) -> jnp.ndarray:
        """Embed ``features`` from batch ``x`` (layers.py:64-114 contract).

        If ``params["__rows__"]`` is present it holds the pre-gathered packed
        rows ``table[touched_ids(x)]`` (shape ``[K, D]``); packed lookups then
        slice that cache instead of gathering the table. The trainer's
        fully-sparse mode differentiates w.r.t. the cache, so embedding
        gradients never materialize a dense ``[vocab, D]`` array.
        """
        features = list(features)
        rows_cache = params.get("__rows__") if isinstance(params, dict) else None
        layout = self._rows_layout(x) if rows_cache is not None else None
        # Fast path: gather all packed plain-sparse features in ONE gather.
        plain = [
            f for f in features
            if isinstance(f, SparseFeature) and self._owner(f) in self.offsets
        ]
        packed_cols: Dict[str, jnp.ndarray] = {}
        if plain and rows_cache is not None:
            for f in plain:
                start, size = layout[f.name]
                packed_cols[f.name] = rows_cache[start:start + size]
        elif plain:
            # split by the one-hot vocab ceiling so one huge-vocab feature
            # doesn't force the whole batched gather onto either backward
            ceil = _cfg.get_onehot_vocab_ceiling()
            groups = [
                [f for f in plain
                 if self.owned[self._owner(f)].vocab_size <= ceil],
                [f for f in plain
                 if self.owned[self._owner(f)].vocab_size > ceil],
            ]
            for group in groups:
                if not group:
                    continue
                off = jnp.asarray(np.array(
                    [self.offsets[self._owner(f)] for f in group], np.int32))
                ids = jnp.stack(
                    [x[f.name].astype(jnp.int32) for f in group], axis=1
                ) + off[None, :]
                spans = tuple(
                    (self.offsets[self._owner(f)],
                     self.owned[self._owner(f)].vocab_size)
                    for f in group
                )
                # [B, F_group, D] — one gather fwd; bwd is the one-hot
                # matmul below the ceiling, scatter-add above (mxu_gather)
                gathered = mxu_gather(params["packed"], ids, spans,
                                      self.partition)
                for i, f in enumerate(group):
                    packed_cols[f.name] = gathered[:, i, :]

        sparse_out: List[jnp.ndarray] = []
        dense_out: List[jnp.ndarray] = []
        for f in features:
            if isinstance(f, SparseFeature):
                if f.name in packed_cols:
                    sparse_out.append(packed_cols[f.name])
                else:
                    ids = x[f.name].astype(jnp.int32)
                    sparse_out.append(self._rows(params, self._owner(f), ids))
            elif isinstance(f, SequenceFeature):
                ids = x[f.name].astype(jnp.int32)
                if rows_cache is not None and self._owner(f) in self.offsets:
                    start, size = layout[f.name]
                    emb = rows_cache[start:start + size].reshape(
                        ids.shape + (rows_cache.shape[-1],)
                    )
                else:
                    emb = self._rows(params, self._owner(f), ids)  # [B, L, D]
                mask = input_mask(x, f)
                sparse_out.append(_pool(emb, mask, f.pooling))
            elif isinstance(f, DenseFeature):
                dense_out.append(x[f.name].astype(jnp.float32).reshape(-1, 1))
            else:
                raise ValueError(f"unknown feature type: {f!r}")

        if squeeze_dim:
            parts = []
            if sparse_out:
                parts.append(jnp.concatenate(sparse_out, axis=1))
            if dense_out:
                parts.append(jnp.concatenate(dense_out, axis=1))
            if not parts:
                raise ValueError("The input features can not be empty")
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

        if not sparse_out:
            raise ValueError(
                "If keeping [B, F, D] shape, expected SparseFeatures in the list"
            )
        return jnp.stack(sparse_out, axis=1)  # [B, F, D]
