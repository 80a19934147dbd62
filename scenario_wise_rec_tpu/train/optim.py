"""Optimizers matching the reference's torch defaults.

The reference uses ``torch.optim.Adam(lr=1e-3, weight_decay=1e-5)``
(ctr_trainer.py:50-52). torch Adam (not AdamW!) applies weight decay by
adding ``wd * param`` to the *gradient* before the moment updates — in optax
terms that is ``add_decayed_weights`` placed BEFORE ``scale_by_adam``.

The reference also passes StepLR ``scheduler_params`` everywhere but never a
``scheduler_fn``, so the scheduler is never instantiated and the effective lr
is constant (ctr_trainer.py:53-55 vs run scripts) — ``step_lr`` is provided
for capability parity but the default configs keep lr constant, matching the
reference's effective behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def adam(lr: float = 1e-3, weight_decay: float = 1e-5,
         b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
         schedule=None):
    """torch.optim.Adam-equivalent optax chain.

    ``schedule``: optional ``step -> scale`` multiplier on the base lr
    (e.g. :func:`step_lr`).
    """
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if schedule is not None:
        parts.append(optax.scale_by_schedule(lambda step: schedule(step)))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def sparse_adam_init(table):
    """Optimizer state for :func:`sparse_adam_rows_update`."""
    return {
        "mu": jnp.zeros_like(table),
        "nu": jnp.zeros_like(table),
        "step": jnp.zeros((), jnp.int32),
    }


def sparse_adam_rows_update(table, opt_state, g_dense, ids,
                            lr: float = 1e-3, weight_decay: float = 1e-5,
                            b1: float = 0.9, b2: float = 0.999,
                            eps: float = 1e-8):
    """Lazy (row-sparse) Adam on an embedding table.

    Only the rows in ``ids`` (the rows the batch actually touched, see
    EmbeddingCollection.touched_ids) move: their moments are gathered,
    updated with torch-Adam math (global-step bias correction, the semantics
    of ``torch.optim.SparseAdam``), and scattered back. HBM traffic is
    O(touched rows), not O(vocab) — the dense-Adam full-table read+write is
    the dominant per-step cost for production-scale vocabularies.

    Deviation from the reference's dense ``torch.optim.Adam`` (documented in
    README's parity ledger): untouched rows receive no weight decay and their
    moments do not decay until next touched. ``ids`` may contain duplicates
    (duplicate rows compute identical updates; all but the first occurrence
    are dropped on scatter).

    Returns ``(new_table, new_opt_state)``.
    """
    vocab = table.shape[0]
    sids = jnp.sort(ids)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sids[1:] != sids[:-1]]
    ) if sids.shape[0] else jnp.zeros((0,), bool)
    # duplicates scatter out-of-range -> dropped (their rows compute
    # identical updates, gathered from the same dense-grad row)
    scatter_ids = jnp.where(first, sids, vocab)
    return _rows_adam_core(table, opt_state, g_dense[sids], sids, scatter_ids,
                           lr, weight_decay, b1, b2, eps)


def sparse_adam_rowgrads_update(table, opt_state, g_rows, ids,
                                lr: float = 1e-3, weight_decay: float = 1e-5,
                                b1: float = 0.9, b2: float = 0.999,
                                eps: float = 1e-8, frozen_spans=()):
    """Lazy Adam from PER-OCCURRENCE row gradients — no dense grad at all.

    ``ids [K]`` (duplicates allowed) and ``g_rows [K, D]`` are the packed-row
    indices and the cotangents of ``table[ids]`` (the trainer's fully-sparse
    mode differentiates w.r.t. the gathered rows, see
    EmbeddingCollection.apply's ``__rows__`` cache). Duplicate occurrences are
    segment-summed — exactly the scatter-add a dense gather-backward would
    produce — then each unique row gets one torch-SparseAdam update. Total
    HBM traffic is O(K·D): nothing O(vocab) is ever allocated.
    """
    if ids.shape[0] == 0:
        return table, {**opt_state, "step": opt_state["step"] + 1}
    vocab = table.shape[0]
    k = ids.shape[0]
    # Sortless dedup (argsort over ~1e5 ids costs multiple full passes on
    # TPU): elect one "winner" occurrence per unique id with a scatter into
    # an O(vocab) int32 scratch, segment-sum every occurrence's grad into its
    # winner's slot, and apply Adam only at winner slots.
    occ = jnp.arange(k, dtype=jnp.int32)
    winner = jnp.zeros((vocab,), jnp.int32).at[ids].set(occ)  # any dup wins
    rep = winner[ids]                       # occurrence -> winner occurrence
    g_slot = jnp.zeros_like(g_rows).at[rep].add(g_rows)  # summed dup grads
    is_rep = rep == occ
    uid = jnp.where(is_rep, ids, vocab)     # non-winner slots -> dropped
    if frozen_spans:
        # frozen pretrained rows: drop from the write-back (weights AND
        # moments untouched — torch skips None-grad params entirely)
        from .freeze import frozen_ids_mask
        uid = jnp.where(frozen_ids_mask(uid, frozen_spans), vocab, uid)
    return _rows_adam_core(table, opt_state, g_slot,
                           jnp.clip(uid, 0, vocab - 1), uid,
                           lr, weight_decay, b1, b2, eps)


def _rows_adam_core(table, opt_state, g, gather_ids, scatter_ids,
                    lr, weight_decay, b1, b2, eps):
    """Shared torch-Adam row math: gather moments at ``gather_ids``, update,
    scatter at ``scatter_ids`` (out-of-range entries dropped)."""
    p = table[gather_ids]
    if weight_decay:
        g = g + weight_decay * p  # torch Adam: decay folded into the gradient
    mu = b1 * opt_state["mu"][gather_ids] + (1 - b1) * g
    nu = b2 * opt_state["nu"][gather_ids] + (1 - b2) * (g * g)
    t = opt_state["step"] + 1
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)
    update = lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)

    new_table = table.at[scatter_ids].set(p - update, mode="drop")
    new_state = {
        "mu": opt_state["mu"].at[scatter_ids].set(mu, mode="drop"),
        "nu": opt_state["nu"].at[scatter_ids].set(nu, mode="drop"),
        "step": t,
    }
    return new_table, new_state


def sparse_adam_occurrence_init(table):
    """Optimizer state for :func:`sparse_adam_occurrence_update`.

    The COMBINED row store ``comb [V, 3·D]`` holds weights AND both Adam
    moments interleaved per row (``comb[:, :D]`` = weights — the authority
    during sparse-combined training, ``comb[:, D:2D]`` = mu,
    ``comb[:, 2D:]`` = nu). Rationale (measured,
    scripts/bench_row_scatter.py): on TPU every K-row indexed HBM op
    (gather or scatter, any row width 16..128) costs roughly the same per
    row — the cost is per-row overhead, not bytes. One combined store makes
    the whole sparse step exactly TWO indexed ops: one gather ``comb[ids]``
    (feeding the forward's rows AND the optimizer's moments) and one
    scatter back — vs ~7 V-sized indexed ops in the winner-scatter
    formulation.

    Shape note: the store is 2-D ``[V, 3·D]``, NOT ``[V, 3, D]`` — XLA's
    TPU layout tiles the last TWO dims (T(4,128)), so a [10.7M, 3, 16]
    array pads 3->4 and 16->128 and costs 22 GB of HBM (measured OOM);
    the flat 2-D layout stays at the logical 2 GB."""
    v, d = table.shape
    comb = jnp.concatenate(
        [table, jnp.zeros((v, 2 * d), table.dtype)], axis=1)
    return {
        "comb": comb,
        "step": jnp.zeros((), jnp.int32),
    }


def _grouped_occurrence_segsum(g_rows, ids, segments, use_pallas: bool):
    """Duplicate-gradient segment sum over the packed-id layout.

    ``segments``: static ``(owner, start, size)`` per feature
    (EmbeddingCollection.touched_owner_segments). Segments sharing an owner
    draw from the same packed span, so they are merged before the
    per-owner segsum; owners are then batched by merged length so the whole
    batch is a handful of ``[F, N, D]`` kernel calls (per-owner calls would
    pay the fixed per-dispatch cost ~23 times).

    Returns ``[K, D]``: for every occurrence, the sum of the gradients of
    ALL occurrences of the same row id — identical across duplicates, which
    is what makes the later row writes idempotent.
    """
    from ..ops.pallas.row_update import occurrence_segsum, occurrence_segsum_ref

    d = g_rows.shape[-1]
    by_owner: dict = {}
    order: list = []
    for owner, start, size in segments:
        if owner not in by_owner:
            by_owner[owner] = []
            order.append(owner)
        by_owner[owner].append((start, size))

    by_len: dict = {}
    for owner in order:
        pieces = by_owner[owner]
        n = sum(z for _, z in pieces)
        by_len.setdefault(n, []).append((owner, pieces))

    out_parts: dict = {}  # start -> [size, D]
    for n, owners in by_len.items():
        ids_mat = jnp.stack([
            jnp.concatenate([ids[s:s + z] for s, z in pieces])
            if len(pieces) > 1 else ids[pieces[0][0]:pieces[0][0] + pieces[0][1]]
            for _, pieces in owners
        ])                                                     # [F, N]
        g_mat = jnp.stack([
            jnp.concatenate([g_rows[s:s + z] for s, z in pieces])
            if len(pieces) > 1 else g_rows[pieces[0][0]:pieces[0][0] + pieces[0][1]]
            for _, pieces in owners
        ])                                                     # [F, N, D]
        summed = (occurrence_segsum(ids_mat, g_mat) if use_pallas
                  else occurrence_segsum_ref(ids_mat, g_mat))
        for i, (_, pieces) in enumerate(owners):
            pos = 0
            for s, z in pieces:
                out_parts[s] = summed[i, pos:pos + z]
                pos += z
    return jnp.concatenate([out_parts[s] for s in sorted(out_parts)]) \
        if len(out_parts) > 1 else out_parts[next(iter(out_parts))]


def sparse_adam_occurrence_update(opt_state, g_rows, ids, segments, r3,
                                  lr: float = 1e-3, weight_decay: float = 1e-5,
                                  b1: float = 0.9, b2: float = 0.999,
                                  eps: float = 1e-8,
                                  use_pallas: bool | None = None,
                                  frozen_spans=()):
    """Lazy row-sparse Adam on the combined row store — exactly TWO indexed
    HBM ops per step (the production-vocab path, see
    :func:`sparse_adam_occurrence_init` and ops/pallas/row_update.py).

    Same torch-SparseAdam semantics as :func:`sparse_adam_rowgrads_update`
    (duplicate occurrences segment-summed, one Adam update per unique row,
    weight decay only on touched rows), built scatter-free except the single
    write-back:

    1. duplicate grads merged by an equality-mask MXU matmul
       (occurrence_segsum) — every occurrence of a row id then carries the
       identical summed gradient, making the row writes idempotent;
    2. Adam math on the ``[K, 3·D]`` gathered rows ``r3 = comb[ids]``
       (the caller's forward already needed this gather for the embedding
       rows ``r3[:, :D]`` — the moments ride along for free);
    3. ONE row scatter of the updated ``[K, 3·D]`` rows back into comb.

    ``use_pallas`` controls the segsum kernel (``False`` = pure-XLA einsum,
    required under a partitioned mesh; default: kernel on TPU). The
    write-back is an XLA scatter either way — Mosaic's 128-lane DMA
    alignment rules out per-row DMA at 3·D=48 floats, and the measured XLA
    scatter is at least as fast as the DMA ring anyway
    (scripts/bench_row_scatter.py).

    Returns the new ``opt_state``; the new weights are ``comb[:, 0]``.
    """
    comb = opt_state["comb"]
    if ids.shape[0] == 0:
        return {**opt_state, "step": opt_state["step"] + 1}
    import jax as _jax

    from ..ops.pallas.row_update import scatter_rows

    if use_pallas is None:
        use_pallas = _jax.default_backend() == "tpu"
    d = g_rows.shape[-1]
    g = _grouped_occurrence_segsum(g_rows, ids, segments, use_pallas)
    p = r3[:, :d]
    if weight_decay:
        g = g + weight_decay * p  # torch Adam: decay folded into the gradient
    mu = b1 * r3[:, d:2 * d] + (1 - b1) * g
    nu = b2 * r3[:, 2 * d:] + (1 - b2) * (g * g)
    t = opt_state["step"] + 1
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)
    update = lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    new3 = jnp.concatenate([p - update, mu, nu], axis=1)  # [K, 3·D]
    if frozen_spans:
        # frozen pretrained rows write back their OLD row (weights+moments)
        from .freeze import frozen_ids_mask
        new3 = jnp.where(frozen_ids_mask(ids, frozen_spans)[:, None],
                         r3, new3)
    new_comb = scatter_rows(comb, ids, new3, force_xla=True)
    return {"comb": new_comb, "step": t}


def fused_dense_adam_update(table, opt_state, g_rows, ids, segments,
                            lr: float = 1e-3, weight_decay: float = 1e-5,
                            b1: float = 0.9, b2: float = 0.999,
                            eps: float = 1e-8,
                            block_rows: int = 8192,
                            use_pallas: bool | None = None,
                            frozen_spans=()):
    """EXACT dense torch-Adam on the packed table with ZERO scatters on TPU
    (ops/pallas/fused_adam.py — the production-vocab update).

    Unlike the lazy/SparseAdam variants this has NO parity deviation: every
    row receives weight decay and moment decay every step, identical to the
    reference's ``torch.optim.Adam`` over ``nn.Embedding.weight``. The
    sparse-trainer plumbing is reused only to obtain the per-occurrence row
    grads ``g_rows = d loss / d table[ids]`` without materializing a dense
    gradient through autodiff's scatter-add.

    ``segments``: static ``(owner, start, size)`` per feature
    (EmbeddingCollection.touched_owner_segments) — each segment's ids are
    sorted independently (vectorized bitonic over ``[S, N]``), which is all
    the kernel needs (it routes ids to vocab blocks per segment).

    ``use_pallas=False`` (the DEFAULT, and forced under CPU/SPMD mesh) runs
    the identical math as one XLA scatter-add + vectorized dense Adam.
    ``use_pallas=True`` opts into the Pallas streaming kernel — measured
    SLOWER on the axon v5e (181 ms/step at the 467k shape): its per-id
    scalar ``fori_loop`` costs ~0.8 µs/iteration even with an empty body
    (Mosaic scalar-loop overhead), which buries the streaming win. Kept
    because the architecture (zero scatters, O(V) sequential streaming) is
    the right shape wherever scalar-loop issue is cheaper, and as the
    numerically-pinned reference for a future chunk-vectorized rewrite.

    Returns ``(new_table, new_opt_state)`` with ``{"mu", "nu", "step"}``
    state (same layout as :func:`sparse_adam_init`).
    """
    from ..ops.pallas.fused_adam import (fused_dense_adam_apply,
                                         fused_dense_adam_ref)

    t = opt_state["step"] + 1
    tf = t.astype(jnp.float32)
    hp = jnp.stack([
        jnp.float32(lr), jnp.float32(weight_decay),
        jnp.float32(b1), jnp.float32(b2),
        1.0 / (1.0 - jnp.float32(b1) ** tf),
        1.0 / (1.0 - jnp.float32(b2) ** tf),
        jnp.float32(eps),
    ])
    def _blend(new_table, new_mu, new_nu):
        # frozen pretrained rows keep old weights AND moments (torch skips
        # requires_grad=False params entirely — no update, no decay)
        if frozen_spans:
            from .freeze import blend_frozen_rows
            new_table = blend_frozen_rows(table, new_table, frozen_spans)
            new_mu = blend_frozen_rows(opt_state["mu"], new_mu, frozen_spans)
            new_nu = blend_frozen_rows(opt_state["nu"], new_nu, frozen_spans)
        return new_table, {"mu": new_mu, "nu": new_nu, "step": t}

    if use_pallas is None:
        use_pallas = False
    if not use_pallas:
        new_table, new_mu, new_nu = fused_dense_adam_ref(
            table, opt_state["mu"], opt_state["nu"], g_rows, ids, hp)
        return _blend(new_table, new_mu, new_nu)

    v = table.shape[0]
    vpad = ((v + block_rows - 1) // block_rows) * block_rows
    nb = vpad // block_rows
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * block_rows

    # per-segment sort (+ original positions), grouped by segment length so
    # each group is ONE batched bitonic sort [S_g, N_g]
    by_len: dict = {}
    for si, (_, start, size) in enumerate(segments):
        by_len.setdefault(size, []).append((si, start))
    sorted_parts: dict = {}
    starts_parts: dict = {}
    concat_off = {}
    off = 0
    for _, start, size in segments:
        concat_off[start] = off
        off += size
    for size, segs in by_len.items():
        ids_mat = jnp.stack([ids[st:st + size] for _, st in segs])
        pos_mat = jnp.stack(
            [jnp.arange(st, st + size, dtype=jnp.int32) for _, st in segs])
        sid, spos = jax.lax.sort_key_val(ids_mat, pos_mat)
        ss = jax.vmap(lambda a: jnp.searchsorted(
            a, bounds, side="left").astype(jnp.int32))(sid)
        for row, (si, st) in enumerate(segs):
            sorted_parts[si] = (sid[row], spos[row])
            starts_parts[si] = ss[row] + concat_off[st]

    order = sorted(sorted_parts)
    sorted_ids = jnp.concatenate([sorted_parts[si][0] for si in order])
    sorted_pos = jnp.concatenate([sorted_parts[si][1] for si in order])
    starts = jnp.concatenate([starts_parts[si] for si in order])

    new_table, new_mu, new_nu = fused_dense_adam_apply(
        table, opt_state["mu"], opt_state["nu"], g_rows,
        sorted_ids, sorted_pos, starts, hp, block_rows=block_rows,
        interpret=jax.default_backend() != "tpu")
    return _blend(new_table, new_mu, new_nu)


def sorted_dense_adam_init(table, block_rows: int = 8192, dtype=None,
                           n_shards: int = 1):
    """Optimizer state for :func:`sorted_dense_adam_update`.

    The authority table + Adam moments live PADDED to whole vocab blocks
    (``nb * block_rows`` logical rows, ``nb`` rounded up to a multiple of
    ``n_shards`` so a row-sharded mesh splits into whole blocks) AND in
    the packed ``[V2/r, 128]`` tile layout for the whole run
    (ops/pallas/sorted_adam.py). Padding or re-laying-out per step
    instead would cost O(V) copies — and the ``[V2, D]`` shape must NEVER
    appear inside the jitted step at all: XLA realizes the packed<->plain
    reshape by giving the [V2, D] side a padded T(8,128) layout, an
    8x-expanded allocation that OOMs HBM at production vocab (measured;
    see ops/pallas/sorted_adam.py). Pad rows stay exactly zero (their
    gradient and weight-decay term are both zero); eval/save materialize
    the live ``[V, D]`` table EAGERLY via ``unpack_rows``
    (CTRTrainer._params_for_eval).

    ``dtype``: optional storage dtype for the authority tiles — e.g.
    ``jnp.bfloat16`` halves the 6-pass streaming floor (the Adam math
    stays f32 in-kernel; weights AND moments round to bf16 each step —
    a documented deviation, see README's parity ledger).

    ``n_shards``: the mesh's ``embed``-axis size (1 off-mesh).
    """
    from ..ops.pallas.sorted_adam import pack_rows

    packed = pack_rows(table, block_rows, n_shards=n_shards)
    if dtype is not None:
        packed = packed.astype(dtype)
    return {
        "table": packed,
        "mu": jnp.zeros_like(packed),
        "nu": jnp.zeros_like(packed),
        "step": jnp.zeros((), jnp.int32),
    }


def sorted_dense_adam_update(opt_state, g_rows, ids, segments, offsets,
                             d: int,
                             lr: float = 1e-3, weight_decay: float = 1e-5,
                             b1: float = 0.9, b2: float = 0.999,
                             eps: float = 1e-8,
                             block_rows: int = 8192,
                             chunk_ids: int = 128,
                             reorder: str = "gather",
                             precision: str | None = None,
                             use_pallas: bool | None = None,
                             mesh=None,
                             frozen_spans=()):
    """EXACT dense torch-Adam via the chunk-vectorized sorted streaming
    kernel (ops/pallas/sorted_adam.py) — zero scatters, zero per-id scalar
    ops; the production-vocab update that breaks the ~330k ex/s
    scatter-class ceiling (PROFILE.md SS3).

    Identical semantics to the reference's ``torch.optim.Adam`` over
    ``nn.Embedding.weight`` (ctr_trainer.py:50-52): every row receives
    weight decay and moment decay every step — NO lazy/SparseAdam
    deviation. Differs from ``sparse_update_impl="dense"``
    (:func:`fused_dense_adam_update`) only in the mechanism: that impl's
    XLA formulation pays one ~12 ms scatter-add per step and its Pallas
    kernel a per-id scalar loop; this one pays neither.

    ``offsets``: owner -> packed row offset (EmbeddingCollection.offsets),
    needed to concatenate the per-owner sorts in global order. ``d``: the
    logical row width (the authority arrays are stored PACKED
    ``[V2/r, 128]``, see :func:`sorted_dense_adam_init`).
    ``reorder``: how gradient rows reach sorted order ("gather" |
    "payload", see ops/pallas/sorted_adam.owner_sorted_grads).
    ``mesh``: pass the trainer's mesh to run the kernel PER SHARD over the
    row-sharded authority via shard_map
    (ops/pallas/sorted_adam.sorted_dense_adam_apply_sharded) — the
    production-default impl keeps its streaming engine when the table is
    sharded (VERDICT r4 #1). ``use_pallas=False`` (default on CPU) runs
    the identical math as one XLA scatter-add + vectorized dense Adam on
    the unpacked view (free on CPU; on a real-TPU mesh the unpack reshape
    materializes a padded layout — the kernel path is the TPU path).

    Returns the new ``opt_state``; live weights =
    ``unpack_rows(state["table"], V, D)``.
    """
    from ..ops.pallas.fused_adam import fused_dense_adam_ref
    from ..ops.pallas.sorted_adam import (owner_sorted_grads,
                                          sorted_dense_adam_apply,
                                          sorted_dense_adam_apply_sharded)

    table, mu, nu = opt_state["table"], opt_state["mu"], opt_state["nu"]
    t = opt_state["step"] + 1
    tf = t.astype(jnp.float32)
    hp = jnp.stack([
        jnp.float32(lr), jnp.float32(weight_decay),
        jnp.float32(b1), jnp.float32(b2),
        1.0 / (1.0 - jnp.float32(b1) ** tf),
        1.0 / (1.0 - jnp.float32(b2) ** tf),
        jnp.float32(eps),
    ])
    def _out(nt, nm, nn):
        # frozen pretrained rows keep old weights AND moments (packed-
        # layout mask — no [V2, D] intermediate)
        if frozen_spans:
            from .freeze import blend_frozen_packed
            nt = blend_frozen_packed(table, nt, d, frozen_spans)
            nm = blend_frozen_packed(mu, nm, d, frozen_spans)
            nn = blend_frozen_packed(nu, nn, d, frozen_spans)
        return {"table": nt, "mu": nm, "nu": nn, "step": t}

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    r = 128 // d
    if not use_pallas or 128 % d != 0 or ids.shape[0] == 0:
        v2 = table.shape[0] * r
        dt = table.dtype
        # same quantization semantics as the kernel: math in f32, stored
        # values rounded to the storage dtype each step
        nt, nm, nn = fused_dense_adam_ref(
            table.reshape(v2, d).astype(jnp.float32),
            mu.reshape(v2, d).astype(jnp.float32),
            nu.reshape(v2, d).astype(jnp.float32),
            g_rows, ids, hp)
        return _out(nt.astype(dt).reshape(-1, 128),
                    nm.astype(dt).reshape(-1, 128),
                    nn.astype(dt).reshape(-1, 128))
    if mesh is not None:
        # interpret resolves from the MESH's platform inside the wrapper
        return _out(*sorted_dense_adam_apply_sharded(
            mesh, table, mu, nu, ids, g_rows, hp, d, segments=segments,
            offsets=offsets, block_rows=block_rows, chunk_ids=chunk_ids,
            reorder=reorder, precision=precision))
    interpret = jax.default_backend() != "tpu"
    sorted_ids, g_sorted = owner_sorted_grads(ids, g_rows, segments,
                                              offsets, reorder=reorder)
    return _out(*sorted_dense_adam_apply(
        table, mu, nu, sorted_ids, g_sorted, hp, d, block_rows=block_rows,
        chunk_ids=chunk_ids, precision=precision, interpret=interpret))


def step_lr(step_size: int, gamma: float):
    """StepLR multiplier: ``gamma ** (epoch // step_size)``.

    The returned schedule expects the *epoch* index (the reference steps its
    scheduler once per epoch, ctr_trainer.py:83-86).
    """

    def schedule(epoch):
        return gamma ** (epoch // step_size)

    return schedule
