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
                                eps: float = 1e-8):
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


def step_lr(step_size: int, gamma: float):
    """StepLR multiplier: ``gamma ** (epoch // step_size)``.

    The returned schedule expects the *epoch* index (the reference steps its
    scheduler once per epoch, ctr_trainer.py:83-86).
    """

    def schedule(epoch):
        return gamma ** (epoch // step_size)

    return schedule
