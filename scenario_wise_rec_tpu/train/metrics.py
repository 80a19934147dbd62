"""Evaluation metrics with sklearn-exact semantics.

The reference scores with sklearn ``roc_auc_score`` + ``log_loss``
(ctr_trainer.py:6,57,111,143-150). We re-implement both in numpy (rank-based
AUC with average ranks for ties == sklearn's trapezoid ROC integral for binary
labels) so evaluation needs no sklearn at runtime, and validate parity against
sklearn in tests. A device-side (jnp) AUC is provided for on-TPU evaluation of
large test sets without host round-trips.

Also ports ``topk_metrics`` (basic/metric.py:11-94 — dead code in the
reference, implemented for API completeness).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def auc_score(y_true, y_score) -> float:
    """Binary ROC-AUC via average ranks (ties handled like sklearn)."""
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()
    if np.isnan(y_score).any():
        # sklearn raises on NaN input; fail loud instead of silently
        # averaging a NaN tie group (np.unique collapses NaNs)
        raise ValueError("Input contains NaN.")
    n_pos = float(np.sum(y_true == 1))
    n_neg = float(len(y_true) - n_pos)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            "Only one class present in y_true. ROC AUC score is not defined."
        )
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(len(y_score), dtype=np.float64)
    sorted_scores = y_score[order]
    # average rank within tie groups, vectorized: np.unique on the sorted
    # scores yields group ids + sizes in one pass (the former Python
    # while-loop was O(#tie-groups) and crawled on large quantized evals)
    _, inv, counts = np.unique(sorted_scores, return_inverse=True,
                               return_counts=True)
    firsts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    avg_rank = firsts + (counts - 1) / 2.0 + 1.0
    ranks[order] = avg_rank[inv]
    pos_rank_sum = float(np.sum(ranks[y_true == 1]))
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def log_loss_score(y_true, y_pred, eps: float = 1e-15) -> float:
    """Binary log loss with sklearn's probability clipping."""
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    p = np.clip(np.asarray(y_pred, dtype=np.float64).ravel(), eps, 1 - eps)
    return float(-np.mean(y_true * np.log(p) + (1 - y_true) * np.log(1 - p)))


def auc_score_device(y_true, y_score, mask=None):
    """On-device AUC (jnp): average-rank formulation, O(n log n) sort.

    Use for large eval sets to avoid host transfers; matches
    :func:`auc_score` to float32 precision. Optional bool/float ``mask``
    restricts the AUC to a subset (e.g. one domain) with STATIC shapes:
    masked-out entries are pushed to the sentinel score -1.0, below every
    real score, so subset ranks are global ranks minus the masked count
    (probabilities live in (0, 1), strictly above the sentinel; a score of
    exactly -1.0 would tie with it — callers pass probabilities, which
    cannot).

    NaN scores are NOT detected here (this is a pure traced jnp function);
    the trainer's device-eval wrappers fail loud on NaN before calling,
    mirroring the host path (CTRTrainer._check_eval_scores).
    """
    import jax.numpy as jnp

    y_true = y_true.astype(jnp.float32).ravel()
    y_score = y_score.astype(jnp.float32).ravel()
    n = y_score.shape[0]
    if mask is not None:
        m = mask.astype(jnp.float32).ravel()
        n_masked = n - jnp.sum(m)
        y_score = jnp.where(m > 0, y_score, -1.0)
    order = jnp.argsort(y_score, stable=True)
    s = y_score[order]
    # rank of each sorted element with tie-averaging: for each element, the
    # average of (first index, last index) of its tie group, 1-based.
    idx = jnp.arange(n)
    is_start = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    group_id = jnp.cumsum(is_start) - 1
    first = jnp.full(n, n, idx.dtype).at[group_id].min(idx, mode="drop")
    last = jnp.zeros(n, idx.dtype).at[group_id].max(idx, mode="drop")
    avg_rank_sorted = 0.5 * (first[group_id] + last[group_id]) + 1.0
    ranks = jnp.zeros(n, jnp.float32).at[order].set(avg_rank_sorted)
    yt = y_true
    if mask is None:
        n_pos = jnp.sum(yt)
        n_neg = n - n_pos
        pos_rank_sum = jnp.sum(ranks * yt)
    else:
        ranks = ranks - n_masked          # subset-local ranks
        n_pos = jnp.sum(yt * m)
        n_neg = jnp.sum(m) - n_pos
        pos_rank_sum = jnp.sum(ranks * yt * m)
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def log_loss_device(y_true, y_pred, mask=None, eps: float = 1e-7):
    """On-device binary log loss; optional subset ``mask`` (static shapes,
    mean over the subset).

    Clips probabilities at 1e-7 instead of sklearn's 1e-15: in float32
    ``1 - 1e-15 == 1.0`` so the sklearn constant would produce ``log(0)``
    on saturated probabilities. Matches :func:`log_loss_score` exactly for
    probs in [1e-7, 1 - 1e-7]; EXACTLY-saturated f32 probs score 16.1
    per entry instead of the host's 34.5 (both are arbitrary clip
    artifacts)."""
    import jax.numpy as jnp

    y_true = y_true.astype(jnp.float32).ravel()
    p = jnp.clip(y_pred.astype(jnp.float32).ravel(), eps, 1 - eps)
    ll = -(y_true * jnp.log(p) + (1 - y_true) * jnp.log(1 - p))
    if mask is None:
        return jnp.mean(ll)
    m = mask.astype(jnp.float32).ravel()
    return jnp.sum(jnp.where(m > 0, ll, 0.0)) / jnp.sum(m)


def topk_metrics(y_true, y_pred, topKs=(5,)):
    """NDCG/MRR/Recall/Precision/Hit @ K (reference basic/metric.py:11-94).

    ``y_true``/``y_pred``: dict ``{user_id: [item scores/ids...]}``.
    """
    assert len(y_true) == len(y_pred)
    if not isinstance(topKs, (tuple, list)):
        raise ValueError("topKs wrong, it should be tuple or list")

    pred_array = []
    true_array = []
    for u in y_true.keys():
        pred_array.append(y_pred[u])
        true_array.append(y_true[u])

    ndcg_result, mrr_result = [], []
    hit_result, precision_result, recall_result = [], [], []
    for idx in range(len(topKs)):
        ndcgs = mrrs = hits = precisions = recalls = 0
        k = topKs[idx]
        for i in range(len(true_array)):
            if len(true_array[i]) != 0:
                mrr_tmp = ndcg_tmp = 0
                hit_tmp = 0.0
                pred_k = pred_array[i][:k]
                for position, item in enumerate(pred_k):
                    if item in true_array[i]:
                        hit_tmp += 1.0
                        mrr_tmp = max(mrr_tmp, 1.0 / (position + 1))
                        ndcg_tmp += 1.0 / np.log2(position + 2)
                hits += hit_tmp > 0
                mrrs += mrr_tmp
                ndcgs += ndcg_tmp
                precisions += hit_tmp / len(pred_k)
                recalls += hit_tmp / len(true_array[i])
        n_users = len(true_array)
        ndcg_result.append(round(ndcgs / n_users, 4))
        mrr_result.append(round(mrrs / n_users, 4))
        hit_result.append(round(hits / n_users, 4))
        precision_result.append(round(precisions / n_users, 4))
        recall_result.append(round(recalls / n_users, 4))

    results = defaultdict(list)
    for idx in range(len(topKs)):
        results["NDCG"].append(f"NDCG@{topKs[idx]}: {ndcg_result[idx]:.4f}")
        results["MRR"].append(f"MRR@{topKs[idx]}: {mrr_result[idx]:.4f}")
        results["Recall"].append(f"Recall@{topKs[idx]}: {recall_result[idx]:.4f}")
        results["Hit"].append(f"Hit@{topKs[idx]}: {hit_result[idx]:.4f}")
        results["Precision"].append(
            f"Precision@{topKs[idx]}: {precision_result[idx]:.4f}"
        )
    return results
