"""Loss functions.

The trainer's loss is BCE on *post-sigmoid probabilities* — the reference
hard-codes ``torch.nn.BCELoss`` on model outputs that are already
probabilities (ctr_trainer.py:56,70). torch clamps each log term at -100; we
reproduce that so extreme probabilities don't produce inf loss.

``hinge_loss`` / ``bpr_loss`` port the reference's pairwise losses
(basic/loss_func.py:5-33 — dead code there, kept for API completeness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_loss(y_pred_prob, y_true, weights=None):
    """Mean binary cross entropy on probabilities (torch BCELoss semantics).

    ``weights``: optional per-example 0/1 mask for padded batches — the mean
    is over real examples only, which makes padded full-batch jit exact.
    """
    y_true = y_true.astype(jnp.float32)
    # Double-where idiom: at p == 0 (or 1 - p == 0, both reachable — f32
    # sigmoid underflows to exactly 0.0 below logit ~-104) a bare
    # maximum(log(p), -100) has NaN gradient: the max's VJP multiplies
    # 0 (losing branch) by inf (d log/dp at 0). Evaluate log only on a
    # positive surrogate so both forward (torch's -100 clamp) and backward
    # (zero grad in the clamped region) are finite.
    p = y_pred_prob
    log_p = jnp.where(p > 0,
                      jnp.maximum(jnp.log(jnp.where(p > 0, p, 1.0)), -100.0),
                      -100.0)
    q = 1.0 - p
    log_1p = jnp.where(q > 0,
                       jnp.maximum(jnp.log(jnp.where(q > 0, q, 1.0)), -100.0),
                       -100.0)
    per_example = -(y_true * log_p + (1.0 - y_true) * log_1p)
    if weights is None:
        return jnp.mean(per_example)
    weights = weights.astype(jnp.float32)
    return jnp.sum(per_example * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def hinge_loss(pos_score, neg_score, margin: float = 2.0):
    """Pairwise hinge (reference loss_func.py:5-17)."""
    return jnp.mean(jnp.clip(margin - pos_score + neg_score, a_min=0.0))


def bpr_loss(pos_score, neg_score):
    """Bayesian personalized ranking (reference loss_func.py:20-33)."""
    return jnp.mean(-jnp.log(jax.nn.sigmoid(pos_score - neg_score)))
