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


def step_lr(step_size: int, gamma: float):
    """StepLR multiplier: ``gamma ** (epoch // step_size)``.

    The returned schedule expects the *epoch* index (the reference steps its
    scheduler once per epoch, ctr_trainer.py:83-86).
    """

    def schedule(epoch):
        return gamma ** (epoch // step_size)

    return schedule
