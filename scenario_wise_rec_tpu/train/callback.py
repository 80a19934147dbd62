"""Early stopping on validation AUC with best-parameter snapshot.

Reference: basic/callback.py:4-33. Semantics preserved exactly: improvement
resets the counter and snapshots weights; training stops after ``patience``
consecutive non-improving epochs (the reference's ``trial_counter + 1 <
patience`` off-by-one included).
"""

from __future__ import annotations

import jax


class EarlyStopper:
    def __init__(self, patience: int):
        self.patience = patience
        self.trial_counter = 0
        self.best_auc = 0.0
        self.best_weights = None

    def stop_training(self, val_auc: float, weights) -> bool:
        """Return True when training should stop.

        ``weights`` is any pytree (params + state); a device-side copy is
        snapshotted (no host transfer — restore is free on TPU).
        """
        if val_auc > self.best_auc:
            self.best_auc = val_auc
            self.trial_counter = 0
            # materialize a real device-side copy: the live buffers are
            # donated to the next train step and would be invalidated
            import jax.numpy as jnp

            self.best_weights = jax.tree_util.tree_map(
                lambda a: jnp.array(a, copy=True), weights
            )
            return False
        elif self.trial_counter + 1 < self.patience:
            self.trial_counter += 1
            return False
        else:
            return True
