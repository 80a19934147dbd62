"""Per-row domain selection.

The reference's universal output idiom is: compute every domain branch on the
full batch, then ``final = where(domain_id == d, y_d, final)`` in a Python
loop (e.g. sharebottom.py:47-50, ple.py:61-64, star.py:114-116). With branch
outputs stacked on a leading domain axis this is a single gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def domain_select(ys: jnp.ndarray, domain_id: jnp.ndarray) -> jnp.ndarray:
    """Select ``ys[domain_id[b], b]`` per row.

    Args:
        ys: ``[D, B]`` or ``[D, B, 1]`` stacked per-domain outputs.
        domain_id: ``[B]`` int domain indicator.

    Returns: ``[B]``.
    """
    if ys.ndim == 3:
        ys = ys[..., 0]
    d = jnp.clip(domain_id.astype(jnp.int32), 0, ys.shape[0] - 1)
    return jnp.take_along_axis(ys.T, d[:, None], axis=1)[:, 0]
