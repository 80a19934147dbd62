"""Global compute configuration.

``compute_dtype``: when set to ``jnp.bfloat16``, matmul/einsum inputs are
cast to bf16 and accumulated in f32 on the MXU (2x MXU throughput, halved
weight-side HBM traffic). Parameters stay f32. Default ``None`` keeps full
f32 everywhere — the parity configuration.

Set it BEFORE building/jitting a model (the flag is read at trace time):

    from scenario_wise_rec_tpu.core import config
    config.set_compute_dtype(jnp.bfloat16)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_compute_dtype = None


def set_compute_dtype(dtype: Optional[jnp.dtype]) -> None:
    global _compute_dtype
    _compute_dtype = dtype


def get_compute_dtype():
    return _compute_dtype


def matmul(x, w):
    """x @ w honoring the compute dtype (f32 accumulation on the MXU)."""
    if _compute_dtype is not None:
        return jnp.dot(x.astype(_compute_dtype), w.astype(_compute_dtype),
                       preferred_element_type=jnp.float32)
    return x @ w


def einsum(spec: str, *args):
    """einsum honoring the compute dtype (f32 accumulation)."""
    if _compute_dtype is not None:
        args = tuple(a.astype(_compute_dtype) for a in args)
        return jnp.einsum(spec, *args, preferred_element_type=jnp.float32)
    return jnp.einsum(spec, *args)
