"""Shared BlockSpec / padding / dot helpers for the fused-inference kernels.

Every kernel in this package tiles the batch into ``tb``-row blocks (row
specs with an ``i -> (i, 0)`` index map) and keeps the weight operands whole
in VMEM with constant index maps so Mosaic leaves them resident across grid
steps.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Affine = Tuple[jnp.ndarray, jnp.ndarray]


def full_spec(arr):
    """Whole-array VMEM spec with a constant index map (weights)."""
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def row_spec(tb, width):
    """Batch-tiled ``[tb, width]`` VMEM spec (activations)."""
    return pl.BlockSpec((tb, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def pad_rows(arr, pad):
    """Zero-pad the leading (batch) axis by ``pad`` rows."""
    return jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1)) if pad else arr


def dot(x, w):
    """MXU matmul with f32 accumulation."""
    return jnp.dot(x, w, preferred_element_type=jnp.float32)
