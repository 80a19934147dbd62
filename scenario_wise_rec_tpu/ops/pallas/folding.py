"""Eval-time constant folding: Linear→BatchNorm chains become one affine.

At eval, BatchNorm1d normalizes with *running* statistics — per-feature
constants — so ``BN(xW + b)`` folds into ``x W' + b'`` with

    scale = gamma / sqrt(running_var + eps)
    W'    = W * scale
    b'    = (b - running_mean) * scale + beta

This is the precondition for the fused inference kernels in this package:
an eval MLP collapses to a chain of affine+activation stages with no
normalization state, so the whole stack can run out of VMEM in one kernel.
(Reference MLP structure: basic/layers.py:231-264.)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from ..nn import BN_EPS

Affine = Tuple[jnp.ndarray, jnp.ndarray]  # (W, b) — possibly stacked [N, in, out]


def fold_stacked_mlp_eval(params, state) -> Tuple[List[Affine], Optional[Affine]]:
    """Fold a (stacked) ``ops.nn.MLP``'s eval forward into affine stages.

    Works on both plain MLP params and stacked ones (every leaf carries a
    leading member axis): broadcasting handles either. Returns
    ``(hidden_stages, out_stage)`` where each stage is ``(W, b)`` and
    ``out_stage`` is ``None`` when the MLP has no output head.
    """
    stages: List[Affine] = []
    for lp, ls in zip(params["layers"], state["layers"]):
        scale = lp["bn"]["gamma"] / jnp.sqrt(ls["var"] + BN_EPS)
        w = lp["lin"]["w"] * scale[..., None, :]
        b = (lp["lin"]["b"] - ls["mean"]) * scale + lp["bn"]["beta"]
        stages.append((w, b))
    out = params.get("out")
    out_stage = (out["w"], out["b"]) if out is not None else None
    return stages, out_stage


def fold_bn_linear_eval(bn_params, bn_state, lin_params) -> Affine:
    """Fold the *reversed* order ``Linear(BN(x))`` into one affine.

    SAR-Net's DebiasExpertNet normalizes BEFORE the linear (reference
    sarnet.py:13-21): ``(x - m)·s·W + b`` with ``s = gamma/sqrt(var+eps)``
    becomes ``x W' + b'`` where ``W' = diag(s)·W`` (scale the *rows* of W)
    and ``b' = b + (beta - m·s) @ W``. Works on stacked leaves too (leading
    member axes broadcast).
    """
    scale = bn_params["gamma"] / jnp.sqrt(bn_state["var"] + BN_EPS)
    shift = bn_params["beta"] - bn_state["mean"] * scale
    w = lin_params["w"] * scale[..., :, None]
    b = lin_params["b"] + jnp.einsum("...i,...io->...o", shift, lin_params["w"])
    return w, b
