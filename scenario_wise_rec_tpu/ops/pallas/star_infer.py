"""Pallas fused STAR inference kernel.

STAR's eval forward after embedding (reference star.py:79-118): batch-stat
domain norm with shared⊙specific gamma / shared+specific beta, an FCN whose
layer-d weight is ``W_shared ⊙ W_domain`` with per-domain BatchNorm + ReLU
after every layer (including the final width-1 one — quirk preserved), an
auxiliary MLP whose logit is added pre-sigmoid, and per-row domain select.

All weights fold to per-domain affines at eval (BN running stats are
constants — folding.py), so the entire post-embedding stack runs in ONE
kernel per batch tile out of VMEM: one HBM read of the embedding tile, one
HBM write of the probabilities. The only cross-row coupling — the domain
norm's current-batch mean/rstd (star.py:95-98) — is a cheap one-pass
reduction over ``emb`` computed OUTSIDE the kernel and passed in as two
``[in]`` vectors, so numerics match ``apply(train=False)`` exactly.

Preconditions: eval mode, relu aux-MLP activation.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import (dot as _dot, full_spec as _full_spec,
                      pad_rows as _pad_rows, row_spec as _row_spec)

Affine = Tuple[jnp.ndarray, jnp.ndarray]


def star_fused_infer(
    emb: jnp.ndarray,          # [B, in]
    domain_id: jnp.ndarray,    # [B]
    mean: jnp.ndarray,         # [in]  batch mean of emb
    rstd: jnp.ndarray,         # [in]  1/sqrt(batch var + eps)
    dn_gamma: jnp.ndarray,     # [D, in]  share_gamma * gamma_d
    dn_beta: jnp.ndarray,      # [D, in]  share_beta + beta_d
    fcn_stages: Sequence[Affine],  # each (W[D,in,out], b[D,out]); BN folded;
                                   # relu after EVERY stage incl. final [.,1]
    aux_stages: Sequence[Affine],  # aux MLP hidden affines (BN folded), relu
    aux_out: Affine,               # (W[h,1], b[1])
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs[B] = sigmoid(domain_select(FCN_d(DN_d(emb))) + aux(emb))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = emb.shape[0]
    D = dn_gamma.shape[0]
    n_fcn = len(fcn_stages)
    n_aux = len(aux_stages)

    tb = min(block_rows, B)
    pad = (-B) % tb
    emb = _pad_rows(emb, pad)
    domain_id = _pad_rows(domain_id, pad)
    bp = emb.shape[0]
    did = jnp.clip(domain_id.astype(jnp.int32), 0, D - 1).reshape(-1, 1)

    flat: List[jnp.ndarray] = [mean.reshape(1, -1), rstd.reshape(1, -1),
                               dn_gamma, dn_beta]
    for w, b in fcn_stages:
        flat += [w, b]
    for w, b in aux_stages:
        flat += [w, b]
    flat += [aux_out[0], aux_out[1]]

    def kernel(emb_ref, did_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        x = emb_ref[:]
        mean_r, rstd_r, g_r, b_r = ws[0], ws[1], ws[2], ws[3]
        k = 4
        f_ws = []
        for _ in range(n_fcn):
            f_ws.append((ws[k], ws[k + 1]))
            k += 2
        a_ws = []
        for _ in range(n_aux):
            a_ws.append((ws[k], ws[k + 1]))
            k += 2
        ao_w, ao_b = ws[k], ws[k + 1]

        # aux branch on the raw embedding (star.py:87)
        a = x
        for w_ref, b_ref in a_ws:
            a = jax.nn.relu(_dot(a, w_ref[:]) + b_ref[:])
        a = _dot(a, ao_w[:]) + ao_b[:]  # [tb, 1]

        normed = (x - mean_r[:]) * rstd_r[:]
        did_col = did_ref[:]
        out = jnp.zeros((x.shape[0], 1), jnp.float32)
        for d in range(D):
            h = g_r[d] * normed + b_r[d]
            for w_ref, b_ref in f_ws:
                # relu after every layer incl. the final width-1 one
                # (star.py:109-110 quirk)
                h = jax.nn.relu(_dot(h, w_ref[d]) + b_ref[d])
            out = jnp.where(did_col == d, h, out)
        out_ref[:] = jax.nn.sigmoid(out + a)

    in_specs = [
        _row_spec(tb, emb.shape[1]),
        _row_spec(tb, 1),
    ] + [_full_spec(a) for a in flat]

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=_row_spec(tb, 1),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(emb, did, *flat)
    return out[:B, 0]
