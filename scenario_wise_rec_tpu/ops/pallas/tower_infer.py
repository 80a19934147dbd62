"""Pallas fused "shared trunk → per-domain towers → select" inference kernel.

The tail shared by most reference models (sharebottom.py:28-50 and the tower
stages of ple/star/…): a shared MLP trunk on the embedded batch, then D tower
MLPs each computed on the full batch, sigmoid, and per-row selection by
``domain_indicator``. Fused into one kernel per batch tile: one HBM read of
the embedding tile, one HBM write of the probabilities; all weights stay in
VMEM across grid steps (constant index maps).

Preconditions: eval mode with BatchNorm folded to affines (folding.py) and
relu activations — the reference's default MLP config.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import full_spec as _full_spec

Affine = Tuple[jnp.ndarray, jnp.ndarray]



def trunk_towers_fused_infer(
    emb: jnp.ndarray,
    domain_id: jnp.ndarray,
    trunk_stages: Sequence[Affine],    # shared: each (W[in,out], b[out])
    tower_stages: Sequence[Affine],    # stacked: each (W[D,in,out], b[D,out])
    tower_out: Optional[Affine],       # (W[D,h,1], b[D,1]) or None
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs[B]: relu-trunk → per-domain relu-towers (+1-unit head) →
    sigmoid → select by ``domain_id``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = emb.shape[0]
    D = tower_stages[0][0].shape[0] if tower_stages else tower_out[0].shape[0]
    n_trunk = len(trunk_stages)
    n_tow = len(tower_stages)

    tb = min(block_rows, B)
    pad = (-B) % tb
    if pad:
        emb = jnp.pad(emb, ((0, pad), (0, 0)))
        domain_id = jnp.pad(domain_id, (0, pad))
    bp = emb.shape[0]
    did = jnp.clip(domain_id.astype(jnp.int32), 0, D - 1).reshape(-1, 1)

    flat: List[jnp.ndarray] = []
    for w, b in trunk_stages:
        flat += [w, b]
    for w, b in tower_stages:
        flat += [w, b]
    if tower_out is not None:
        flat += [tower_out[0], tower_out[1]]

    def kernel(emb_ref, did_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        h = emb_ref[:]
        k = 0
        for _ in range(n_trunk):
            h = jax.nn.relu(
                jnp.dot(h, ws[k][:], preferred_element_type=jnp.float32)
                + ws[k + 1][:]
            )
            k += 2
        t_ws = []
        for _ in range(n_tow):
            t_ws.append((ws[k], ws[k + 1]))
            k += 2
        head = (ws[k], ws[k + 1]) if tower_out is not None else None

        did_col = did_ref[:]
        out = jnp.zeros((h.shape[0], 1), jnp.float32)
        for d in range(D):
            t = h
            for w_ref, b_ref in t_ws:
                t = jax.nn.relu(
                    jnp.dot(t, w_ref[d], preferred_element_type=jnp.float32)
                    + b_ref[d]
                )
            if head is not None:
                t = jnp.dot(t, head[0][d],
                            preferred_element_type=jnp.float32) + head[1][d]
            out = jnp.where(did_col == d, jax.nn.sigmoid(t), out)
        out_ref[:] = out

    in_specs = [
        pl.BlockSpec((tb, emb.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [_full_spec(a) for a in flat]

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(emb, did, *flat)
    return out[:B, 0]
