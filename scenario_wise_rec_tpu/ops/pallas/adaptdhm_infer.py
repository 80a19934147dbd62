"""Pallas fused AdaptDHM inference kernel.

AdaptDHM's eval forward after embedding (reference adaptdhm.py:84-113, eval
branch): route each row to a cluster by argmax soft-assignment against the
FROZEN EMA centers, run the shared⊙per-cluster FCN (no biases — the
reference never applies them, quirk preserved in models/adaptdhm.py), and
gather the routed cluster's sigmoid output.

The router is computed OUTSIDE the kernel (one ``[B, C]`` matmul + argmax on
the L2-normalized centers; softmax is monotone so argmax(softmax(s)) ==
argmax(s) exactly) and passed in per row — at eval time the centers are
constants, so this matches ``apply(train=False)`` bit-for-bit. The kernel
then runs every cluster branch on the batch tile out of VMEM and selects
per row: one HBM read of the embedding tile, one HBM write of the probs.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._common import (dot as _dot, full_spec as _full_spec,
                      pad_rows as _pad_rows, row_spec as _row_spec)


def adaptdhm_fused_infer(
    emb: jnp.ndarray,        # [B, in]
    router: jnp.ndarray,     # [B] cluster ids (argmax soft-assignment)
    stages: Sequence[jnp.ndarray],  # each W[C, in, out]; shared⊙cluster,
                                    # NO bias; relu on all but the last,
                                    # sigmoid on the last width-1 layer
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs[B] = routed-cluster FCN output."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = emb.shape[0]
    C = stages[0].shape[0]
    n_stage = len(stages)

    tb = min(block_rows, B)
    pad = (-B) % tb
    emb = _pad_rows(emb, pad)
    router = _pad_rows(router, pad)
    bp = emb.shape[0]
    rid = jnp.clip(router.astype(jnp.int32), 0, C - 1).reshape(-1, 1)

    flat: List[jnp.ndarray] = list(stages)

    def kernel(emb_ref, rid_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        x = emb_ref[:]
        rid_col = rid_ref[:]
        out = jnp.zeros((x.shape[0], 1), jnp.float32)
        for c in range(C):
            h = x
            for i in range(n_stage - 1):
                h = jax.nn.relu(_dot(h, ws[i][c]))
            h = jax.nn.sigmoid(_dot(h, ws[n_stage - 1][c]))
            out = jnp.where(rid_col == c, h, out)
        out_ref[:] = out

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
    )(emb, rid, *flat)
    return out[:B, 0]
