"""Pallas fused SAR-Net inference kernel.

The eval forward of SAR-Net after embedding (reference sarnet.py:70-93) is a
fan of tiny dense ops: D per-domain elementwise scale/shifts of the embedding,
8 shared + D×2 specific debias experts (BN→Linear(·,16), folded to affines by
folding.fold_bn_linear_eval — at eval the BN uses running stats), a softmax
gate, the gate-weighted expert mixture, and an MLP[32,32]→sigmoid head. All
weights together are well under a MB, so the whole stack runs out of VMEM for
each batch tile: one HBM read of the embedding tile, one HBM write of the
probabilities.

Numerical equality with ``model.apply(train=False)`` is pinned by
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import dot as _dot, full_spec as _full_spec, row_spec as _row_spec

Affine = Tuple[jnp.ndarray, jnp.ndarray]





def sarnet_fused_infer(
    emb: jnp.ndarray,                 # [B, in]
    domain_id: jnp.ndarray,           # [B]
    dom_w: jnp.ndarray,               # [D, in] elementwise scale
    dom_b: jnp.ndarray,               # [D, in] elementwise shift
    shared_lin: Affine,               # (W[n_sh, in, 16], b[n_sh, 16]) folded
    spec_lin: Affine,                 # (W[D, n_sp, in, 16], b[D, n_sp, 16])
    gate: Affine,                     # (W[in, n_sh+n_sp], b[n_sh+n_sp])
    final_stages: Sequence[Affine],   # each (W[in, out], b[out]) folded
    final_out: Affine,                # (W[h, 1], b[1])
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, _ = emb.shape
    D, n_sp = spec_lin[0].shape[0], spec_lin[0].shape[1]
    n_sh = shared_lin[0].shape[0]
    n_fin = len(final_stages)

    tb = min(block_rows, B)
    pad = (-B) % tb
    if pad:
        emb = jnp.pad(emb, ((0, pad), (0, 0)))
        domain_id = jnp.pad(domain_id, (0, pad))
    bp = emb.shape[0]
    did = jnp.clip(domain_id.astype(jnp.int32), 0, D - 1).reshape(-1, 1)

    flat: List[jnp.ndarray] = [dom_w, dom_b, shared_lin[0], shared_lin[1],
                               spec_lin[0], spec_lin[1], gate[0], gate[1]]
    for w, b in final_stages:
        flat += [w, b]
    flat += [final_out[0], final_out[1]]

    def kernel(emb_ref, did_ref, dw, db, shw, shb, spw, spb, gw, gb, *refs):
        out_ref = refs[-1]
        fin = [(refs[2 * i], refs[2 * i + 1]) for i in range(n_fin)]
        ow, ob = refs[2 * n_fin], refs[2 * n_fin + 1]

        x = emb_ref[:]
        did_col = did_ref[:]
        # per-domain scale/shift (sarnet.py:70-71) + row-select (:79-81)
        scaled = [x * dw[d] + db[d] for d in range(D)]
        sel = scaled[0]
        for d in range(1, D):
            sel = jnp.where(did_col == d, scaled[d], sel)

        experts = [_dot(sel, shw[e]) + shb[e] for e in range(n_sh)]
        for j in range(n_sp):
            sj = _dot(scaled[0], spw[0, j]) + spb[0, j]
            for d in range(1, D):
                sj = jnp.where(did_col == d,
                               _dot(scaled[d], spw[d, j]) + spb[d, j], sj)
            experts.append(sj)

        g = jax.nn.softmax(_dot(sel, gw[:]) + gb[:], axis=1)  # [tb, E]
        mixed = g[:, 0:1] * experts[0]
        for e in range(1, n_sh + n_sp):
            mixed = mixed + g[:, e:e + 1] * experts[e]

        h = mixed
        for w_ref, b_ref in fin:
            h = jax.nn.relu(_dot(h, w_ref[:]) + b_ref[:])
        out_ref[:] = jax.nn.sigmoid(_dot(h, ow[:]) + ob[:])

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[_row_spec(tb, emb.shape[1]), _row_spec(tb, 1)]
        + [_full_spec(a) for a in flat],
        out_specs=_row_spec(tb, 1),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(emb, did, *flat)
    return out[:B, 0]
