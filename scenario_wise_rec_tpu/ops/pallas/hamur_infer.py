"""Pallas fused HAMUR inference: segmented at the adapter domain-norms.

HAMUR's eval forward (reference hamur.py:103-243) is per-row EXCEPT the
adapter cells' domain norm, which normalizes with CURRENT-BATCH statistics
(hamur.py:191-195) — a cross-row reduction in the middle of the network. The
fused design therefore splits the stack into ``len(adapters)+1`` segments:

- each segment runs fused in one Pallas kernel per batch tile: the per-domain
  [Linear→BN(folded)→ReLU] blocks and, at the segment end, the adapter's
  down-proj → sigmoid → up-proj (per-row math on the hyper matrix);
- between segments, XLA computes the adapter norm's batch mean/var over the
  segment output (one cheap reduction over ``[B, D, w]``) and folds them with
  gamma/beta into a per-domain affine that the NEXT segment applies before
  the residual add.

The adapter contraction is re-associated MXU-style:
``h·(U H_b V) = ((h·U)·H_b)·V`` — O(B·(w·k + k² + k·m)) instead of the
reference's materialized per-row [w, m] weight (O(B·w·m·k²) FLOPs); same
math up to float reassociation.

The hyper-network output ``H[B, k, k]`` is shared by every adapter and is
computed once outside (folded BN affines) and fed to each segment kernel.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import (dot as _dot, full_spec as _full_spec,
                      pad_rows as _pad_rows, row_spec as _row_spec)

Affine = Tuple[jnp.ndarray, jnp.ndarray]


def _segment(
    x: jnp.ndarray,                   # [B, in] (first) or [B, D·w] (later,
                                      # domain-flattened — see layout note)
    stages: Sequence[Affine],         # each (W[D,in,out], b[D,out]), relu
    hyper: Optional[jnp.ndarray],     # [B, k, k] or None (final, no adapter)
    adapter: Optional[dict],          # u/v/b arrays, or None
    dn_affine: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # (scale, shift)
                                      # [D, w] applied as t*scale+shift+h
    t_pre: Optional[jnp.ndarray],     # [B, D·w] previous adapter pre-norm
    final: Optional[Affine],          # (W[D,w,1], b[D,1]) + sigmoid + select
    domain_id: Optional[jnp.ndarray],
    block_rows: int,
    interpret: bool,
    first: bool,
):
    # Layout note: the inter-segment per-domain activations travel as 2-D
    # [B, D·w], NOT [B, D, w] — XLA's TPU layout tiles the last TWO dims of
    # a 3-D array (T(4,128)), so [4096, 3, 16] pads 3->4 and 16->128 (8-32x
    # bytes) AND the axon XLA stack-allocates these chained pallas outputs
    # in scoped VMEM, OOMing the compile at batch 4096 (measured). The flat
    # layout is compact and slices per domain statically in the kernel.
    B = x.shape[0]
    if final is not None:
        D = final[0].shape[0]
    else:
        D = stages[0][0].shape[0] if stages else dn_affine[0].shape[0]
    n_stage = len(stages)
    w_in = None if first else x.shape[1] // D

    tb = min(block_rows, B)
    pad = (-B) % tb
    x = _pad_rows(x, pad)
    bp = x.shape[0]
    flat: List[jnp.ndarray] = []
    for w, b in stages:
        flat += [w, b]
    if dn_affine is not None:
        flat += [dn_affine[0], dn_affine[1]]
    if adapter is not None:
        flat += [adapter["u_down"], adapter["v_down"], adapter["b_down"],
                 adapter["u_up"], adapter["v_up"], adapter["b_up"]]
    if final is not None:
        flat += [final[0], final[1]]

    row_ins = [x]
    row_specs = [_row_spec(tb, x.shape[1])]
    if t_pre is not None:
        t_pre = _pad_rows(t_pre, pad)
        row_ins.append(t_pre)
        row_specs.append(_row_spec(tb, t_pre.shape[1]))
    if hyper is not None:
        hyper = _pad_rows(hyper, pad)
        row_ins.append(hyper)
        row_specs.append(pl.BlockSpec((tb,) + hyper.shape[1:],
                                      lambda i: (i, 0, 0)))
    if domain_id is not None:
        did = jnp.clip(_pad_rows(domain_id, pad).astype(jnp.int32),
                       0, D - 1).reshape(-1, 1)
        row_ins.append(did)
        row_specs.append(_row_spec(tb, 1))

    w_out = (stages[-1][0].shape[-1] if stages
             else (dn_affine[0].shape[-1] if dn_affine is not None
                   else x.shape[-1]))
    if final is not None:
        out_shapes = jax.ShapeDtypeStruct((bp, 1), jnp.float32)
        out_specs = _row_spec(tb, 1)
    else:
        out_shapes = (jax.ShapeDtypeStruct((bp, D * w_out), jnp.float32),
                      jax.ShapeDtypeStruct((bp, D * w_out), jnp.float32))
        out_specs = (_row_spec(tb, D * w_out), _row_spec(tb, D * w_out))

    def kernel(*refs):
        n_row = len(row_ins)
        rrefs = refs[:n_row]
        wrefs = refs[n_row:n_row + len(flat)]
        orefs = refs[n_row + len(flat):]
        k = 0

        def take(n):
            nonlocal k
            got = wrefs[k:k + n]
            k += n
            return got

        st = [take(2) for _ in range(n_stage)]
        dn = take(2) if dn_affine is not None else None
        ad = take(6) if adapter is not None else None
        fin = take(2) if final is not None else None

        ri = 0
        x_ref = rrefs[ri]
        ri += 1
        tpre_ref = None
        if t_pre is not None:
            tpre_ref = rrefs[ri]
            ri += 1
        hyper_ref = None
        if hyper is not None:
            hyper_ref = rrefs[ri]
            ri += 1
        did_ref = rrefs[ri] if domain_id is not None else None

        hs = []
        for d in range(D):
            if first:
                h = x_ref[:]
            else:
                h = x_ref[:, d * w_in:(d + 1) * w_in]
                # adapter norm folded affine + residual (hamur.py:191-198)
                h = (tpre_ref[:, d * w_in:(d + 1) * w_in] * dn[0][d]
                     + dn[1][d] + h)
            for w_ref, b_ref in st:
                h = jax.nn.relu(_dot(h, w_ref[d]) + b_ref[d])
            hs.append(h)

        if final is not None:
            out = jnp.zeros((hs[0].shape[0], 1), jnp.float32)
            did_col = did_ref[:]
            for d in range(D):
                y = jax.nn.sigmoid(_dot(hs[d], fin[0][d]) + fin[1][d])
                out = jnp.where(did_col == d, y, out)
            orefs[0][:] = out
            return

        u_d, v_d, b_d, u_u, v_u, b_u = ad
        hy = hyper_ref[:]  # [tb, k, k]
        for d in range(D):
            h = hs[d]
            # ((h·U) H_b) V — re-associated down-proj
            p = _dot(h, u_d[:])                       # [tb, k]
            q = jnp.sum(p[:, :, None] * hy, axis=1)   # [tb, k]
            t = jax.nn.sigmoid(_dot(q, v_d[:]) + b_d[:])
            p2 = _dot(t, u_u[:])
            q2 = jnp.sum(p2[:, :, None] * hy, axis=1)
            t = _dot(q2, v_u[:]) + b_u[:]             # [tb, w] pre-norm
            orefs[0][:, d * w_out:(d + 1) * w_out] = t
            orefs[1][:, d * w_out:(d + 1) * w_out] = h

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=row_specs + [_full_spec(a) for a in flat],
        out_specs=out_specs,
        out_shape=out_shapes,
        # XLA stack-allocates the chained segment outputs in scoped VMEM;
        # under the default budget the compile OOMs at batch 4096
        # ("allocating on stack ... S(1)", measured). Raising the budget to
        # the full 128 MB VMEM lets the whole segment chain fit (the flat
        # 2-D [B, D·w] activation layout above keeps each tensor compact —
        # the 3-D form padded 8-32x and could not fit at any budget).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*row_ins, *flat)
    if final is not None:
        return out[:B, 0]
    return out[0][:B], out[1][:B]


def hamur_fused_infer(
    emb: jnp.ndarray,                    # [B, in]
    domain_id: jnp.ndarray,              # [B]
    hyper_stages: Sequence[Affine],      # folded hyper-net affines (relu)
    k: int,
    segments: Sequence[Sequence[Affine]],  # per segment: block affines
                                           # (W[D,in,out], b[D,out])
    adapters: Sequence[dict],            # per adapter: u_down v_down b_down
                                         # u_up v_up b_up gamma beta
    final: Affine,                       # (W[D,w,1], b[D,1])
    eps: float = 1e-5,
    block_rows: int = 1024,
    interpret: bool | None = None,
    w: jnp.ndarray | None = None,        # [B] 0/1 padding mask for the
                                         # adapter-norm batch stats
) -> jnp.ndarray:
    """probs[B] — segments run fused; adapter-norm batch stats in XLA."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert len(segments) == len(adapters) + 1

    # hyper-net once (shared by every adapter; hamur.py:117-119 runs it per
    # domain on the same input — identical outputs at eval)
    hyper = None
    if adapters:
        h = emb
        for hw, hb in hyper_stages:
            h = jax.nn.relu(h @ hw + hb)
        hyper = h.reshape(-1, k, k)

    x = emb
    t_pre = None
    dn_affine = None
    first = True
    for j, adapter in enumerate(adapters):
        # inter-segment activations are 2-D [B, D·w] (see _segment's layout
        # note — 3-D shapes OOM the compile via layout padding + scoped-VMEM
        # stack allocation)
        t_pre_new, h_res = _segment(
            x, segments[j], hyper, adapter, dn_affine, t_pre,
            final=None, domain_id=None,
            block_rows=block_rows, interpret=interpret, first=first)
        # batch stats of the pre-norm adapter output (unbiased var,
        # hamur.py:191-195; padded w=0 rows excluded — ops/nn.batch_stats),
        # folded to a per-domain affine
        from ..nn import batch_stats

        mean, var, n = batch_stats(t_pre_new, w)                # [D·w]
        var = var * (n / jnp.maximum(n - 1.0, 1.0))
        w_dim = adapter["gamma"].shape[0]       # gamma/beta are [w], shared
        d_num = t_pre_new.shape[1] // w_dim     # across domains (hamur.py:104)
        mean = mean.reshape(d_num, w_dim)
        var = var.reshape(d_num, w_dim)
        scale = adapter["gamma"] * jax.lax.rsqrt(var + eps)     # -> [D, w]
        shift = adapter["beta"] - mean * scale
        x, t_pre, dn_affine = h_res, t_pre_new, (scale, shift)
        first = False
    return _segment(x, segments[-1], None, None, dn_affine, t_pre,
                    final=final, domain_id=domain_id,
                    block_rows=block_rows, interpret=interpret, first=first)
