"""Pallas fused M2M inference kernel (post-transformer stack).

M2M's forward (reference m2m.py:44-69) has one genuinely batch-global stage:
the transformer applied to the flat embedding as an *unbatched length-B
sequence* — attention ACROSS examples (m2m.py:48, quirk preserved in
ops/transformer.py). That stage stays in XLA (it is one big MXU-friendly
attention). EVERYTHING after it is per-row and fuses into one kernel per
batch tile: the 4 expert MLPs, the scenario/task hyper-MLPs, the
meta-attention whose per-example weight matrix/bias are GENERATED from the
scenario embedding (m2m.py:55-62), the meta-tower with generated weight +
residual (m2m.py:65-67), and the output MLP + sigmoid.

Per-example generated matrices are never reshaped in-kernel: the
``[tb, 2E, 2E]`` meta weight lives as its flat ``[tb, 4E²]`` generator
output and the contraction ``meta_in · W_b`` is an unrolled
slice-multiply-accumulate over the 2E rows (row e of W_b is the slice
``vw[:, e·2E:(e+1)·2E]``) — VPU-friendly and layout-trivial.

Preconditions: eval mode (BN folded — the hyper/expert/output MLPs all carry
BatchNorm), leakyrelu(0.1) hyper/expert activations, relu output MLP.
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


def _lrelu(x):
    # torch LeakyReLU(0.1) — activation_layer("leakyrelu"), activation.py:49
    return jnp.where(x >= 0, x, 0.1 * x)


def m2m_fused_infer(
    t_out: jnp.ndarray,            # [B, in] transformer output (XLA stage)
    dom_emb: jnp.ndarray,          # [B, dd] scenario feature embedding
    expert_stages: Sequence[Affine],   # stacked (W[nE,in,out], b[nE,out])
    task_stages: Sequence[Affine],     # plain affines, leakyrelu
    scen_stages: Sequence[Affine],
    vw_stages: Sequence[Affine],       # -> [tb, 4E²]
    vb_stages: Sequence[Affine],       # -> [tb, 2E]
    tw_stages: Sequence[Affine],       # -> [tb, E²]
    tb_stages: Sequence[Affine],       # -> [tb, E]
    v: jnp.ndarray,                    # [2E, 1]
    out_stages: Sequence[Affine],      # relu MLP
    out_head: Affine,                  # (W[h,1], b[1])
    E: int,
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs[B] = fused post-transformer M2M eval forward."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = t_out.shape[0]
    nE = expert_stages[0][0].shape[0]

    tb = min(block_rows, B)
    pad = (-B) % tb
    t_out = _pad_rows(t_out, pad)
    dom_emb = _pad_rows(dom_emb, pad)
    bp = t_out.shape[0]

    groups = [expert_stages, task_stages, scen_stages, vw_stages, vb_stages,
              tw_stages, tb_stages, out_stages]
    n_per = [len(g) for g in groups]
    flat: List[jnp.ndarray] = []
    for g in groups:
        for w, b in g:
            flat += [w, b]
    flat += [v, out_head[0], out_head[1]]

    def kernel(t_ref, d_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        k = 0

        def take_group(n):
            nonlocal k
            got = [(ws[k + 2 * i], ws[k + 2 * i + 1]) for i in range(n)]
            k += 2 * n
            return got

        (exp_l, task_l, scen_l, vw_l, vb_l, tw_l, tb_l, outm_l) = (
            take_group(n) for n in n_per)
        v_ref, oh_w, oh_b = ws[k], ws[k + 1], ws[k + 2]

        t = t_ref[:]
        d = d_ref[:]

        def run(h, layers, act, member=None):
            for lw, lb in layers:
                w_op = lw[member] if member is not None else lw[:]
                b_op = lb[member] if member is not None else lb[:]
                h = act(_dot(h, w_op) + b_op)
            return h

        scen = run(d, scen_l, _lrelu)
        task = run(d, task_l, _lrelu)
        experts = [run(t, exp_l, _lrelu, member=n) for n in range(nE)]

        vw = run(scen, vw_l, _lrelu)      # [tb, 4E²] == flat [2E, 2E]
        vb = run(scen, vb_l, _lrelu)      # [tb, 2E]
        scores = []
        for n in range(nE):
            # meta_in_n = [expert_n ‖ task]; meta_in_n @ W_b as unrolled
            # slice-MAC over the 2E rows of the per-row matrix
            meta = vb
            for e in range(E):
                meta = meta + experts[n][:, e:e + 1] * vw[:, e * 2 * E:(e + 1) * 2 * E]
            for e in range(E):
                row = e + E
                meta = meta + task[:, e:e + 1] * vw[:, row * 2 * E:(row + 1) * 2 * E]
            meta = _lrelu(meta)
            scores.append(_dot(meta, v_ref[:]))   # [tb, 1]
        s = jnp.concatenate(scores, axis=1)       # [tb, nE]
        alpha = jax.nn.softmax(s, axis=1)
        rt = jnp.zeros_like(experts[0])
        for n in range(nE):
            rt = rt + alpha[:, n:n + 1] * experts[n]

        tw = run(scen, tw_l, _lrelu)               # [tb, E²]
        tbias = run(scen, tb_l, _lrelu)            # [tb, E]
        h = tbias + rt
        for e in range(E):
            h = h + rt[:, e:e + 1] * tw[:, e * E:(e + 1) * E]
        h = _lrelu(h)

        h = run(h, outm_l, jax.nn.relu)
        out_ref[:] = jax.nn.sigmoid(_dot(h, oh_w[:]) + oh_b[:])

    in_specs = [
        _row_spec(tb, t_out.shape[1]),
        _row_spec(tb, dom_emb.shape[1]),
    ] + [_full_spec(a) for a in flat]

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=_row_spec(tb, 1),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        # the axon XLA stack-allocates large operands of chained XLA->pallas
        # pipelines in scoped VMEM; an explicit budget keeps the compile
        # from OOMing at batch 4096 (see hamur_infer.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(t_out, dom_emb, *flat)
    return out[:B, 0]
