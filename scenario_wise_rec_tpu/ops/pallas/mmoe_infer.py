"""Pallas fused MMOE inference kernel.

The eval forward of MMOE after embedding is a stack of small dense ops —
E expert MLPs, D softmax gates, the gate-weighted mixture, D towers, sigmoid,
per-row domain select (reference mmoe.py:33-56). Run op-by-op, every stage
round-trips activations through HBM and pays a kernel launch; the whole
stack's weights are only ~2 MB.

This kernel runs the ENTIRE post-embedding stack for a batch tile out of
VMEM: one HBM read of the embedding tile, one HBM write of the probabilities.
Weights use constant index maps, so Mosaic keeps them resident in VMEM across
grid steps. Matmuls hit the MXU with f32 accumulation; E/D/layer loops are
Python-unrolled at trace time (shapes are static).

Preconditions: eval mode (BatchNorm folded to affine — see folding.py),
relu expert/tower activations, softmax gates (the reference's MMOE config).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import full_spec as _full_spec

Affine = Tuple[jnp.ndarray, jnp.ndarray]



def mmoe_fused_infer(
    emb: jnp.ndarray,
    domain_id: jnp.ndarray,
    expert_stages: Sequence[Affine],   # each (W[E,in,out], b[E,out])
    gate_stage: Affine,                # (W[D,in,E], b[D,E])
    tower_stages: Sequence[Affine],    # each (W[D,in,out], b[D,out])
    tower_out: Affine,                 # (W[D,h,1], b[D,1])
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs[B] = fused MMOE eval forward on the embedded batch ``emb``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, _ = emb.shape
    E = expert_stages[0][0].shape[0]
    D = gate_stage[0].shape[0]
    n_exp = len(expert_stages)
    n_tow = len(tower_stages)

    tb = min(block_rows, B)
    pad = (-B) % tb
    if pad:
        emb = jnp.pad(emb, ((0, pad), (0, 0)))
        domain_id = jnp.pad(domain_id, (0, pad))
    bp = emb.shape[0]
    did = jnp.clip(domain_id.astype(jnp.int32), 0, D - 1).reshape(-1, 1)

    flat: List[jnp.ndarray] = []
    for w, b in expert_stages:
        flat += [w, b]
    flat += [gate_stage[0], gate_stage[1]]
    for w, b in tower_stages:
        flat += [w, b]
    flat += [tower_out[0], tower_out[1]]

    def kernel(emb_ref, did_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        x = emb_ref[:]
        k = 0
        e_ws = []
        for _ in range(n_exp):
            e_ws.append((ws[k], ws[k + 1]))
            k += 2
        gw, gb = ws[k], ws[k + 1]
        k += 2
        t_ws = []
        for _ in range(n_tow):
            t_ws.append((ws[k], ws[k + 1]))
            k += 2
        ow, ob = ws[k], ws[k + 1]

        experts = []
        for e in range(E):
            h = x
            for w_ref, b_ref in e_ws:
                h = jax.nn.relu(
                    jnp.dot(h, w_ref[e], preferred_element_type=jnp.float32)
                    + b_ref[e]
                )
            experts.append(h)  # [tb, H]

        did_col = did_ref[:]
        out = jnp.zeros((x.shape[0], 1), jnp.float32)
        for d in range(D):
            logits = (
                jnp.dot(x, gw[d], preferred_element_type=jnp.float32) + gb[d]
            )
            gate = jax.nn.softmax(logits, axis=1)  # [tb, E]
            mixed = gate[:, 0:1] * experts[0]
            for e in range(1, E):
                mixed = mixed + gate[:, e:e + 1] * experts[e]
            h = mixed
            for w_ref, b_ref in t_ws:
                h = jax.nn.relu(
                    jnp.dot(h, w_ref[d], preferred_element_type=jnp.float32)
                    + b_ref[d]
                )
            logit = jnp.dot(h, ow[d], preferred_element_type=jnp.float32) + ob[d]
            out = jnp.where(did_col == d, jax.nn.sigmoid(logit), out)
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
