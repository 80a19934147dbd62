"""Pallas fused PLE (CGC) inference kernel.

The eval forward of PLE after embedding (reference ple.py:44-64,100-134) is a
stack of small dense ops per CGC level — D x n_spec domain-specific expert
MLPs, n_shared shared expert MLPs, D softmax gates over (own specifics +
shared), an extra shared gate for non-final levels — followed by D towers,
sigmoid, and per-row domain select. Op-by-op, every stage round-trips
activations through HBM; the whole stack's weights are a few MB.

Like mmoe_infer.py, this kernel runs the ENTIRE post-embedding stack for a
batch tile out of VMEM: one HBM read of the embedding tile, one HBM write of
the probabilities. All level/expert/domain loops are Python-unrolled at trace
time; weights use constant index maps so Mosaic keeps them VMEM-resident
across grid steps.

Preconditions: eval mode (BatchNorm folded to affines — folding.py), relu
expert/tower activations, softmax gates (the reference's PLE config,
ple.py:89-105).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import full_spec as _full_spec

Affine = Tuple[jnp.ndarray, jnp.ndarray]



class LevelSpec:
    """Folded affine stages for one CGC level.

    spec_stages:   each (W[D, S, in, out], b[D, S, out])
    shared_stages: each (W[n_sh, in, out], b[n_sh, out])
    gate_stages:   each (W[D, in, E], b[D, E]) — softmax after every stage
                   (matches ops.nn.MLP with activation='softmax')
    gate_shared_stages: each (W[in, n_all], b[n_all]) or None on final level
    """

    def __init__(self, spec_stages: Sequence[Affine],
                 shared_stages: Sequence[Affine],
                 gate_stages: Sequence[Affine],
                 gate_shared_stages: Optional[Sequence[Affine]]):
        self.spec_stages = list(spec_stages)
        self.shared_stages = list(shared_stages)
        self.gate_stages = list(gate_stages)
        self.gate_shared_stages = (
            None if gate_shared_stages is None else list(gate_shared_stages)
        )


def ple_fused_infer(
    emb: jnp.ndarray,
    domain_id: jnp.ndarray,
    levels: Sequence[LevelSpec],
    tower_stages: Sequence[Affine],    # each (W[D, in, out], b[D, out])
    tower_out: Affine,                 # (W[D, h, 1], b[D, 1])
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs[B] = fused PLE eval forward on the embedded batch ``emb``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, _ = emb.shape
    D = tower_out[0].shape[0]
    S = levels[0].spec_stages[0][0].shape[1]
    n_sh = levels[0].shared_stages[0][0].shape[0]

    tb = min(block_rows, B)
    pad = (-B) % tb
    if pad:
        emb = jnp.pad(emb, ((0, pad), (0, 0)))
        domain_id = jnp.pad(domain_id, (0, pad))
    bp = emb.shape[0]
    did = jnp.clip(domain_id.astype(jnp.int32), 0, D - 1).reshape(-1, 1)

    # Flatten every weight in a fixed traversal order; the kernel re-consumes
    # refs in the same order through a cursor.
    flat: List[jnp.ndarray] = []
    for lv in levels:
        for w, b in lv.spec_stages:
            flat += [w, b]
        for w, b in lv.shared_stages:
            flat += [w, b]
        for w, b in lv.gate_stages:
            flat += [w, b]
        if lv.gate_shared_stages is not None:
            for w, b in lv.gate_shared_stages:
                flat += [w, b]
    for w, b in tower_stages:
        flat += [w, b]
    flat += [tower_out[0], tower_out[1]]

    n_spec_stages = [len(lv.spec_stages) for lv in levels]
    n_shared_stages = [len(lv.shared_stages) for lv in levels]
    n_gate_stages = [len(lv.gate_stages) for lv in levels]
    has_gs = [lv.gate_shared_stages is not None for lv in levels]
    n_gs_stages = [0 if lv.gate_shared_stages is None
                   else len(lv.gate_shared_stages) for lv in levels]
    n_tow = len(tower_stages)

    def kernel(emb_ref, did_ref, *refs):
        out_ref = refs[-1]
        ws = list(refs[:-1])
        cur = [0]

        def take():
            w = ws[cur[0]]
            b = ws[cur[0] + 1]
            cur[0] += 2
            return w, b

        x = emb_ref[:]
        streams_d = [x] * D   # per-domain input streams (ple.py:46)
        stream_sh = x         # shared input stream

        for li in range(len(levels)):
            spec_st = [take() for _ in range(n_spec_stages[li])]
            shared_st = [take() for _ in range(n_shared_stages[li])]
            gate_st = [take() for _ in range(n_gate_stages[li])]
            gs_st = [take() for _ in range(n_gs_stages[li])]

            # specific experts: relu chains per (domain, expert)
            spec_out = []
            for d in range(D):
                per_d = []
                for s in range(S):
                    h = streams_d[d]
                    for w, b in spec_st:
                        h = jax.nn.relu(
                            jnp.dot(h, w[d, s],
                                    preferred_element_type=jnp.float32)
                            + b[d, s])
                    per_d.append(h)
                spec_out.append(per_d)
            # shared experts
            shared_out = []
            for j in range(n_sh):
                h = stream_sh
                for w, b in shared_st:
                    h = jax.nn.relu(
                        jnp.dot(h, w[j], preferred_element_type=jnp.float32)
                        + b[j])
                shared_out.append(h)

            # per-domain gate over (own specifics + shared), softmax each stage
            new_d = []
            for d in range(D):
                g = streams_d[d]
                for w, b in gate_st:
                    g = jax.nn.softmax(
                        jnp.dot(g, w[d], preferred_element_type=jnp.float32)
                        + b[d], axis=1)
                experts = spec_out[d] + shared_out  # E = S + n_sh
                mixed = g[:, 0:1] * experts[0]
                for e in range(1, len(experts)):
                    mixed = mixed + g[:, e:e + 1] * experts[e]
                new_d.append(mixed)

            # shared gate over ALL experts feeds the next shared stream
            # (ple.py:128-134; absent on the final level)
            if has_gs[li]:
                gs = stream_sh
                for w, b in gs_st:  # unstacked refs: read in full
                    gs = jax.nn.softmax(
                        jnp.dot(gs, w[:], preferred_element_type=jnp.float32)
                        + b[:], axis=1)
                all_experts = [spec_out[d][s] for d in range(D)
                               for s in range(S)] + shared_out
                mixed_sh = gs[:, 0:1] * all_experts[0]
                for e in range(1, len(all_experts)):
                    mixed_sh = mixed_sh + gs[:, e:e + 1] * all_experts[e]
                stream_sh = mixed_sh
            streams_d = new_d

        tow_st = [take() for _ in range(n_tow)]
        ow, ob = take()
        did_col = did_ref[:]
        out = jnp.zeros((x.shape[0], 1), jnp.float32)
        for d in range(D):
            t = streams_d[d]
            for w, b in tow_st:
                t = jax.nn.relu(
                    jnp.dot(t, w[d], preferred_element_type=jnp.float32)
                    + b[d])
            logit = jnp.dot(t, ow[d], preferred_element_type=jnp.float32) + ob[d]
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
