"""Pallas fused inference kernels for the gated-personalization family.

EPNet / PPNet (PEPNet, reference epnet.py:6-33, ppnet.py:9-67) and AdaSparse
(reference adasparse.py:14-71) share a shape: small dense stacks whose hidden
activations are element-wise modulated by a gate computed from a scenario /
gate-input embedding. Run op-by-op, every gate and every modulated layer
round-trips a ``[B, H]`` activation through HBM; the weights are tiny (KBs).
Each kernel here runs the ENTIRE post-embedding stack for a batch tile out of
VMEM: one HBM read of the embedding tile(s), one HBM write of the
probabilities. Weights use constant index maps so Mosaic keeps them resident
across grid steps.

Preconditions: eval mode (BatchNorm folded to affines — folding.py), relu
hidden activations (the reference default). Numerical equality with
``model.apply(train=False)`` is pinned by tests/test_pallas_kernels.py.

Concatenations like ``[sce ‖ agn] @ W`` are expressed as split matmuls
(``sce @ W[:S] + agn @ W[S:]``) so no concatenated activation is ever
materialized.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import dot as _dot, full_spec as _full_spec, pad_rows as _pad_rows, row_spec as _row_spec

Affine = Tuple[jnp.ndarray, jnp.ndarray]






# ---------------------------------------------------------------------------
# EPNet: gate = 2·sigmoid(GateNU([sce ‖ agn])); y = sigmoid((agn·gate) @ Wo)
# (reference epnet.py:25-33; the head is a single Linear — see models/epnet.py
# docstring for the preserved fcn_dims quirk.)
# ---------------------------------------------------------------------------


def epnet_fused_infer(
    sce: jnp.ndarray,                  # [B, S]
    agn: jnp.ndarray,                  # [B, A]
    gate_l1: Affine,                   # (W[S+A, H], b[H])
    gate_l2: Affine,                   # (W[H, A], b[A])
    head: Affine,                      # (W[A, 1], b[1])
    gemma: float = 2.0,
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, S = sce.shape
    tb = min(block_rows, B)
    pad = (-B) % tb
    sce, agn = _pad_rows(sce, pad), _pad_rows(agn, pad)
    bp = sce.shape[0]
    flat = [gate_l1[0], gate_l1[1], gate_l2[0], gate_l2[1], head[0], head[1]]

    def kernel(sce_ref, agn_ref, w1, b1, w2, b2, wo, bo, out_ref):
        s, a = sce_ref[:], agn_ref[:]
        h = jax.nn.relu(_dot(s, w1[:S]) + _dot(a, w1[S:]) + b1[:])
        gate = gemma * jax.nn.sigmoid(_dot(h, w2[:]) + b2[:])
        out_ref[:] = jax.nn.sigmoid(_dot(a * gate, wo[:]) + bo[:])

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[_row_spec(tb, S), _row_spec(tb, agn.shape[1])]
        + [_full_spec(a) for a in flat],
        out_specs=_row_spec(tb, 1),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(sce, agn, *flat)
    return out[:B, 0]


# ---------------------------------------------------------------------------
# PPNet: per-domain tower where each hidden layer is
# ``relu(BN(Linear(h))) * GateNU_i(gate_input)`` (reference ppnet.py:21-29),
# final Linear + sigmoid, per-row domain select (ppnet.py:58-67).
# ---------------------------------------------------------------------------


def ppnet_fused_infer(
    gate_in: jnp.ndarray,              # [B, G] = id_emb ‖ agn_emb
    domain_id: jnp.ndarray,            # [B]
    layer_stages: Sequence[Affine],    # each (W[D, in, out], b[D, out]) folded
    gate_l1s: Sequence[Affine],        # each (W[D, G, H_i], b[D, H_i])
    gate_l2s: Sequence[Affine],        # each (W[D, H_i, out_i], b[D, out_i])
    final: Affine,                     # (W[D, h, 1], b[D, 1])
    gemma: float = 2.0,
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, G = gate_in.shape
    D = final[0].shape[0]
    n_lay = len(layer_stages)

    tb = min(block_rows, B)
    pad = (-B) % tb
    gate_in = _pad_rows(gate_in, pad)
    did = jnp.clip(_pad_rows(domain_id.reshape(-1, 1), pad).astype(jnp.int32),
                   0, D - 1)
    bp = gate_in.shape[0]

    flat: List[jnp.ndarray] = []
    for stage in layer_stages:
        flat += [stage[0], stage[1]]
    for g1 in gate_l1s:
        flat += [g1[0], g1[1]]
    for g2 in gate_l2s:
        flat += [g2[0], g2[1]]
    flat += [final[0], final[1]]

    def kernel(g_ref, did_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        lay = [(ws[2 * i], ws[2 * i + 1]) for i in range(n_lay)]
        k = 2 * n_lay
        g1s = [(ws[k + 2 * i], ws[k + 2 * i + 1]) for i in range(n_lay)]
        k += 2 * n_lay
        g2s = [(ws[k + 2 * i], ws[k + 2 * i + 1]) for i in range(n_lay)]
        k += 2 * n_lay
        fw, fb = ws[k], ws[k + 1]

        g = g_ref[:]
        did_col = did_ref[:]
        out = jnp.zeros((g.shape[0], 1), jnp.float32)
        for d in range(D):
            hidden = g
            for i in range(n_lay):
                m = jax.nn.relu(_dot(hidden, lay[i][0][d]) + lay[i][1][d])
                gh = jax.nn.relu(_dot(g, g1s[i][0][d]) + g1s[i][1][d])
                gate = gemma * jax.nn.sigmoid(_dot(gh, g2s[i][0][d])
                                              + g2s[i][1][d])
                hidden = m * gate
            y = jax.nn.sigmoid(_dot(hidden, fw[d]) + fb[d])
            out = jnp.where(did_col == d, y, out)
        out_ref[:] = out

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[_row_spec(tb, G), _row_spec(tb, 1)]
        + [_full_spec(a) for a in flat],
        out_specs=_row_spec(tb, 1),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(gate_in, did, *flat)
    return out[:B, 0]


# ---------------------------------------------------------------------------
# AdaSparse: pruner weights multiply the agnostic embedding and every hidden
# activation (reference adasparse.py:63-70). Pruner forms (layers.py:291-305):
#   Binarization:  sign(sigmoid(v·alpha) - eps)
#   Scaling:       beta·sigmoid(v) · sign(beta·sigmoid(v) - eps)
#   Fusion:        beta·sigmoid(v·alpha) · sign(beta·sigmoid(v·alpha) - eps)
# ``alpha`` (a traced scalar carried in model state) is folded into the pruner
# weight matrices by the caller, so the kernel only sees the Scaling form's
# math with per-form flags.
# ---------------------------------------------------------------------------


def adasparse_fused_infer(
    sce: jnp.ndarray,                  # [B, S]
    agn: jnp.ndarray,                  # [B, A]
    pruner_ws: Sequence[jnp.ndarray],  # [S+A, A], then [S+h_i, h_i] (alpha-folded)
    layer_stages: Sequence[Affine],    # each (W[in, out], b[out]) folded
    final: Affine,                     # (W[h, 1], b[1])
    form: str = "Fusion",
    epsilon: float = 1e-2,
    beta: float = 2.0,
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, S = sce.shape
    A = agn.shape[1]
    n_lay = len(layer_stages)

    tb = min(block_rows, B)
    pad = (-B) % tb
    sce, agn = _pad_rows(sce, pad), _pad_rows(agn, pad)
    bp = sce.shape[0]

    flat: List[jnp.ndarray] = list(pruner_ws)
    for w, b in layer_stages:
        flat += [w, b]
    flat += [final[0], final[1]]

    def prune(vin):
        if form == "Binarization":
            return jnp.sign(jax.nn.sigmoid(vin) - epsilon)
        vout = beta * jax.nn.sigmoid(vin)
        return vout * jnp.sign(vout - epsilon)

    def kernel(sce_ref, agn_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        p_ws = ws[:n_lay + 1]
        lay = [(ws[n_lay + 1 + 2 * i], ws[n_lay + 2 + 2 * i])
               for i in range(n_lay)]
        fw, fb = ws[-2], ws[-1]

        s, a = sce_ref[:], agn_ref[:]
        v0 = _dot(s, p_ws[0][:S]) + _dot(a, p_ws[0][S:])
        a = prune(v0) * a
        # layer 0 consumes [sce ‖ pruned agn] (adasparse.py:63-64)
        h = None
        for i in range(n_lay):
            w, b = lay[i]
            if i == 0:
                h = jax.nn.relu(_dot(s, w[:S]) + _dot(a, w[S:]) + b[:])
            else:
                h = jax.nn.relu(_dot(h, w[:]) + b[:])
            v = _dot(s, p_ws[i + 1][:S]) + _dot(h, p_ws[i + 1][S:])
            h = prune(v) * h
        if h is None:  # no hidden layers: head acts on [sce ‖ pruned agn]
            out_ref[:] = jax.nn.sigmoid(_dot(s, fw[:S]) + _dot(a, fw[S:])
                                        + fb[:])
        else:
            out_ref[:] = jax.nn.sigmoid(_dot(h, fw[:]) + fb[:])

    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[_row_spec(tb, S), _row_spec(tb, A)]
        + [_full_spec(arr) for arr in flat],
        out_specs=_row_spec(tb, 1),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(sce, agn, *flat)
    return out[:B, 0]
