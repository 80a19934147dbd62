"""Pallas fused M3oE inference kernel.

M3oE's eval forward after embedding is entirely per-row (LayerNorm, not
BatchNorm — reference m3oe.py:45-68 ``Mlp_N``), so the WHOLE post-embedding
stack fuses into one kernel per batch tile: STAR-style slot fusion + skip,
per-domain softmax gates, shared + per-domain LayerNorm-MLP experts,
cross-domain balance mixing, expert fusion, per-domain towers, sigmoid and
domain select (reference m3oe.py:111-198). One HBM read of the embedding
tile, one HBM write of the probabilities; weights stay resident in VMEM.

Weight layout (all stacked on a leading member axis, prepared by
models/m3oe.py:apply_fused_eval):
- star:   W[D, s0, s1] = slot_w ⊙ shared_w, b[D, s1] = slot_b + shared_b
- skip / star_mlp: single Mlp_N layers (lin W/b + LN gamma/beta)
- experts: per layer (W[E, in, out], b[E, out], g[E, out], be[E, out])
- domain experts: same with leading D
- gates: (W[D, s2, E], b[D, E]); towers: l1/ln/l2 stacked on D
- scalars sigmoid(w_exp_d), sigmoid(w_bal_d) are folded host-side into the
  balance-mix coefficients.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._common import (dot as _dot, full_spec as _full_spec,
                      pad_rows as _pad_rows, row_spec as _row_spec)

MlpNLayer = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]
# (lin_w, lin_b, ln_gamma, ln_beta) — possibly stacked on a member axis


def _ln(x, gamma, beta, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def m3oe_fused_infer(
    emb: jnp.ndarray,           # [B, s0]
    domain_id: jnp.ndarray,     # [B]
    star: Tuple[jnp.ndarray, jnp.ndarray],   # (W[D,s0,s1], b[D,s1])
    skip: Sequence[MlpNLayer],               # unstacked Mlp_N layers
    star_mlp: Sequence[MlpNLayer],
    gates: Tuple[jnp.ndarray, jnp.ndarray],  # (W[D,s2,E], b[D,E])
    experts: Sequence[MlpNLayer],            # stacked on E
    domain_experts: Sequence[MlpNLayer],     # stacked on D
    towers: Tuple[jnp.ndarray, ...],  # (l1w[D,h,h], l1b[D,h], g[D,h],
                                      #  be[D,h], l2w[D,h,1], l2b[D,1])
    w_exp: jnp.ndarray,         # sigmoid(w_exp_d), shape [1] (traced — the
                                # mixing scalars are learnable params)
    w_bal: jnp.ndarray,         # sigmoid(w_bal_d), shape [1]
    block_rows: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs[B] = fused M3oE eval forward on the embedded batch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = emb.shape[0]
    D = star[0].shape[0]
    E = experts[0][0].shape[0]
    n_skip, n_sm = len(skip), len(star_mlp)
    n_exp_l, n_dom_l = len(experts), len(domain_experts)

    tb = min(block_rows, B)
    pad = (-B) % tb
    emb = _pad_rows(emb, pad)
    domain_id = _pad_rows(domain_id, pad)
    bp = emb.shape[0]
    did = jnp.clip(domain_id.astype(jnp.int32), 0, D - 1).reshape(-1, 1)

    flat: List[jnp.ndarray] = [star[0], star[1]]
    for group in (skip, star_mlp, experts, domain_experts):
        for layer in group:
            flat += list(layer)
    flat += [gates[0], gates[1]]
    flat += list(towers)
    flat += [jnp.reshape(w_exp, (1, 1)).astype(jnp.float32),
             jnp.reshape(w_bal, (1, 1)).astype(jnp.float32)]

    def kernel(emb_ref, did_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        k = 0

        def take(n):
            nonlocal k
            got = ws[k:k + n]
            k += n
            return got

        star_w, star_b = take(2)
        skip_l = [take(4) for _ in range(n_skip)]
        sm_l = [take(4) for _ in range(n_sm)]
        exp_l = [take(4) for _ in range(n_exp_l)]
        dom_l = [take(4) for _ in range(n_dom_l)]
        gate_w, gate_b = take(2)
        t_l1w, t_l1b, t_g, t_be, t_l2w, t_l2b = take(6)
        w_exp_ref, w_bal_ref = take(2)
        w_exp = w_exp_ref[0, 0]
        w_bal = w_bal_ref[0, 0]

        x = emb_ref[:]
        did_col = did_ref[:]

        def mlp_n(h, layers, member):
            for lw, lb, lg, lbe in layers:
                h = jax.nn.relu(_ln(_dot(h, lw[member]) + lb[member],
                                    lg[member], lbe[member]))
            return h

        # skip branch (plain, unstacked layers: member slice = full ref)
        s = x
        for lw, lb, lg, lbe in skip_l:
            s = jax.nn.relu(_ln(_dot(s, lw[:]) + lb[:], lg[:], lbe[:]))

        # STAR slot fusion, selected per row (m3oe.py:145-149)
        star_sel = jnp.zeros((x.shape[0], star_w.shape[-1]), jnp.float32)
        for d in range(D):
            hd = _dot(x, star_w[d]) + star_b[d]
            star_sel = jnp.where(did_col == d, hd, star_sel)
        e = star_sel
        for lw, lb, lg, lbe in sm_l:
            e = jax.nn.relu(_ln(_dot(e, lw[:]) + lb[:], lg[:], lbe[:]))
        e = e + s  # fused embedding [tb, s2]

        # experts
        fea = [mlp_n(e, exp_l, i) for i in range(E)]          # E x [tb, h]
        dom = [mlp_n(e, dom_l, d) for d in range(D)]          # D x [tb, h]

        # balance mixing (m3oe.py:173-179)
        total = dom[0]
        for d in range(1, D):
            total = total + dom[d]
        off = (1.0 - w_bal) / (D - 1) if D > 1 else jnp.float32(0.0)
        out = jnp.zeros((x.shape[0], 1), jnp.float32)
        for d in range(D):
            g = jax.nn.softmax(_dot(e, gate_w[d]) + gate_b[d], axis=1)  # [tb,E]
            mixed = jnp.zeros_like(fea[0])
            for i in range(E):
                mixed = mixed + g[:, i:i + 1] * fea[i]
            if D > 1:
                weighted = (w_bal - off) * dom[d] + off * total
            else:
                weighted = w_bal * dom[d]
            fused = mixed + w_exp * weighted
            t = jax.nn.relu(_ln(_dot(fused, t_l1w[d]) + t_l1b[d],
                                t_g[d], t_be[d]))
            y = jax.nn.sigmoid(_dot(t, t_l2w[d]) + t_l2b[d])  # [tb, 1]
            out = jnp.where(did_col == d, y, out)
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
    )(emb, did, *flat)
    return out[:B, 0]
