"""Streaming fused dense-Adam update for the packed embedding table.

THE production-vocab training kernel (SURVEY §2.4; reference scale
``run_ali_ccp...py:26`` — ~467k rows/feature -> packed [10.7M, 16]). The
measured TPU cost structure (scripts/bench_row_scatter.py) that shapes it:

- XLA scatters cost ~11-13 ms per 94k scattered rows REGARDLESS of row
  width or table size — per-row overhead, not bytes. Every scatter-based
  formulation of the embedding update (autodiff's scatter-add backward,
  winner-scatter dedup, row-sparse write-backs) pays this several times.
- Sequential streaming of the WHOLE table + Adam moments is comparatively
  cheap: 6 x [V, D] passes ~ 4 GB at the 467k scale ~ 5 ms of pure
  bandwidth.
- In-VMEM dynamic row access is fast and Mosaic-supported (unlike per-row
  HBM DMA, which requires 128-lane-aligned slices).

So: ZERO scatters. Sort the per-occurrence row gradients by row id (cheap
vectorized per-feature bitonic sort), then ONE Pallas kernel streams the
table + mu + nu block-by-block through VMEM (pipelined by BlockSpecs),
scatter-adds each block's gradient rows into a VMEM accumulator (dynamic
sublane RMW), and applies the full torch-Adam update to EVERY row of the
block in the same pass.

Semantics: EXACT dense torch-Adam (weight decay folded into the gradient,
every row's moments decay every step) — bit-compatible with the reference's
``torch.optim.Adam`` on ``nn.Embedding.weight`` (ctr_trainer.py:50-52)
modulo f32 summation order. No lazy/SparseAdam deviation: this replaces the
embedding backward AND the optimizer in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nseg: int, nb: int, block_rows: int, d: int,
            hp_ref, ids_ref, pos_ref, starts_ref,
            g_ref, tbl_ref, mu_ref, nu_ref,
            tbl_out, mu_out, nu_out, acc):
    # All tensor operands arrive PACKED [n/R, 128] with R = 128//d rows per
    # VMEM row: a [*, 16]-shaped f32 VMEM buffer would be lane-padded to
    # 128 and cost 8x its bytes (g alone would be 48 MB). Row j of the
    # logical [*, d] array lives at packed row j//R, lanes [d*(j%R), +d).
    r = 128 // d
    b = pl.program_id(0)
    lo = b * block_rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # dense gradient of this vocab block: segment-scatter the sorted
    # occurrence grads (duplicates land adjacently -> exact segment sum).
    # Lane placement: mask the source d-lane slot, rotate to the target
    # slot (dynamic lane roll), accumulate the full 128-lane row (the
    # other lanes add zeros).
    acc[...] = jnp.zeros_like(acc)
    for s in range(nseg):
        base = s * (nb + 1)

        def body(i, carry):
            j = ids_ref[i] - lo
            p = pos_ref[i]
            row = g_ref[pl.ds(jax.lax.div(p, r), 1), :]
            src = jax.lax.rem(p, r) * d
            dst = jax.lax.rem(j, r) * d
            masked = jnp.where((lane >= src) & (lane < src + d), row, 0.0)
            shift = jax.lax.rem(dst - src + 128, 128)
            acc[pl.ds(jax.lax.div(j, r), 1), :] += pltpu.roll(
                masked, shift, 1)
            return carry

        jax.lax.fori_loop(starts_ref[base + b], starts_ref[base + b + 1],
                          body, 0)

    lr = hp_ref[0]
    wd = hp_ref[1]
    b1 = hp_ref[2]
    b2 = hp_ref[3]
    bc1r = hp_ref[4]   # 1 / (1 - b1**t)
    bc2r = hp_ref[5]   # 1 / (1 - b2**t)
    eps = hp_ref[6]

    p0 = tbl_ref[...]
    g = acc[...] + wd * p0          # torch Adam: decay folded into the grad
    mu = b1 * mu_ref[...] + (1.0 - b1) * g
    nu = b2 * nu_ref[...] + (1.0 - b2) * (g * g)
    upd = lr * (mu * bc1r) / (jnp.sqrt(nu * bc2r) + eps)
    tbl_out[...] = p0 - upd
    mu_out[...] = mu
    nu_out[...] = nu


def fused_dense_adam_apply(table, mu, nu, g_rows, sorted_ids, sorted_pos,
                           starts, hp, *, block_rows: int = 8192,
                           interpret: bool | None = None):
    """One fused dense-Adam pass over the packed table (see module doc).

    Args:
        table, mu, nu: ``[V, D]`` f32 (aliased in-place at the XLA level).
        g_rows: ``[K, D]`` per-occurrence row grads in ORIGINAL order (the
            cotangent of ``table[touched_ids]``); kept whole in VMEM, so
            K·D·4 bytes must fit (~6 MB at the flagship 94208x16 — larger
            batches need the XLA fallback or feature chunking).
        sorted_ids: ``[K]`` row ids sorted WITHIN each segment.
        sorted_pos: ``[K]`` original positions aligned with sorted_ids.
        starts: ``[S * (NB+1)]`` int32 — for segment s and vocab block b,
            ``starts[s*(NB+1)+b] .. starts[s*(NB+1)+b+1]`` is the index
            range (into the sorted arrays) of that segment's ids in block b.
        hp: ``[7]`` f32: lr, weight_decay, b1, b2, 1/(1-b1^t), 1/(1-b2^t),
            eps.

    Returns ``(new_table, new_mu, new_nu)``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    v, d = table.shape
    assert 128 % d == 0, (
        f"fused_dense_adam_apply requires d | 128 (packed-lane layout), "
        f"got d={d}; use fused_dense_adam_ref")
    r = 128 // d
    assert block_rows % r == 0
    k = g_rows.shape[0]
    pad = (-v) % block_rows
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
        mu = jnp.pad(mu, ((0, pad), (0, 0)))
        nu = jnp.pad(nu, ((0, pad), (0, 0)))
    vpad = v + pad
    nb = vpad // block_rows
    nseg = starts.shape[0] // (nb + 1)
    kpad = (-k) % r
    if kpad:
        g_rows = jnp.pad(g_rows, ((0, kpad), (0, 0)))

    # pack every [n, d] operand as [n//R, 128] (free reshape: same linear
    # order) so VMEM isn't lane-padded 128/d-fold
    def packed(a):
        return a.reshape(a.shape[0] // r, 128)

    brp = block_rows // r

    def row_spec():
        return pl.BlockSpec((brp, 128), lambda b, *s: (b, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, nseg, nb, block_rows, d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(((k + kpad) // r, 128), lambda b, *s: (0, 0),
                             memory_space=pltpu.VMEM),
                row_spec(), row_spec(), row_spec(),
            ],
            out_specs=[row_spec(), row_spec(), row_spec()],
            scratch_shapes=[pltpu.VMEM((brp, 128), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((vpad // r, 128), jnp.float32)] * 3,
        # inputs flatten as (hp, ids, pos, starts, g, table, mu, nu)
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )(hp, sorted_ids, sorted_pos, starts, packed(g_rows),
      packed(table), packed(mu), packed(nu))
    new_table, new_mu, new_nu = (o.reshape(vpad, d)[:v] for o in out)
    return new_table, new_mu, new_nu


def fused_dense_adam_ref(table, mu, nu, g_rows, ids, hp):
    """XLA reference (CPU / mesh fallback): dense scatter-add gradient +
    vectorized dense Adam — identical math, used to pin the kernel in tests
    and to run this update mode where a pallas_call cannot (CPU tests,
    SPMD-partitioned tables)."""
    lr, wd, b1, b2, bc1r, bc2r, eps = (hp[i] for i in range(7))
    g = jnp.zeros_like(table).at[ids].add(g_rows)
    g = g + wd * table
    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * (g * g)
    upd = lr * (mu * bc1r) / (jnp.sqrt(nu * bc2r) + eps)
    return table - upd, mu, nu
