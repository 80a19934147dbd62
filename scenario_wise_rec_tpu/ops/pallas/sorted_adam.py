"""Chunk-vectorized sorted streaming dense-Adam on the packed table.

THE production-vocab embedding update (the "next 2x" design of PROFILE.md
SS3, built in round 4). Replaces every indexed HBM op in the step with
sorting + MXU matmuls + sequential streaming — the three primitives the
measured TPU cost model says are cheap:

- XLA scatters cost ~12 ms per 94k rows (per-row bound) — the ~330k ex/s
  ceiling every scatter-based update formulation hits at batch 4096.
- Sequential streaming of the whole [10.7M, 16] table + Adam moments is
  ~5 ms of pure HBM bandwidth.
- Batched per-owner bitonic sorts and MXU matmuls are 1-4 ms.

Mechanism (all static shapes, zero scatters, zero per-id scalar work):

1. **Per-owner sort** (XLA side): every feature's ids live in a disjoint,
   ascending span of the packed table (EmbeddingCollection.offsets), so
   sorting each owner's ids independently (a handful of batched
   ``lax.sort`` calls over ``[G, N]`` stacks) and concatenating the owners
   in offset order yields GLOBALLY sorted ids. Gradient rows follow either
   as sort payload or via one [K, D] gather (``reorder=`` — measured
   on-chip, see PROFILE.md).
2. **Lane-dispersed gradient matrix** ``G2 [K, 128]``: row k holds the
   D-wide gradient placed at lane group ``(id_k % r) * D`` where
   ``r = 128 // D`` — the lane position row ``id_k`` occupies in the
   packed ``[V/r, 128]`` tile layout (a [V, 16] f32 VMEM buffer would be
   lane-padded 8x; packed tiles also feed the MXU at full 128-lane width).
3. **Work-item grid** (the Pallas kernel): the table + mu + nu stream
   block-by-block (``block_rows`` vocab rows = ``block_rows/r`` packed
   sublanes) through VMEM. Each grid step is one (vocab block, id chunk)
   work item: a ``[Rb/r, 128] @ [128, 128]`` MXU matmul of the block-row
   one-hot (broadcast compare of the chunk's 128 packed row ids against
   the block's sublane iota) with the chunk's G2 rows, accumulated into
   the block's dense-gradient tile. Ids outside the block mask themselves
   (their packed row misses the sublane range). On each block's LAST work
   item the full torch-Adam update (weight decay folded into the
   gradient, every row's moments decay every step — EXACT dense-Adam
   semantics, reference ctr_trainer.py:50-52) applies to the whole block
   and the block writes back. The work list (block id, chunk id, first,
   emit flags) is precomputed in XLA at its static upper bound
   ``K/128 + nb`` and rides scalar prefetch, so every operand moves via
   auto-pipelined BlockSpecs — no manual DMA, no semaphores.

Empty vocab blocks get one masked work item (their one-hot matches
nothing) so dense decay still reaches every row; surplus work items target
a dedicated PAD block appended after the real vocab (real ids can never
match it). The authority arrays live PADDED to ``(nb + 1) * block_rows``
rows AND in the packed ``[V2/r, 128]`` tile layout for the whole training
run (train/optim.py:sorted_dense_adam_init): padding per step would cost
O(V) copies, and reshaping ``[V2/r, 128] <-> [V2, D]`` inside the jitted
step is fatal — XLA implements that reshape bitcast-free by giving the
``[V2, D]`` side a padded ``T(8,128)`` layout, an 8x-expanded 5.13 GB
allocation PER ARRAY at the 10.7M-row production scale (measured OOM:
17.4 G of 15.75 G HBM). The forward's row gather reads the packed tiles
directly (:func:`packed_row_gather`).

The reference framework has no counterpart (dense torch-Adam over
``nn.Embedding.weight``, basic/layers.py:51-62 + ctr_trainer.py:50-52);
this kernel reproduces those exact semantics at production vocabulary
scale without the scatter wall.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rbp: int, precision: str,
            hp_ref, wb_ref, wc_ref, first_ref, emit_ref,
            rv_ref, g2_ref, tbl_ref, mu_ref, nu_ref,
            tbl_out, mu_out, nu_out, acc):
    """One (vocab block, id chunk) work item; see module docstring.

    rv_ref ``[1, 1, 128]``: the chunk's packed row ids (``id // r``) —
    the leading unit dims satisfy Mosaic's block-shape divisibility rule
    (a ``(1, 128)`` block of a ``[kc, 128]`` array would not).
    g2_ref ``[128, 128]``: the chunk's lane-dispersed gradient rows.
    tbl/mu/nu ``[rbp, 128]``: the block's packed param/moment tiles
    (revisited across the block's consecutive work items — Mosaic only
    refetches when the block index changes).
    """
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        acc[...] = jnp.zeros_like(acc)

    base = wb_ref[i] * rbp
    iota = jax.lax.broadcasted_iota(jnp.int32, (rbp, 128), 0)
    # one-hot [rbp, 128]: sublane hit iff this id's packed row is in-block
    eq = (rv_ref[0] - base) == iota
    # The one-hot segment-sum's precision is a measured 3-way tradeoff on
    # chip at the 467k/b4096 shape (all vs the exact XLA scatter-add ref):
    #   "fast"    one default-precision pass — grads rounded to bf16,
    #             ~2e-3 drift, 501k ex/s
    #   "split"   gradient operand as a bf16 hi/lo pair (products are
    #             EXACT 1.0 x bf16, f32 accumulation; residual ~2^-18
    #             relative from the lo remainder's second rounding) —
    #             ~3e-6 drift, 430k ex/s. DEFAULT for f32 storage.
    #   "highest" 6-pass exact decomposition — exact to f32, 409k ex/s
    g2 = g2_ref[...]
    if precision == "fast":
        acc[...] += jnp.dot(eq.astype(g2.dtype), g2,
                            preferred_element_type=jnp.float32)
    elif precision == "highest":
        acc[...] += jnp.dot(eq.astype(jnp.float32), g2,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    else:
        hi = g2.astype(jnp.bfloat16)
        lo = (g2 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        eqb = eq.astype(jnp.bfloat16)
        acc[...] += (jnp.dot(eqb, hi, preferred_element_type=jnp.float32)
                     + jnp.dot(eqb, lo, preferred_element_type=jnp.float32))

    @pl.when(emit_ref[i] == 1)
    def _():
        lr = hp_ref[0]
        wd = hp_ref[1]
        b1 = hp_ref[2]
        b2 = hp_ref[3]
        bc1r = hp_ref[4]   # 1 / (1 - b1**t)
        bc2r = hp_ref[5]   # 1 / (1 - b2**t)
        eps = hp_ref[6]
        # Adam math always in f32; the tiles may be stored bf16
        # (sorted_dtype="bf16" — halves the streaming floor)
        out_dt = tbl_out.dtype
        p0 = tbl_ref[...].astype(jnp.float32)
        g = acc[...] + wd * p0      # torch Adam: decay folded into the grad
        mu = b1 * mu_ref[...].astype(jnp.float32) + (1.0 - b1) * g
        nu = (b2 * nu_ref[...].astype(jnp.float32)
              + (1.0 - b2) * (g * g))
        upd = lr * (mu * bc1r) / (jnp.sqrt(nu * bc2r) + eps)
        tbl_out[...] = (p0 - upd).astype(out_dt)
        mu_out[...] = mu.astype(out_dt)
        nu_out[...] = nu.astype(out_dt)


def pack_rows(a, block_rows: int):
    """``[V, D] -> ([V2/r, 128], v)`` packed-tile layout with the pad block
    appended (see module docstring). EAGER-use only (init/checkpoint
    adoption): inside a jitted step the reshape materializes the padded
    T(8,128) layout."""
    v, d = a.shape
    assert 128 % d == 0, f"packed tile layout requires d | 128, got {d}"
    r = 128 // d
    nb = -(-v // block_rows)
    pad = (nb + 1) * block_rows - v
    full = jnp.concatenate([a, jnp.zeros((pad, d), a.dtype)])
    return full.reshape(full.shape[0] // r, 128)


def unpack_rows(packed, v: int, d: int):
    """Inverse of :func:`pack_rows`: ``[V2/r, 128] -> [V, D]`` (EAGER-use
    only — eval/save materialization, never inside the jitted step)."""
    r = 128 // d
    return packed.reshape(packed.shape[0] * r, d)[:v]


def packed_row_gather(packed, ids, d: int):
    """``table[ids]`` read straight from the packed ``[V2/r, 128]`` tiles.

    One [K]-row gather of full 128-lane tile rows (``ids // r`` — a tile
    row is one HBM tile touch either way) followed by a static lane-group
    select (r two-dim slices + masked adds; no 3-D temps, no reshapes —
    both would materialize padded layouts on TPU). Returns ``[K, D]``.
    """
    r = 128 // d
    if r == 1:
        return packed[ids]
    rows128 = packed[ids // r]                       # [K, 128]
    j = (ids % r)[:, None]
    out = jnp.zeros((ids.shape[0], d), packed.dtype)
    for g in range(r):
        out = out + jnp.where(j == g, rows128[:, g * d:(g + 1) * d], 0.0)
    return out


def owner_sorted_grads(ids, g_rows, segments, offsets,
                       reorder: str = "gather"):
    """Globally sorted ``(ids, grads)`` via per-owner batched sorts.

    ``segments``: static ``(owner, start, size)`` per feature
    (EmbeddingCollection.touched_owner_segments); ``offsets``: owner ->
    packed-table row offset. Segments sharing an owner are merged first
    (``shared_with`` aliases draw from the same span); owners' spans are
    disjoint, so concatenating the per-owner sorted blocks in ascending
    offset order is globally sorted. Owners with equal merged length are
    stacked so each length group is ONE batched sort.

    ``reorder``:
      - ``"gather"``: sort ``(id, position)`` pairs, then one ``[K, D]``
        gather reorders the gradient rows.
      - ``"payload"``: carry the D gradient columns as sort payload
        operands (no indexed op at all; D+1-operand bitonic sort).
    Both are exact; the faster one is an on-chip measurement
    (PROFILE.md SS3).
    """
    d = g_rows.shape[-1]
    by_owner: dict = {}
    for owner, start, size in segments:
        by_owner.setdefault(owner, []).append((start, size))
    order = sorted(by_owner, key=lambda o: offsets[o])

    def _concat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    by_len: dict = {}
    for o in order:
        pieces = by_owner[o]
        n = sum(z for _, z in pieces)
        by_len.setdefault(n, []).append(o)

    sid_parts: dict = {}
    g_parts: dict = {}
    for n, owners in by_len.items():
        ids_mat = jnp.stack([
            _concat([ids[s:s + z] for s, z in by_owner[o]]) for o in owners])
        if reorder == "payload":
            g_cols = [
                jnp.stack([
                    _concat([g_rows[s:s + z, c] for s, z in by_owner[o]])
                    for o in owners])
                for c in range(d)
            ]
            out = jax.lax.sort((ids_mat, *g_cols), num_keys=1)
            for gi, o in enumerate(owners):
                sid_parts[o] = out[0][gi]
                g_parts[o] = jnp.stack([out[1 + c][gi] for c in range(d)],
                                       axis=-1)
        else:
            pos_mat = jnp.stack([
                _concat([jnp.arange(s, s + z, dtype=jnp.int32)
                         for s, z in by_owner[o]]) for o in owners])
            sid, spos = jax.lax.sort_key_val(ids_mat, pos_mat)
            for gi, o in enumerate(owners):
                sid_parts[o] = sid[gi]
                g_parts[o] = spos[gi]

    sorted_ids = _concat([sid_parts[o] for o in order])
    if reorder == "payload":
        g_sorted = jnp.concatenate([g_parts[o] for o in order]) \
            if len(order) > 1 else g_parts[order[0]]
    else:
        spos_all = _concat([g_parts[o] for o in order])
        g_sorted = g_rows[spos_all]
    return sorted_ids, g_sorted


def sorted_dense_adam_apply(table, mu, nu, sorted_ids, g_sorted, hp, d: int,
                            *, block_rows: int = 8192,
                            precision: str | None = None,
                            interpret: bool | None = None):
    """One fused dense-Adam pass (see module docstring).

    Args:
        table, mu, nu: ``[V2/r, 128]`` f32 PACKED tiles, pre-padded to
            ``V2 = (nb + 1) * block_rows`` logical rows (``pack_rows`` /
            ``sorted_dense_adam_init``) — the last block is the
            surplus-work-item dump; real ids must be
            ``< nb * block_rows``. Kept packed end-to-end: see the module
            docstring's layout-OOM note.
        sorted_ids: ``[K]`` int32, globally ascending (owner_sorted_grads).
        g_sorted: ``[K, D]`` gradient rows aligned with sorted_ids
            (duplicates allowed — they sum in the accumulator, exactly
            like autodiff's scatter-add).
        hp: ``[7]`` f32: lr, weight_decay, b1, b2, 1/(1-b1^t),
            1/(1-b2^t), eps.
        d: the logical row width D (not inferable from the packed shape).

    Returns ``(new_table, new_mu, new_nu)`` packed, same shapes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision is None:
        # bf16 storage already quantizes to 8-bit mantissa every step —
        # the fast path's operand rounding is immaterial there
        precision = "fast" if table.dtype == jnp.bfloat16 else "split"
    assert precision in ("fast", "split", "highest"), precision
    assert 128 % d == 0, f"sorted_dense_adam requires d | 128, got {d}"
    r = 128 // d
    v2 = table.shape[0] * r
    assert table.shape[1] == 128, table.shape
    assert block_rows % r == 0 and v2 % block_rows == 0, (block_rows, v2)
    nb = v2 // block_rows - 1          # real blocks; block nb is the dump
    assert nb >= 1, "need at least one real vocab block"
    rbp = block_rows // r

    k = sorted_ids.shape[0]
    kpad = (-k) % 128
    if kpad:
        # sentinel = first pad-block row: beyond every real block's range
        sorted_ids = jnp.pad(sorted_ids, (0, kpad),
                             constant_values=nb * block_rows)
        g_sorted = jnp.pad(g_sorted, ((0, kpad), (0, 0)))
    kc = (k + kpad) // 128

    # lane-dispersed grads: row k's D values at lane group (id % r) * D —
    # a one-hot einsum at HIGHEST precision (exact; its ~24 MFLOP are
    # trivial). A default-precision einsum rounds the f32 gradients to
    # bf16; the matmul-free masked-select/concat formulation is exact but
    # measured ~1.7 ms SLOWER at the production shape (501k -> 429k ex/s
    # — narrow-column concat relayouts beat the MXU pass it avoids).
    if r == 1:
        g2 = g_sorted
    else:
        oh = (sorted_ids[:, None] % r
              == jax.lax.broadcasted_iota(jnp.int32, (1, r), 1))
        g2 = jnp.einsum("kr,kd->krd", oh.astype(g_sorted.dtype),
                        g_sorted, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST
                        ).astype(g_sorted.dtype).reshape(kc * 128, 128)
    rv = (sorted_ids // r).astype(jnp.int32).reshape(kc, 1, 128)

    # work list: for each real block, the id chunks overlapping its span
    # (>= 1 even when empty, so dense decay reaches every block); surplus
    # items target the pad block. Static size W = kc + nb.
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * block_rows
    starts = jnp.searchsorted(sorted_ids, bounds).astype(jnp.int32)
    c_lo = starts[:-1] // 128
    c_hi = (starts[1:] + 127) // 128
    ln = jnp.maximum(c_hi - c_lo, 1)
    cum = jnp.cumsum(ln)
    w = kc + nb
    iw = jnp.arange(w, dtype=jnp.int32)
    wb = jnp.searchsorted(cum, iw, side="right").astype(jnp.int32)  # [0, nb]
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    safe_b = jnp.clip(wb, 0, nb - 1)
    wc = jnp.where(wb < nb, c_lo[safe_b] + iw - prev[safe_b], 0)
    wc = jnp.clip(wc, 0, kc - 1).astype(jnp.int32)
    change = wb[1:] != wb[:-1]
    one = jnp.ones((1,), jnp.int32)
    first = jnp.concatenate([one, change.astype(jnp.int32)])
    emit = jnp.concatenate([change.astype(jnp.int32), one])

    def blk_spec():
        return pl.BlockSpec((rbp, 128),
                            lambda i, hp, wb, wc, f, e: (wb[i], 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, rbp, precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(w,),
            in_specs=[
                pl.BlockSpec((1, 1, 128),
                             lambda i, hp, wb, wc, f, e: (wc[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128),
                             lambda i, hp, wb, wc, f, e: (wc[i], 0),
                             memory_space=pltpu.VMEM),
                blk_spec(), blk_spec(), blk_spec(),
            ],
            out_specs=[blk_spec(), blk_spec(), blk_spec()],
            scratch_shapes=[pltpu.VMEM((rbp, 128), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((v2 // r, 128), table.dtype)] * 3,
        # flattened inputs: (hp, wb, wc, first, emit, rv, g2, tbl, mu, nu)
        input_output_aliases={7: 0, 8: 1, 9: 2},
        interpret=interpret,
    )(hp, wb, wc, first, emit, rv, g2, table, mu, nu)
    return tuple(out)
