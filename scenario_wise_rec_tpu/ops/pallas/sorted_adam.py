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
nothing) so dense decay still reaches every row; surplus work items point
at a SENTINEL id chunk appended after the real chunks (all ids = ``v2``,
out of range for every block, gradients zero) and are clipped onto the
last real block, whose single emit simply moves to the final surplus item
with an unchanged accumulator. The authority arrays live PADDED to
``nb * block_rows`` rows AND in the packed ``[V2/r, 128]`` tile layout
for the whole training run (train/optim.py:sorted_dense_adam_init):
padding per step would cost O(V) copies, and reshaping ``[V2/r, 128] <->
[V2, D]`` inside the jitted step is fatal — XLA implements that reshape
bitcast-free by giving the ``[V2, D]`` side a padded ``T(8,128)`` layout,
an 8x-expanded 5.13 GB allocation PER ARRAY at the 10.7M-row production
scale (measured OOM: 17.4 G of 15.75 G HBM). The forward's row gather
reads the packed tiles directly (:func:`packed_row_gather`).

**Row-sharded meshes** (:func:`sorted_dense_adam_apply_sharded`): the
per-owner sort structure maps directly onto shard ownership — globally
sorted ids fall into each shard's contiguous row range as a contiguous
span, so every device runs this same kernel on its own
``[V2/(r·n_embed), 128]`` authority shard with the ids re-based to its
local frame; out-of-shard ids mask themselves exactly like out-of-block
ids (their packed row misses every block's sublane range). The
sentinel-chunk scheme (not a trailing pad block) is what makes each
contiguous shard self-contained. ``sorted_dense_adam_init(n_shards=...)``
rounds the block count up to the shard count so shards split evenly.

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

    rv_ref ``[1, 1, C]``: the chunk's packed row ids (``id // r``) —
    the leading unit dims satisfy Mosaic's block-shape divisibility rule
    (a ``(1, C)`` block of a ``[kc, C]`` array would not). ``C`` is the
    chunk width (chunk_ids, default 128).
    g2_ref ``[C, 128]``: the chunk's lane-dispersed gradient rows.
    tbl/mu/nu ``[rbp, 128]``: the block's packed param/moment tiles
    (revisited across the block's consecutive work items — Mosaic only
    refetches when the block index changes).
    """
    i = pl.program_id(0)
    c = rv_ref.shape[-1]

    @pl.when(first_ref[i] == 1)
    def _():
        acc[...] = jnp.zeros_like(acc)

    base = wb_ref[i] * rbp
    iota = jax.lax.broadcasted_iota(jnp.int32, (rbp, c), 0)
    # one-hot [rbp, C]: sublane hit iff this id's packed row is in-block
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


def pack_rows(a, block_rows: int, n_shards: int = 1):
    """``[V, D] -> [V2/r, 128]`` packed-tile layout, padded to whole vocab
    blocks (``V2 = nb * block_rows`` with ``nb`` rounded up to a multiple
    of ``n_shards`` so a row-sharded mesh splits into whole blocks).
    EAGER-use only (init/checkpoint adoption): inside a jitted step the
    reshape materializes the padded T(8,128) layout."""
    v, d = a.shape
    assert 128 % d == 0, f"packed tile layout requires d | 128, got {d}"
    r = 128 // d
    nb = -(-v // block_rows)
    nb = -(-nb // n_shards) * n_shards
    pad = nb * block_rows - v
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
    row is one HBM tile touch either way), then the lane-group select as
    ONE 128-wide mask-multiply + a static 0/1 ``[128, D]`` group-sum
    matmul (HIGHEST precision: every product is an exact ``1.0 x value``
    and each output sums one nonzero, so the select is bit-exact). The
    r-masked-slice-adds formulation this replaced cost 0.4 ms more at the
    production shape (narrow-slice relayouts; measured on-chip,
    scripts/bench_packed_gather.py — 1.34 vs 1.75 ms for 94k rows, with
    the bare tile gather at 1.31 ms: this select rides within ~2% of the
    indexed-op floor). No 3-D temps, no reshapes — both would
    materialize padded layouts on TPU. Returns ``[K, D]``.
    """
    r = 128 // d
    if r == 1:
        return packed[ids]
    rows128 = packed[ids // r]                       # [K, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    keep = (lane // d) == (ids % r)[:, None]
    masked = rows128 * keep.astype(packed.dtype)
    gsum = jnp.zeros((128, d), packed.dtype)
    gsum = gsum.at[jnp.arange(128), jnp.arange(128) % d].set(1)
    return jnp.dot(masked, gsum, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(packed.dtype)


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
                            chunk_ids: int = 128,
                            precision: str | None = None,
                            interpret: bool | None = None):
    """One fused dense-Adam pass (see module docstring).

    Args:
        table, mu, nu: ``[V2/r, 128]`` f32 PACKED tiles, pre-padded to
            ``V2 = nb * block_rows`` logical rows (``pack_rows`` /
            ``sorted_dense_adam_init``). Kept packed end-to-end: see the
            module docstring's layout-OOM note.
        sorted_ids: ``[K]`` int32, ascending (owner_sorted_grads). Ids
            OUTSIDE ``[0, V2)`` are allowed and contribute nothing (their
            packed row matches no block's sublane range) — the sharded
            path passes every shard the full id list re-based to its
            local frame.
        g_sorted: ``[K, D]`` gradient rows aligned with sorted_ids
            (duplicates allowed — they sum in the accumulator, exactly
            like autodiff's scatter-add).
        hp: ``[7]`` f32: lr, weight_decay, b1, b2, 1/(1-b1^t),
            1/(1-b2^t), eps.
        d: the logical row width D (not inferable from the packed shape).
        chunk_ids: the id-chunk width C (multiple of 128). Wider chunks
            shrink the work-item grid (W = K/C + nb) at the same total
            MXU FLOPs — a per-work-item-overhead dial, measured on chip
            (PROFILE.md SS5).

    Returns ``(new_table, new_mu, new_nu)`` packed, same shapes.
    """
    # K == 0 would give kc == 0, and the work-list clip jnp.clip(wc, 0, kc-1)
    # would aim the rv/g2 BlockSpecs at block -1 (out-of-bounds reads).
    # Callers (optim.sorted_dense_adam_update) route empty batches to the
    # XLA reference path; fail loud at the public kernel entry (ADVICE r4).
    assert sorted_ids.shape[0] > 0, (
        "sorted_dense_adam_apply requires at least one id; route empty "
        "batches to the XLA reference path (fused_dense_adam_ref)")
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
    nb = v2 // block_rows              # every block is real vocab
    assert nb >= 1, "need at least one vocab block"
    assert chunk_ids % 128 == 0 and chunk_ids > 0, chunk_ids
    rbp = block_rows // r

    k = sorted_ids.shape[0]
    kpad = (-k) % chunk_ids
    if kpad:
        # sentinel = v2: beyond every block's range. Real ids ABOVE v2 may
        # exist in the sharded path (later shards' rows) — the sentinel
        # tail then breaks strict global sortedness, but searchsorted
        # below only probes bounds <= v2, where the >=-predicate is still
        # monotone (everything past the in-range prefix is >= v2).
        sorted_ids = jnp.pad(sorted_ids, (0, kpad), constant_values=v2)
        g_sorted = jnp.pad(g_sorted, ((0, kpad), (0, 0)))
    kc = (k + kpad) // chunk_ids

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
                        ).astype(g_sorted.dtype).reshape(kc * chunk_ids, 128)
    # one extra SENTINEL chunk (ids = v2, grads = 0) as the surplus work
    # items' target: guaranteed-no-match against every block, so the last
    # real block's accumulator survives surplus items untouched and its
    # emit simply moves to the final work item
    g2 = jnp.concatenate([g2, jnp.zeros((chunk_ids, 128), g2.dtype)])
    rv = jnp.concatenate([(sorted_ids // r).astype(jnp.int32),
                          jnp.full((chunk_ids,), v2 // r, jnp.int32)]
                         ).reshape(kc + 1, 1, chunk_ids)

    # work list: for each vocab block, the id chunks overlapping its span
    # (>= 1 even when empty, so dense decay reaches every block); surplus
    # items aim at the sentinel chunk, clipped onto the last block.
    # Static size W = kc + nb.
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * block_rows
    starts = jnp.searchsorted(sorted_ids, bounds).astype(jnp.int32)
    c_lo = starts[:-1] // chunk_ids
    c_hi = (starts[1:] + chunk_ids - 1) // chunk_ids
    ln = jnp.maximum(c_hi - c_lo, 1)
    cum = jnp.cumsum(ln)
    w = kc + nb
    iw = jnp.arange(w, dtype=jnp.int32)
    wb = jnp.searchsorted(cum, iw, side="right").astype(jnp.int32)  # [0, nb]
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    surplus = wb >= nb
    safe_b = jnp.clip(wb, 0, nb - 1)
    wc = jnp.where(surplus, kc,
                   jnp.clip(c_lo[safe_b] + iw - prev[safe_b], 0, kc - 1)
                   ).astype(jnp.int32)
    wb = safe_b                        # surplus items ride the last block
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
                pl.BlockSpec((1, 1, chunk_ids),
                             lambda i, hp, wb, wc, f, e: (wc[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_ids, 128),
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
        # ONLY configs that need it raise the scoped-VMEM budget (the
        # 16 MB default compile-OOMs at block_rows 32768 — 26.1 MB — and
        # at chunk_ids 256 with 16384-row blocks — 16.05 MB): the raise is
        # deliberately conditional because applying it unconditionally
        # coincided with a -25% primary-shape regression in one session
        # (suspected allocator-strategy change at the default shapes;
        # the raised-limit PROD program measured identically)
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)}
           if block_rows >= 32768 or chunk_ids > 128 else {}),
        interpret=interpret,
    )(hp, wb, wc, first, emit, rv, g2, table, mu, nu)
    return tuple(out)


def sorted_dense_adam_apply_sharded(mesh, table, mu, nu, ids, g_rows, hp,
                                    d: int, *, segments, offsets,
                                    block_rows: int = 8192,
                                    chunk_ids: int = 128,
                                    reorder: str = "gather",
                                    precision: str | None = None,
                                    interpret: bool | None = None,
                                    embed_axis: str = "embed"):
    """The sorted streaming kernel on a ROW-SHARDED mesh (VERDICT r4 #1).

    ``shard_map`` over the full mesh: the authority tiles enter per-shard
    (``P(embed_axis, None)`` — each device holds the contiguous row range
    ``[j·V2/E, (j+1)·V2/E)`` as ``[V2/(r·E), 128]`` packed tiles) while
    ids/grads enter REPLICATED (``P()`` — jit all-gathers the data-sharded
    batch quantities at the boundary; each occurrence's cotangent row is
    already the full value under DP, so duplicates summing inside the
    kernel accumulator is the complete gradient — no psum needed). Every
    device then:

    1. runs :func:`owner_sorted_grads` on the full id list (replicated
       work — the sorts are ~0.4 ms against the shard's streaming cost),
    2. re-bases the globally sorted ids to its shard frame
       (``ids - j·V2/E``; the sorted order is preserved and the shard's
       own rows form a contiguous in-range span), and
    3. runs :func:`sorted_dense_adam_apply` on its own tiles — out-of-
       shard ids (negative or past the local ``v2``) match no block's
       sublane range, exactly like out-of-block ids on one chip.

    Each shard streams only its ``V2/E`` rows: the O(V) HBM floor scales
    1/E with the embed axis, the collective cost is one [K]-id + one
    [K, D]-grad all-gather (KB-MB, batch-sized). The computation along
    ``data`` is identical on every replica, so outputs are valid with
    ``out_specs`` mentioning only ``embed_axis``.

    Requires ``table.shape[0] % E == 0`` and whole blocks per shard —
    ``sorted_dense_adam_init(..., n_shards=E)`` guarantees both.
    """
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        # follow the MESH's platform, not the default backend: a virtual
        # CPU mesh can exist under a TPU default backend (dryrun_multichip)
        interpret = mesh.devices.flat[0].platform != "tpu"
    e = mesh.shape[embed_axis]
    r = 128 // d
    assert table.shape[0] % e == 0, (table.shape, e)
    vl = (table.shape[0] // e) * r          # logical rows per shard
    assert vl % block_rows == 0, (
        f"shards must hold whole vocab blocks: local rows {vl} vs "
        f"block_rows {block_rows}; init the authority with "
        f"sorted_dense_adam_init(..., n_shards={e})")

    tspec = P(embed_axis, None)

    # check_vma=False: the varying-mesh-axes checker would require vma
    # annotations threaded through pallas_call's out_shape (jax refuses
    # otherwise). The replication claim it would verify is immediate: the
    # body depends on the mesh position ONLY through axis_index(embed) and
    # the embed-sharded tiles, so outputs vary over embed exactly as
    # out_specs declares, and are replicated over data (all inputs enter
    # data-replicated); the single-vs-mesh equality test pins it.
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(tspec, tspec, tspec, P(), P(None), P()),
                       out_specs=(tspec, tspec, tspec),
                       check_vma=False)
    def upd(tbl_l, mu_l, nu_l, ids_all, g_all, hp_r):
        sid, gs = owner_sorted_grads(ids_all, g_all, segments, offsets,
                                     reorder=reorder)
        j = jax.lax.axis_index(embed_axis)
        local = sid - j * vl
        return sorted_dense_adam_apply(
            tbl_l, mu_l, nu_l, local, gs, hp_r, d, block_rows=block_rows,
            chunk_ids=chunk_ids, precision=precision, interpret=interpret)

    return upd(table, mu, nu, ids, g_rows, hp)
