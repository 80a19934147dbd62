"""Sparse embedding-row update primitives: Pallas row scatter + dup segsum.

Why these exist (the production-vocab problem, SURVEY §2.4): at the real
Ali-CCP scale (~467k rows/feature -> packed table ~10.7M x 16) every O(vocab)
operation in the train step is fatal. The lazy row-sparse Adam path
(train/optim.py) keeps all math O(touched rows), but its XLA formulation
bottoms out in serialized TPU scatters (winner-scatter dedup, segment-sum
scatter-add, and three [K, D] -> [V, D] row scatter-backs) whose measured
throughput swings 40x between sessions. The two primitives here replace all
of those serialized scatters:

- :func:`occurrence_segsum` — duplicate-id gradient segment-sum WITHOUT any
  scatter: for each id occurrence, the sum of the gradients of every
  occurrence of the same id, computed as an equality-mask matmul on the MXU
  (``eq @ g``). Every occurrence of an id receives the *identical* summed
  gradient, which makes the subsequent row writes idempotent — no dedup
  pass is needed at all.
- :func:`scatter_rows` — in-place ``dst[ids[k]] = rows[k]`` via a Pallas
  kernel that streams per-row VMEM->HBM DMAs with a ring of in-flight
  copies, instead of XLA's serialized scatter loop. Rows with ``ids >= V``
  are dropped (sentinel padding); duplicate ids MUST carry identical rows
  (writes may complete in any order — guaranteed by occurrence_segsum).

The reference framework has no counterpart (torch dense Adam over the whole
``nn.Embedding``, basic/layers.py:51-62 + ctr_trainer.py:50-52); this is the
TPU-native mechanism for the same training semantics at production vocab.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# occurrence segsum
# ---------------------------------------------------------------------------


def occurrence_segsum_ref(ids: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA formulation: ``out[f, i] = sum_j [ids[f,i]==ids[f,j]] g[f,j]``.

    ids ``[F, N]`` int32, g ``[F, N, D]``. Rows of ``ids`` are independent
    (one row per feature/owner — ids from different owners live in disjoint
    packed-table spans, so cross-row equality is impossible and irrelevant).

    Materializes the [F, N, N] mask in HBM — fine for tests/CPU, wasteful at
    batch 4096 (the Pallas version never materializes it).
    """
    eq = (ids[:, :, None] == ids[:, None, :]).astype(g.dtype)
    return jnp.einsum("fij,fjd->fid", eq, g,
                      preferred_element_type=jnp.float32).astype(g.dtype)


def _segsum_kernel(ti: int, ids_ref, g_ref, out_ref):
    # ids_ref holds ALL feature rows [F, N] (a (1, N) block would violate
    # Mosaic's sublane-divisibility rule for int32 blocks); g/out are
    # blocked per feature.
    fi = pl.program_id(0)
    i = pl.program_id(1)
    tile = ids_ref[fi, pl.ds(i * ti, ti)]                    # [TI]
    eq = (tile[:, None] == ids_ref[fi, :][None, :])          # [TI, N]
    out_ref[0] = jnp.dot(eq.astype(g_ref.dtype), g_ref[0],
                         preferred_element_type=jnp.float32).astype(out_ref.dtype)


def occurrence_segsum(ids: jnp.ndarray, g: jnp.ndarray,
                      *, tile: int = 256,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Per-occurrence duplicate-gradient segment sum (see module docstring).

    ids ``[F, N]`` int32, g ``[F, N, D]`` -> ``[F, N, D]``. The equality mask
    lives only in VMEM tiles (``[tile, N]``); FLOPs are O(F·N²·D) on the MXU
    and independent of vocab — the whole point at production scale, where
    every O(vocab) alternative (dense one-hot, scatter-add) loses.

    All occurrences of the same id get bit-identical sums: each output row
    is one MXU dot over the same N-term sequence with zeros at non-matching
    positions, so the accumulation order is shared.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f, n, d = g.shape
    ti = min(tile, n)
    if not interpret:
        # Mosaic requires lane-dim slices at 128-multiples ("cannot
        # statically prove that index in dimension 1 is a multiple of
        # 128"); round the tile down to one, and for small batches
        # (n < 128 — e.g. CLI debug runs) use the XLA formulation, which
        # is cheap at that size anyway.
        ti = (ti // 128) * 128
        if ti == 0:
            return occurrence_segsum_ref(ids, g)
    pad = (-n) % ti
    if pad:
        # sentinel -1 never equals a real id (ids >= 0); padded g rows are 0
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        n += pad
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, ti),
        out_shape=jax.ShapeDtypeStruct((f, n, d), g.dtype),
        grid=(f, n // ti),
        in_specs=[
            pl.BlockSpec((f, n), lambda fi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda fi, i: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ti, d), lambda fi, i: (fi, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ids, g)
    return out[:, : n - pad] if pad else out


# ---------------------------------------------------------------------------
# row scatter
# ---------------------------------------------------------------------------


def _scatter_kernel(v: int, kc: int, nslots: int,
                    ids_ref, rows_ref, dst_in_ref, dst_ref, sems):
    """Write rows_ref[r] -> dst_ref[ids[r]] with ``nslots`` DMAs in flight.

    Both rows and dst live in HBM (``ANY``): a [W]-float row slice of a
    VMEM-tiled buffer would violate Mosaic's 128-lane slice alignment for
    W < 128, and the data never needs to touch compute anyway — this kernel
    is a pure pipelined HBM->HBM row mover. Single sequential program (the
    TPU core runs grid steps in order); duplicate ids carry byte-identical
    rows so overlapping writes are idempotent. ``dst_in_ref`` is the aliased
    input view of the output buffer (never read)."""
    del dst_in_ref

    def dma(r):
        rid = ids_ref[r]
        return rid, pltpu.make_async_copy(
            rows_ref.at[r], dst_ref.at[rid],
            sems.at[jax.lax.rem(r, nslots)],
        )

    def start(r):
        rid, cp = dma(r)

        @pl.when(rid < v)
        def _():
            cp.start()

    def wait(r):
        rid, cp = dma(r)

        @pl.when(rid < v)
        def _():
            cp.wait()

    def body(r, carry):
        @pl.when(r >= nslots)
        def _():
            wait(r - nslots)

        start(r)
        return carry

    jax.lax.fori_loop(0, kc, body, 0)

    def drain(r, carry):
        wait(r)
        return carry

    jax.lax.fori_loop(max(kc - nslots, 0), kc, drain, 0)


def scatter_rows(dst: jnp.ndarray, ids: jnp.ndarray, rows: jnp.ndarray,
                 *, nslots: int = 32, chunk: int = 16384,
                 interpret: bool | None = None,
                 force_xla: bool = False) -> jnp.ndarray:
    """In-place row scatter: ``dst[ids[k]] = rows[k]``; returns the new dst.

    - ``dst [V, ...]`` stays in HBM (aliased in-place at the XLA level);
      ``rows [K, ...]`` must match dst's trailing shape.
    - ids with ``ids[k] >= V`` are dropped (use V as a padding sentinel).
    - Duplicate ids MUST carry identical rows (writes land in slot order,
      and concurrent duplicates interleave): pair with occurrence_segsum.

    On non-TPU backends defaults to the XLA scatter (fast on CPU; the DMA
    ring only matters on real hardware); ``interpret=True`` forces the
    Pallas interpreter for kernel tests. ``force_xla=True`` forces the XLA
    scatter everywhere — required under a device mesh, where SPMD cannot
    partition a pallas_call over the row-sharded table but partitions the
    XLA scatter fine.
    """
    if force_xla or (interpret is None and jax.default_backend() != "tpu"):
        return dst.at[ids].set(rows, mode="drop")
    if interpret is None:
        interpret = False
    row_elems = 1
    for s in dst.shape[1:]:
        row_elems *= int(s)
    if not interpret and row_elems % 128 != 0:
        # Mosaic constraint: DMA slices along the lane dim must be 128-
        # aligned, so rows narrower than 128 elements cannot be moved by
        # per-row DMA ("Slice shape along dimension 1 must be aligned to
        # tiling (128)"). Fall back to the XLA scatter; callers who want
        # the DMA ring pad their row store to a 128-elem multiple (see
        # train/optim.py combined row store).
        return dst.at[ids].set(rows, mode="drop")
    v = dst.shape[0]
    k = ids.shape[0]
    trailing = dst.shape[1:]
    assert rows.shape[0] == k and rows.shape[1:] == trailing, (
        rows.shape, dst.shape)
    w = 1
    for s in trailing:
        w *= int(s)
    dst2 = dst.reshape(v, w)
    rows2 = rows.reshape(k, w)

    out = dst2
    for lo in range(0, k, chunk):
        ids_c = ids[lo: lo + chunk]
        rows_c = rows2[lo: lo + chunk]
        kc = ids_c.shape[0]
        # ids ride scalar-prefetch (SMEM) — the chunk bound caps SMEM use
        out = pl.pallas_call(
            functools.partial(_scatter_kernel, v, kc, min(nslots, kc)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    # HBM explicitly: ANY may promote the rows array to
                    # VMEM, whose (1, 128) lane tiling rejects W<128 row
                    # slices; HBM memrefs are linear and slice freely
                    pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec(memory_space=pltpu.HBM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((min(nslots, kc),))],
            ),
            out_shape=jax.ShapeDtypeStruct((v, w), dst2.dtype),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(ids_c.astype(jnp.int32), rows_c, out)
    return out.reshape(dst.shape)
