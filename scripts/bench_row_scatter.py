"""Microbench: row-scatter strategies at production embedding scale.

Answers the design question for the sparse-Adam row write-back
(ops/pallas/row_update.py): what does it cost to write K scattered rows
into a [V, W] HBM-resident table, for the real Ali-CCP shape
(V = 23 features x 467k rows = 10.7M packed rows, K = 23 x 4096 = 94208
touched rows/step, reference scripts/run_ali_ccp...py:26 vocab scale)?

Strategies:
  xla16   — XLA scatter of [K, 16]   -> [V, 16]   (table rows)
  xla32   — XLA scatter of [K, 32]   -> [V, 2,16] (packed Adam moments)
  xla128  — XLA scatter of [K, 128]  -> [V, 128]  (combined row store)
  dma128  — Pallas DMA-ring scatter  -> [V, 128]  (combined row store;
            width 128 = the Mosaic lane-alignment floor for per-row DMA)
  gather128 — XLA gather [V, 128] -> [K, 128] (the read half of the RMW)
  segsum  — Pallas occurrence_segsum at [23, 4096, 16] (dup grad merge)

Run on the TPU: python scripts/bench_row_scatter.py [V_packed] [K]
Prints one line per strategy: ms/call and rows/s.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import scenario_wise_rec_tpu  # noqa: F401  (compile cache)
    from scenario_wise_rec_tpu.ops.pallas.row_update import (
        occurrence_segsum, scatter_rows)

    v = int(sys.argv[1]) if len(sys.argv) > 1 else 23 * 467_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 23 * 4096
    print(f"backend={jax.default_backend()} V={v} K={k}", flush=True)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, v, k).astype(np.int32))

    def timeit(name, fn, *args, reps=20):
        try:
            t0 = time.perf_counter()
            out = fn(*args)
            # real barrier: fetch one element (block_until_ready is a no-op
            # on the axon platform, see bench.py)
            first = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(first.ravel()[0]))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            first = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(first.ravel()[0]))
            dt = (time.perf_counter() - t0) / reps
            print(f"{name:10s} {dt * 1e3:8.2f} ms/call  "
                  f"{k / dt / 1e6:8.2f} M rows/s"
                  f"  (compile+first {compile_s:.1f}s)", flush=True)
            return out
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED at the [V,128] scale
            print(f"{name:10s} FAILED: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            return None

    for w, shp in [(16, (16,)), (32, (2, 16)), (128, (128,))]:
        dst = jnp.zeros((v,) + shp, jnp.float32)
        rows = jnp.asarray(rng.normal(size=(k,) + shp).astype(np.float32))

        @jax.jit
        def xla_scatter(d, i, r):
            return d.at[i].set(r, mode="drop")

        timeit(f"xla{w}", xla_scatter, dst, ids, rows)
        del dst, rows

    dst = jnp.zeros((v, 128), jnp.float32)
    rows = jnp.asarray(rng.normal(size=(k, 128)).astype(np.float32))

    @jax.jit
    def dma_scatter(d, i, r):
        return scatter_rows(d, i, r)

    timeit("dma128", dma_scatter, dst, ids, rows)

    @jax.jit
    def gather(d, i):
        return d[i]

    timeit("gather128", gather, dst, ids)
    del dst, rows

    f, b, d_ = 23, 4096, 16
    ids2 = jnp.asarray(rng.integers(0, 467_000, (f, b)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(f, b, d_)).astype(np.float32))

    @jax.jit
    def segsum(i, gg):
        return occurrence_segsum(i, gg)

    timeit("segsum", segsum, ids2, g)


if __name__ == "__main__":
    main()
