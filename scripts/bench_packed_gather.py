"""Microbench: the sorted-mode forward's packed row gather (VERDICT r4 #3).

PROFILE.md SS5 attributes the last sized non-floor term of the 467k
production step to the forward's 128-lane packed row gather: 2.4 ms for
K = 94,208 tile rows out of [1.34M, 128] (~25 ns/row, per-row bound).
This script measures the candidate levers on-chip before any kernel work:

  occ        — packed_row_gather with occurrence-ordered ids (the baseline
               the trainer pays today)
  sorted     — same gather with globally SORTED ids (does XLA's gather
               engine benefit from ascending locality?)
  compact    — gather of K rows from a COMPACT [K', 128] source (48 MB vs
               688 MB): if per-row cost falls with source size, a
               streaming one-hot kernel producing sorted rows (+ this
               un-permute gather from the compact result) could beat the
               direct table gather; if not, the streaming design is a
               measured dead end (its un-permute pays full price).
  occ_tiles_raw — the bare 128-lane tile-row gather without
               packed_row_gather's lane-select arithmetic (isolates the
               indexed op itself)

Timing: R chained gathers inside ONE jitted fori_loop (ids rolled by the
loop index to defeat CSE; the sum forces each result), so per-dispatch
tunnel overhead amortizes away. Run: python scripts/bench_packed_gather.py
[V_packed] [K] [reps].
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import scenario_wise_rec_tpu  # noqa: F401  (compile cache)
    from scenario_wise_rec_tpu.ops.pallas.sorted_adam import (
        pack_rows, packed_row_gather)

    v = int(sys.argv[1]) if len(sys.argv) > 1 else 23 * 467_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 23 * 4096
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    d = 16
    print(f"backend={jax.default_backend()} V={v} K={k} reps={reps}",
          flush=True)

    rng = np.random.default_rng(0)
    # build the packed tiles from zeros (values are irrelevant to gather
    # timing; avoids a [V, 16] random host array)
    packed = pack_rows(jnp.zeros((v, d), jnp.float32), 8192)
    ids_occ = jnp.asarray(rng.integers(0, v, k).astype(np.int32))
    ids_sorted = jnp.sort(ids_occ)
    kpad = ((k + 127) // 128) * 128
    compact = jnp.zeros((kpad, 128), jnp.float32)
    ids_small = jnp.asarray(rng.integers(0, kpad, k).astype(np.int32))

    def timeit(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))          # real fetch barrier (axon)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        per = (time.perf_counter() - t0) / reps
        print(json.dumps({"case": name, "ms_per_gather": round(per * 1e3, 3),
                          "ns_per_row": round(per / k * 1e9, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)

    @jax.jit
    def g_packed(src, ids):
        def body(i, acc):
            rows = packed_row_gather(src, jnp.roll(ids, i), d)
            return acc + rows.sum()    # consume EVERY row (no DCE'd gather)
        return jax.lax.fori_loop(0, reps, body, 0.0)

    @jax.jit
    def g_tiles(src, ids):
        # raw 128-lane tile-row gather (no lane select): isolates the
        # indexed op itself from packed_row_gather's select arithmetic
        def body(i, acc):
            rows = src[jnp.roll(ids, i)]
            return acc + rows.sum()
        return jax.lax.fori_loop(0, reps, body, 0.0)

    r = 128 // d
    # lane-select variant: ONE 128-wide mask-multiply + a tiny static MXU
    # matmul that sums the r lane groups onto [*, d] — vs the baseline's r
    # masked slice-adds (narrow-slice relayouts)
    gsum = jnp.zeros((128, d), jnp.float32)
    gsum = gsum.at[jnp.arange(128), jnp.arange(128) % d].set(1.0)

    @jax.jit
    def g_masksum(src, ids):
        lane_group = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // d

        def body(i, acc):
            idr = jnp.roll(ids, i)
            rows128 = src[idr // r]
            masked = rows128 * (lane_group == (idr % r)[:, None])
            out = jnp.dot(masked, gsum,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            return acc + out.sum()
        return jax.lax.fori_loop(0, reps, body, 0.0)

    timeit("occ", g_packed, packed, ids_occ)
    timeit("sorted", g_packed, packed, ids_sorted)
    timeit("occ_tiles_raw", g_tiles, packed, ids_occ // 8)
    timeit("compact", g_tiles, compact, ids_small)
    timeit("compact_sorted", g_tiles, compact, jnp.sort(ids_small))
    timeit("occ_masksum", g_masksum, packed, ids_occ)


if __name__ == "__main__":
    main()
