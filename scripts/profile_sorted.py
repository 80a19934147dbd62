"""Attribute the sorted-streaming-Adam step's time on the real chip.

Times progressively larger jitted sub-programs of the production-vocab
update (467k vocab/feature -> packed [10.74M, 16], K = 23*4096 ids),
each scan-amortized like the bench, so the per-dispatch overhead is
shared out identically:

  sort+reorder       per-owner batched sorts + gradient reorder
  fwd_packed_gather  the forward's packed row gather alone
  update_full        KNOWN-INVALID standalone reading: isolating the
                     pallas update in its own scan measures 150-300
                     ms/step (XLA fails to alias the 2 GB carry buffers
                     through the pallas_call in this harness), while the
                     real trainer step containing the same update
                     measures 8.17 ms end-to-end (bench.py) — derive the
                     update's cost by subtraction from the real step,
                     never from this stage (PROFILE.md SS5 does).

Usage: python profile_sorted.py   (TPU; one program per stage, warm-cache
friendly; SWR_VOCAB/SWR_BATCH/SWR_SCAN as bench.py)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

VOCAB = int(os.environ.get("SWR_VOCAB", 467_000))
BATCH = int(os.environ.get("SWR_BATCH", 4096))
SCAN = int(os.environ.get("SWR_SCAN", 64))
N_SPARSE = 23
BLOCK_ROWS = 8192


def main():
    import jax
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.ops.pallas.sorted_adam import (
        owner_sorted_grads, packed_row_gather, sorted_dense_adam_apply)
    from scenario_wise_rec_tpu.train.optim import sorted_dense_adam_init

    d = 16
    v = N_SPARSE * VOCAB
    rng = np.random.default_rng(0)
    table = jnp.zeros((v, d), jnp.float32)
    state = sorted_dense_adam_init(table, block_rows=BLOCK_ROWS)
    del table
    k = N_SPARSE * BATCH
    ids_np = np.concatenate([
        rng.integers(0, VOCAB, BATCH).astype(np.int32) + f * VOCAB
        for f in range(N_SPARSE)])
    ids = jnp.asarray(ids_np)
    g = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32) * 1e-3)
    segments = tuple((f"s{f}", f * BATCH, BATCH) for f in range(N_SPARSE))
    offsets = {f"s{f}": f * VOCAB for f in range(N_SPARSE)}
    hp = jnp.asarray([1e-3, 1e-5, 0.9, 0.999, 10.0, 1000.0, 1e-8],
                     jnp.float32)

    def scan_wrap(body, carry0):
        """Run `body` SCAN times inside one dispatch (carry is whatever the
        stage transforms), mirroring the bench's scan-64 amortization."""

        @jax.jit
        def fn(carry, xs):
            def f(c, _):
                return body(c), 0.0
            out, _ = jax.lax.scan(f, carry, xs)
            return out

        xs = jnp.zeros((SCAN,), jnp.float32)
        return lambda c=carry0: fn(c, xs)

    def timeit(name, fn, inner_steps=SCAN, reps=3):
        out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[-1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[-1])
        ms = (time.perf_counter() - t0) / (reps * inner_steps) * 1e3
        print(json.dumps({"stage": name, "ms_per_step": round(ms, 3)}),
              flush=True)
        return ms

    # stages operate on a dummy f32 carry folded into g so the scan cannot
    # elide the work (output feeds the next iteration's input)
    def reorder_body(c):
        sid, gs = owner_sorted_grads(ids, g + c[:1], segments, offsets,
                                     reorder="gather")
        return c + gs[0, :8] + sid[:8].astype(jnp.float32)

    def gather_body(c):
        # carry dependence rides the IDS (O(K)): adding c to the TABLE
        # would add a full O(V) elementwise pass to every iteration and
        # contaminate the gather timing
        ids_c = ids + (c[:1] * 0.0).astype(jnp.int32)[0]
        rows = packed_row_gather(state["table"], ids_c, d)
        return c + rows[0, :8]

    def kernel_body(carry):
        tbl, mu, nu, c = carry
        sid, gs = owner_sorted_grads(ids, g + c[:1], segments, offsets,
                                     reorder="gather")
        nt, nm, nn = sorted_dense_adam_apply(tbl, mu, nu, sid, gs, hp, d,
                                             block_rows=BLOCK_ROWS)
        return nt, nm, nn, c + nt[0, :8]

    z8 = jnp.zeros((8,), jnp.float32)
    timeit("sort+reorder", scan_wrap(reorder_body, z8))
    timeit("fwd_packed_gather", scan_wrap(gather_body, z8))
    timeit("update_full(sort+prep+kernel)",
           scan_wrap(kernel_body,
                     (state["table"], state["mu"], state["nu"], z8)))


if __name__ == "__main__":
    main()
