"""Single-chip A/B: the sorted impl with vs without the shard_map wrapper.

VERDICT r4 #1's acceptance: wrapping the sorted streaming update in
``shard_map`` (the mesh engine, ops/pallas/sorted_adam.py:
sorted_dense_adam_apply_sharded) must cost <5% at n_embed=1 — i.e. the
single-chip user who passes ``mesh=`` out of habit keeps the kernel's
throughput. Runs the REAL CTRTrainer scanned train step at the
production shape (467k vocab/feature, batch 4096, scan 64) twice in ONE
process/session: plain (no mesh) and under a 1x1 ``(data, embed)`` mesh.

Prints one JSON line per config. Usage: python bench_sorted_mesh_overhead.py
(SWR_VOCAB/SWR_BATCH/SWR_SCAN/SWR_TIME_BUDGET as bench.py).
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
BUDGET = float(os.environ.get("SWR_TIME_BUDGET", 40))
N_SPARSE, N_DENSE, DOMAINS = 23, 8, 3


def main():
    import jax
    import jax.numpy as jnp

    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.parallel.mesh import make_mesh
    from scenario_wise_rec_tpu.train import CTRTrainer

    rng = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(rng.integers(0, VOCAB, BATCH).astype(np.int32))
         for i in range(N_SPARSE)}
    x.update({f"d{i}": jnp.asarray(rng.normal(size=BATCH).astype(np.float32))
              for i in range(N_DENSE)})
    x["domain_indicator"] = jnp.asarray(
        rng.integers(0, DOMAINS, BATCH).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, BATCH).astype(np.float32))
    w = jnp.ones((BATCH,), jnp.float32)
    xs = {k: jnp.broadcast_to(v, (SCAN,) + v.shape) for k, v in x.items()}
    ys = jnp.broadcast_to(y, (SCAN,) + y.shape)
    ws = jnp.broadcast_to(w, (SCAN,) + w.shape)

    def measure(name, mesh):
        feats = ([DenseFeature(f"d{i}") for i in range(N_DENSE)]
                 + [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=16)
                    for i in range(N_SPARSE)])
        model = MMOE(feats, DOMAINS, n_expert=DOMAINS,
                     expert_params={"dims": [256, 128, 64, 32, 16, 8]},
                     tower_params={"dims": [16]})
        assert SCAN > 1, "this A/B uses the scanned dispatch path (SWR_SCAN>1)"
        tr = CTRTrainer(model, mesh=mesh, sparse_embedding_updates=True,
                        sparse_update_impl="sorted", scan_steps=SCAN)
        xb, yb, wb = (xs, ys, ws)
        if mesh is not None:
            xb, yb, wb = tr._shard_stacked(xs, ys, ws)
        params, opt, st = tr.params, tr.opt_state, tr.state
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        for _ in range(3):
            key, k = jax.random.split(key)
            params, opt, st, losses = tr._train_step_scan(
                params, opt, st, xb, yb, wb, k)
        float(np.asarray(losses).ravel()[-1])   # real fetch barrier
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        key, k = jax.random.split(key)
        params, opt, st, losses = tr._train_step_scan(
            params, opt, st, xb, yb, wb, k)
        float(np.asarray(losses).ravel()[-1])
        per = time.perf_counter() - t0
        n = max(3, int(BUDGET / max(per, 1e-3)))
        t0 = time.perf_counter()
        for _ in range(n):
            key, k = jax.random.split(key)
            params, opt, st, losses = tr._train_step_scan(
                params, opt, st, xb, yb, wb, k)
        float(np.asarray(losses).ravel()[-1])
        dt = time.perf_counter() - t0
        eps = n * SCAN * BATCH / dt
        print(json.dumps({"config": name, "examples_per_s": round(eps, 1),
                          "ms_per_step": round(dt / n / SCAN * 1e3, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return eps

    a = measure("no_mesh", None)
    b = measure("mesh_1x1_shard_map", make_mesh(n_data=1, n_embed=1))
    print(json.dumps({"config": "overhead",
                      "shard_map_cost_pct": round((a - b) / a * 100, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
