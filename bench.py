"""Benchmark: training throughput (examples/s/chip) of the flagship config.

Flagship = MMOE with the Ali-CCP shape (23 sparse x 16-dim embeddings +
8 dense, experts [256,128,64,32,16,8], 3 domains), batch 4096 — the
reference's headline benchmark config (run_ali_ccp…py:140-141, batch
4096 per :193). Measures the full jitted train step (forward + BCE +
backward + Adam) on the available accelerator.

``vs_baseline`` compares against the PyTorch reference's measured
throughput for the identical model/batch on this host's CPU (the
reference's only non-CUDA device path), stored in BASELINE_MEASURED.json
by scripts/measure_torch_baseline.py.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

BATCH = 4096
N_SPARSE, N_DENSE, DOMAINS = 23, 8, 3
VOCAB = 20_000  # per-feature vocab (Ali-CCP scale varies 10..467k)
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from scenario_wise_rec_tpu.core import DenseFeature, SparseFeature
    from scenario_wise_rec_tpu.models import MMOE
    from scenario_wise_rec_tpu.train.loss import bce_loss
    from scenario_wise_rec_tpu.train.optim import adam

    sparse = [SparseFeature(f"s{i}", vocab_size=VOCAB, embed_dim=16)
              for i in range(N_SPARSE)]
    dense = [DenseFeature(f"d{i}") for i in range(N_DENSE)]
    model = MMOE(dense + sparse, DOMAINS, n_expert=DOMAINS,
                 expert_params={"dims": [256, 128, 64, 32, 16, 8]},
                 tower_params={"dims": [16]})

    rng = np.random.default_rng(0)
    x = {f"s{i}": jnp.asarray(rng.integers(0, VOCAB, BATCH).astype(np.int32))
         for i in range(N_SPARSE)}
    x.update({f"d{i}": jnp.asarray(rng.normal(size=BATCH).astype(np.float32))
              for i in range(N_DENSE)})
    x["domain_indicator"] = jnp.asarray(
        rng.integers(0, DOMAINS, BATCH).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, BATCH).astype(np.float32))

    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    optimizer = adam(lr=1e-3, weight_decay=1e-5)
    opt_state = jax.jit(optimizer.init)(params)

    @jax.jit
    def train_step(params, opt_state, state, x, y, rng):
        def loss_fn(p):
            probs, new_state = model.apply(p, state, x, train=True, rng=rng)
            return bce_loss(probs, y), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    key = jax.random.PRNGKey(1)
    # warmup (compile)
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt_state, state, loss = train_step(params, opt_state, state,
                                                    x, y, k)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        key, k = jax.random.split(key)
        params, opt_state, state, loss = train_step(params, opt_state, state,
                                                    x, y, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    examples_per_s = STEPS * BATCH / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_eps = ref.get("torch_mmoe_examples_per_s")
        if ref_eps:
            vs = examples_per_s / ref_eps

    print(json.dumps({
        "metric": "train_throughput_mmoe_aliccp_b4096",
        "value": round(examples_per_s, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
